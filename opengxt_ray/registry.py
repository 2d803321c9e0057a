"""Operator registry — the engine's analogue of the reference's
Process SPI (SURVEY.md §2.9: ProcessFactory entries registered in
META-INF/services, typed param metadata in GT/core/Params.java:36-71).

Each entry maps a process name to a builder plus a typed parameter
spec, so a thin WPS/CLI front-end (or the driver) can enumerate and
invoke every operator uniformly:

    fn = registry.get("SpatialJoin")
    ds_out = fn.build(points_ds, polygons=zones_table, predicate=...)
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Param:
    name: str
    type: str           # "dataset" | "table" | "str" | "float" | "int" | "bool" | "list"
    required: bool = True
    default: object = None
    doc: str = ""


@dataclass
class ProcessEntry:
    name: str
    category: str
    build: object       # callable
    params: list[Param] = field(default_factory=list)
    reference: str = ""  # GT/... citation
    doc: str = ""


_REGISTRY: dict[str, ProcessEntry] = {}


def register(entry: ProcessEntry) -> None:
    _REGISTRY[entry.name] = entry


def get(name: str) -> ProcessEntry:
    return _REGISTRY[name]


def names() -> list[str]:
    return sorted(_REGISTRY)


def by_category() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for e in _REGISTRY.values():
        out.setdefault(e.category, []).append(e.name)
    return {k: sorted(v) for k, v in out.items()}


def _populate() -> None:
    from .ops import aggregate as AG
    from .ops import binning as BN
    from .ops import classify as CL
    from .ops import cluster as CU
    from .ops import distribution as DI
    from .ops import gam as GAM
    from .ops import hotspot as HS
    from .ops import join as J
    from .ops import near as NE
    from .ops import pip as PIP
    from .ops import regression as RG
    from .ops import weights as WT
    from .ops import lineops as LO
    from .ops import overlay as OV
    from .ops import histogram as HG
    from .ops import tessellation as TE
    from .raster import density as RD
    from .raster import tiles as RT
    from .raster import zonal as RZ
    from .raster import algebra as RA
    from .raster import surface as RS
    from .raster import interpolate as RI
    from .raster import geometry as RG2
    from .raster import geotiff as GT2
    from .raster import rasterize as RRZ
    from .raster import vectorize as RVZ
    from .sources import textfile as TF
    from .sources import geojson as GJ
    from .sources import shapefile as SF
    from .stages import transforms as T
    from .textops import dedup as TD
    from .textops import quality as TQ
    from .textops import multimodal as MM
    from .vector import ann as ANN

    def E(name, category, build, reference="", params=()):
        register(ProcessEntry(name, category, build, list(params), reference))

    # joins / lookups (§2.3)
    E("SpatialJoin", "join", J.nearest_join,
      "GT/operations/SpatialJoinOperation.java:75-183")
    E("IntersectsJoin", "join", J.broadcast_spatial_join,
      "GT/transformation/IntersectFeatureCollection.java:190-350")
    E("CellCopartitionJoin", "join", J.cell_copartition_join,
      "SURVEY.md §7.3 (scale path)")
    E("PointsInPolygon", "join", PIP.points_in_polygon,
      "GT/operations/PointsInPolygonOperation.java:59-123")
    E("PointStatistics", "join", PIP.point_statistics,
      "GT/operations/PointStatisticsOperation.java:101-127")
    E("BufferStatistics", "join", PIP.buffer_statistics,
      "GT/BufferStatisticsProcess.java:87-124 (buffer + "
      "PointStatisticsOperation composition)")
    E("Near", "join", J.nearest_join,
      "GT/operations/NearOperation.java:77-185")
    E("KNearestNeighborMap", "join", NE.knn_links,
      "GT/pattern/KNearestNeighborMapOperation.java:59-147")
    E("KNearestNeighborCircle", "join", NE.knn_circles,
      "GT/pattern/KNearestNeighborCircleOperation.java:72-")
    E("NearestNeighborCount", "join", NE.neighbor_count,
      "GT/operations/NearestNeighborCountOperation.java")
    E("AttributeJoin", "join", J.slim_join_reattach,
      "GT/transformation/JoinAttributeFeatureCollection.java:62-69")
    E("HubLines", "join", LO.hub_lines,
      "GT/operations/HubLinesByDistanceOperation.java")
    E("SnapPointsToLines", "join", LO.snap_points_to_lines,
      "GT/operations/SnapPointsToLinesOperation.java")
    E("IntersectionPoints", "join", LO.intersection_points,
      "GT/operations/IntersectionPointsOperation.java")
    E("SumLineLength", "join", LO.sum_line_length,
      "GT/operations/CalculateSumLineLengthOperation.java")
    E("ClipWithGeometry", "join", OV.clip_with_geometry,
      "GT/transformation/ClipWithGeometryFeatureCollection.java")
    E("ClipWithFeatures", "join", OV.clip_with_features,
      "GT/operations/ClipWithFeaturesOperation.java")
    E("Difference", "join", OV.erase_features,
      "GT/transformation/DifferenceFeatureCollection.java")
    E("MergeFeatures", "join", OV.merge_features,
      "GT/transformation/MergeFeatureCollection.java")
    E("Eliminate", "join", OV.eliminate,
      "GT/operations/EliminateOperation.java (exact for tessellations)")
    E("Intersect", "join", OV.intersect_features,
      "GT/transformation/IntersectFeatureCollection.java:294-350")
    E("Identity", "join", OV.identity_features,
      "GT/operations (Identity overlay)")
    E("SymDifference", "join", OV.symdifference_features,
      "GT/operations (SymDifference overlay)")
    E("Union", "join", OV.union_features,
      "GT/operations (Union overlay: A∩B + A−B + B−A, "
      "IntersectFeatureCollection.java:131-156 column dedup)")
    E("Update", "join", OV.update_features,
      "GT/operations (Update overlay)")

    # aggregation (§2.4)
    E("Dissolve", "aggregate", AG.dissolve,
      "GT/operations/DissolveOperation.java:69-220")
    E("StatisticsFeatures", "aggregate", AG.data_statistics,
      "GT/operations/DataStatisticsOperation.java")
    E("CollectEvents", "aggregate", AG.collect_events,
      "GT/operations/CollectEventsOperation.java:49-97")
    E("DeleteDuplicates", "aggregate", AG.delete_duplicates,
      "GT/operations/DeleteDuplicateFeaturesOperation.java:52-90")
    E("Pearson", "aggregate", RG.pearson,
      "GT/operations/PearsonOperation.java")
    E("OLS", "aggregate", RG.ols, "GT/relationship/OLSOperation.java:105-450")
    E("StandardizedScores", "aggregate", RG.standardized_scores,
      "GT/pattern/StandardizedScoresOperation.java")

    # hotspot / autocorrelation (§2.5)
    E("LocalGStatistics", "hotspot", HS.local_gi_star,
      "GT/autocorrelation/LocalGStatisticOperation.java:63-188")
    E("LocalMoransI", "hotspot", HS.local_morans_i,
      "GT/autocorrelation/LocalMoranIStatisticOperation.java:76-251")
    E("GlobalMoransI", "hotspot", HS.global_morans_i,
      "GT/autocorrelation/GlobalMoranIStatisticOperation.java:49-135")
    E("LocalGearysC", "hotspot", HS.local_gearys_c,
      "GT/autocorrelation/LocalGearysCOperation.java:100-142")
    E("GlobalGearysC", "hotspot", HS.global_gearys_c,
      "GT/autocorrelation/GlobalGearysCOperation.java:95-142")
    E("GlobalGStatistics", "hotspot", HS.global_g,
      "GT/autocorrelation/GlobalGStatisticOperation.java:75-140")
    E("LocalLeesS", "hotspot", HS.local_lees_s,
      "GT/autocorrelation/LocalLeesSOperation.java:118-133")
    E("GlobalLeesS", "hotspot", HS.global_lees_s,
      "GT/autocorrelation/GlobalLeesSOperation.java:105")
    E("LocalLeesL", "hotspot", HS.local_lees_l,
      "GT/autocorrelation/LocalLeesLOperation.java:85-140")
    E("GlobalLeesL", "hotspot", HS.global_lees_l,
      "GT/autocorrelation/GlobalLeesLOperation.java:55-115")
    E("ClusterGAM", "hotspot", GAM.cluster_gam,
      "GT/pattern/ClusterGAMOperation.java:209 (lattice circles + "
      "Poisson fitness, FitnessFunction.java:79-120)")
    E("ClusterBesagNewell", "hotspot", GAM.cluster_besag_newell,
      "GT/pattern/ClusterBesagNewellOperation.java:176 (kNN-radius "
      "circles per case point)")
    E("LocalSABinning", "hotspot", HS.local_sa_binning,
      "GT/LocalSABinningProcess.java:140-216 (bin + local SA stat)")
    E("LocalSAOverlay", "hotspot", HS.local_sa_overlay,
      "GT/LocalSAOverlayProcess.java:127-150 (PIP + local SA stat)")
    E("FocalLQ", "hotspot", HS.focal_lq,
      "GT/autocorrelation/FocalLQOperation.java:67-150")
    E("LocalRogersonR", "hotspot", HS.local_rogerson_r,
      "GT/autocorrelation/LocalRogersonROperation.java:85-135")
    E("GlobalRogersonR", "hotspot", HS.global_rogerson_r,
      "GT/autocorrelation/GlobalRogersonROperation.java:66-142")
    E("NearestNeighborIndex", "hotspot", NE.nearest_neighbor_index,
      "GT/pattern/NNIOperation.java:83-156")
    E("ContiguityWeights", "hotspot", WT.contiguity_pairs,
      "GT/core/WeightMatrixContiguity.java")
    E("KNNWeights", "hotspot", WT.knn_pairs,
      "GT/core/WeightMatrixKNearestNeighbors.java:46-65")
    E("DefaultDistanceBand", "hotspot", NE.default_distance_band,
      "GT/core/DistanceFactory.java:83-121")
    E("JoinCountStatistics", "hotspot", WT.join_count_statistics,
      "GT/autocorrelation/JoinCountStatisticsOperation.java:60-190")

    # distribution (§2.5)
    E("MeanCenter", "distribution", DI.mean_center,
      "GT/distribution/MeanCenterOperation.java")
    E("MedianCenter", "distribution", DI.median_center,
      "GT/distribution/MedianCenterOperation.java")
    E("StandardDistance", "distribution", DI.standard_distance,
      "GT/distribution/StandardDistanceOperation.java")
    E("StandardDeviationalEllipse", "distribution",
      DI.standard_deviational_ellipse, "GT/distribution/SDEOperation")
    E("DirectionalMean", "distribution", DI.directional_mean,
      "GT/distribution/DirectionalMeanOperation.java")
    E("CentralFeature", "distribution", DI.central_feature,
      "GT/distribution/CentralFeatureOperation.java")

    # binning / tessellation (§2.6)
    E("HexagonalBinning", "binning", BN.hex_binning,
      "GT/pattern/HexagonalBinningVisitor.java:40-130")
    E("RectangularBinning", "binning", BN.rect_binning,
      "GT/pattern/RectangularBinningVisitor.java")
    E("Fishnet", "binning", BN.fishnet, "GT/operations/FishnetOperation.java")
    E("HexagonGrid", "binning", BN.hexagon_grid,
      "GT/operations/HexagonOperation.java")
    E("QuadratAnalysis", "binning", BN.quadrat_analysis,
      "GT/pattern/QuadratOperation.java:44-")
    E("KMeansClustering", "binning", CU.kmeans_assign,
      "GT/pattern/KMeansClusterOperation.java")
    E("SpatialClump", "binning", CU.distance_clusters,
      "GT/transformation/SpatialClumpFeatureCollection.java")
    E("ThiessenPolygon", "binning", TE.thiessen,
      "GT/operations/ThiessenPolygonOperation.java")
    E("DelaunayTriangulation", "binning", TE.delaunay,
      "GT/operations/DelaunayTrangulationOperation.java")
    E("DelaunayDistributed", "binning", TE.delaunay_distributed,
      "scale path: per-cell triangulation + halo, circumcenter ownership")
    E("ConcaveHull", "binning", TE.concave_hull,
      "GT/operations/ConcaveHullOperation.java")
    E("RandomPoints", "binning", TE.random_points,
      "GT/operations/RandomPointsOperation.java:52-120 (seeded improvement)")
    E("RegularPoints", "binning", TE.regular_points,
      "GT/operations/RegularPointsOperation")
    E("TriangularGrid", "binning", TE.triangular_grid,
      "GT/operations/TriangularGridOperation")
    E("CircularBinning", "binning", BN.circular_binning,
      "GT/pattern/CircularBinningOperation (2r grid circles, corner "
      "gaps drop points)")
    E("CircularGrid", "binning", TE.circular_grid,
      "GT/operations/CircularGridOperation")

    # classification (§2.4)
    E("EqualInterval", "classify", CL.equal_interval, "GT/clsssifier/")
    E("Quantile", "classify", CL.quantile_breaks, "GT/clsssifier/")
    E("NaturalBreaks", "classify", CL.natural_breaks,
      "GT/clsssifier/NaturalBreaksClassify.java:50-96")
    E("StdDevBreaks", "classify", CL.std_dev_breaks, "GT/clsssifier/")
    E("HistogramFeatures", "classify", HG.histogram,
      "GT/core/HistogramFeatures.java")
    E("HistogramGridCoverage", "classify", HG.raster_histogram,
      "GT/core/HistogramGridCoverage.java")
    E("Sessionize", "trainingdata", HG.sessionize)
    E("SessionStats", "trainingdata", HG.session_stats)

    # per-record transforms (§2.2)
    E("CalculateArea", "transform", T.calculate_area,
      "GT/transformation/AreaCalculationFeatureCollection.java")
    E("CalculateLength", "transform", T.calculate_length,
      "GT/transformation/LengthCalculationFeatureCollection.java")
    E("CalculateXY", "transform", T.calculate_xy,
      "GT/transformation/XYCalculationFeatureCollection.java")
    E("CalculateField", "transform", T.make_calculate_field,
      "GT/CalculateFieldProcess.java:76-96")
    E("SelectFeatures", "transform", T.make_filter,
      "GT/SelectFeaturesProcess.java:76-91")
    E("Buffer", "transform", T.make_buffer,
      "GT/transformation/BufferExpressionFeatureCollection.java")
    E("SingleSidedBuffer", "transform", T.make_single_sided_buffer,
      "GT/transformation/SingleSidedBufferFeatureCollection.java:"
      "137-175 (offset-curve side polygon)")
    E("VariableBuffer", "transform", T.make_variable_buffer,
      "GT/transformation/VariableBufferFeatureCollection.java (JTS "
      "VariableBuffer: arc-length interpolated distance)")
    E("WedgeBuffer", "transform", T.make_wedge_buffer,
      "GT/transformation/WedgeBufferFeatureCollection.java:264-340")
    E("MultipleRingBuffer", "transform", T.make_multiple_ring_buffer,
      "GT/transformation/MultipleBufferFeatureCollection.java")
    E("FeatureToPoint", "transform", T.feature_to_point,
      "GT/transformation/ToPointFeatureCollection.java")
    E("FeatureToConvexHull", "transform", T.convex_hull_transform,
      "GT/transformation/FeatureToConvexHull")
    E("FeatureEnvelopeToPolygon", "transform", T.envelope_to_polygon,
      "GT/transformation/FeatureEnvelopeToPolygon")
    E("FeatureToMinimumRectangle", "transform", T.minimum_rectangle,
      "GT/transformation/FeatureToMinimumRectangle")
    E("FeatureToMinimumBoundingCircle", "transform",
      T.minimum_bounding_circle, "GT/transformation/FeatureToMBC")
    E("FeatureToOctagonalEnvelope", "transform", T.octagonal_envelope,
      "GT/transformation/FeatureToOctagonalEnvelope")
    E("FeatureToMaximumInscribedCircle", "transform",
      T.maximum_inscribed_circle,
      "GT/transformation/MaximumInscribedCircleFeatureCollection")
    E("Simplify", "transform", T.make_simplify,
      "GT/transformation/SimplifyFeatureCollection.java")
    from .ops import simplify as SI
    from .ops import unionpoly as UP

    E("UnionPolygon", "overlay", UP.union_polygon,
      "GT/UnionPolygonProcess.java:99-121",
      params=[Param("ds", "dataset"),
              Param("preserve_hole", "bool", False, True),
              Param("grid_size", "float", False, None),
              Param("max_component", "int", False, 20_000)])

    E("SimplifyPolygon", "transform", SI.simplify_polygon_topo,
      "GT/operations/SimplifyPolygonFeaturesOperation.java:94-260",
      params=[Param("ds", "dataset"), Param("tolerance", "float"),
              Param("fid_col", "str", False, "fid"),
              Param("minimum_area", "float", False, 0.0),
              Param("preserve_topology", "bool", False, True)])
    E("Densify", "transform", T.make_densify,
      "GT/transformation/DensifyFeatureCollection.java")
    E("Smooth", "transform", T.make_smooth,
      "GT/transformation/SmoothFeatureCollection")
    E("RemoveParts", "transform", T.remove_small_parts,
      "GT/transformation/RemovePartsFeatureCollection")
    E("FlipLine", "transform", T.flip_line, "GT/transformation/FlipLine")
    E("OffsetFeatures", "transform", T.make_offset,
      "GT/transformation/OffsetFeatureCollection.java")
    E("RotateFeatures", "transform", T.make_rotate,
      "GT/transformation/RotateFeatureCollection.java")
    E("ScaleFeatures", "transform", T.make_scale,
      "GT/transformation/ScaleFeatureCollection.java")
    E("VerticesToPoints", "transform", T.vertices_to_points,
      "GT/transformation/VerticesToPointsFeatureCollection.java")
    E("MultipartToSinglepart", "transform", T.multipart_to_singlepart,
      "GT/transformation/ExplodeFeatureCollection.java")
    E("PointsAlongLines", "transform", T.points_along_lines,
      "GT/transformation/PointsAlongLines")
    E("SplitLineAtVertices", "transform", T.split_line_at_vertices,
      "GT/transformation/SplitLineFeatureCollection.java")
    E("SplitLineByDistance", "transform", LO.split_line_by_distance,
      "GT/transformation/SplitByDistanceFeatureCollection.java")
    E("PointsToLine", "aggregate", LO.points_to_line,
      "GT/operations/PointsToLineOperation.java:92-233 (group by lineField, "
      "sort ascending, first-coordinate chain, closeLine->Polygon, "
      "Bezier/geodesic options)")
    E("SplitPolygonByCount", "transform", T.split_polygon_by_count,
      "GT/operations/SplitPolygonByCountOperation (equal-area x-cuts)")
    E("ExtendLine", "transform", LO.extend_line,
      "GT/operations/ExtendLineOperation.java")
    E("TrimLine", "transform", LO.trim_line,
      "GT/operations/TrimLineOperation.java")
    E("RemoveHoles", "transform", T.remove_holes,
      "GT/transformation/RemoveHolesFeatureCollection")
    E("RepairGeometry", "transform", T.repair_geometry,
      "GT/transformation/RepairGeometryFeatureCollection")
    E("FeatureToLine", "transform", T.feature_to_line,
      "GT/FeaturesToLineProcess (polygon rings -> lines)")
    E("FeatureToPolygon", "transform", T.feature_to_polygon,
      "GT/FeaturesToPolygonProcess (closed lines -> polygons)")
    E("FeatureToMaximumInscribedRectangle", "transform",
      T.maximum_inscribed_rectangle,
      "GT/util/MaximumInscribedRectangle.java (40x40 interior grid + "
      "largest-rectangle DP, min-diameter rotation)")
    E("SplitLineAtPoint", "transform", T.make_split_line_at_points,
      "GT/operations/SplitLineAtPointOperation.java:65-180")
    E("PolygonsAlongLines", "transform", T.make_polygons_along_lines,
      "GT/transformation/PolygonsAlongLinesFeatureCollection.java:"
      "204-219 (flat-cap buffer of distance sub-lines)")
    E("RandomPointsPerFeatures", "transform",
      T.make_random_points_per_features,
      "GT/RandomPointsPerFeaturesProcess (content-hash-seeded)")
    E("SinglepartToMultipart", "transform", AG.singlepart_to_multipart,
      "GT/SinglepartToMultipartProcess (groupby + multi encode)")
    E("CountFeatures", "transform", AG.count_features,
      "GT/CountFeaturesProcess")
    E("ForceDimension", "transform", T.make_force_dimension,
      "GT/ForceDimensionProcess (ISO WKB Z encode; Z/M-stripping "
      "decode)")
    E("GeometryToFeatures", "transform", GJ.geometry_to_features,
      "GT/GeometryToFeaturesProcess (WKT/WKB -> 1-row table)")
    E("CollectFeatures", "transform", AG.collect_features,
      "GT/CollectFeaturesProcess (driver materialize)")
    E("Reproject", "transform", T.make_reproject,
      "GT/transformation/ReprojectFeatureCollection.java")

    # raster (§2.7)
    E("KernelDensity", "raster", RD.kernel_density,
      "GT/gridcoverage/RasterKernelDensityOperation.java")
    E("PointDensity", "raster", RD.point_density,
      "GT/gridcoverage/RasterPointDensityOperation.java")
    E("LineDensity", "raster", RD.line_density,
      "GT/gridcoverage/RasterLineDensityOperation.java (additive line "
      "burn + binary neighborhood kernel, scaleArea/1000 projected)")
    E("ZonalStatistics", "raster", RZ.zonal_statistics,
      "GT/gridcoverage/RasterZonalOperation.java:69-224")
    E("PointsToRaster", "raster", RT.points_to_raster,
      "GT/gridcoverage/RasterPointsToRasterOperation.java")
    E("RasterToPoint", "raster", RT.raster_to_points,
      "GT/transformation/CoverageToPointFeatureCollection.java:58-90")
    E("FeaturesToRaster", "raster", RRZ.rasterize_features,
      "GT/gridcoverage/RasterFeaturesToRasterOperation.java (assoc. "
      "max/min/sum/count assigns; cell-center coverage)")
    E("GeometryToRaster", "raster", RRZ.geometry_to_raster,
      "GT/gridcoverage/GeometryToRasterOperation.java")
    E("RasterToPolygon", "raster", RVZ.raster_to_polygon,
      "GT/gridcoverage/RasterToPolygonOperation.java (per-tile edge "
      "cancellation + cross-tile groupby(value) merge)")
    E("RasterToGridPolygon", "raster", RVZ.raster_to_grid_polygon,
      "GT/gridcoverage (RasterToGridPolygon)")
    E("ExtractValuesToPoints", "raster", RT.extract_values_to_points,
      "GT/gridcoverage/RasterExtractValuesToPointsOperation.java:54-78")
    E("RasterProfile", "raster", RT.raster_profile,
      "GT/gridcoverage/RasterProfileOperation")
    E("RasterDescribe", "raster", RT.raster_statistics,
      "GT/gridcoverage/RasterDescribeOperation.java")
    E("RasterExtraction", "raster", RA.raster_extraction,
      "GT/RasterExtractionProcess.java:88 (keep cells matching filter)")
    E("RasterExport", "raster", GT2.write_geotiff,
      "GT/RasterExportProcess (minimal GeoTIFF writer: striped, "
      "DEFLATE, nodata tag, ModelPixelScale/Tiepoint; round-trips the "
      "reference's sfdem.tif bit-exact)")
    E("RasterForceCRS", "raster", RA.raster_force_crs,
      "GT/RasterForceCRSProcess (metadata-only CRS stamp)")
    E("StatisticsGridCoverage", "raster", RT.raster_statistics,
      "GT/StatisticsGridCoverageProcess (global cell stats)")
    E("RasterMath", "raster", RA.raster_math,
      "GT/gridcoverage/RasterMathOperation.java")
    E("RasterCon", "raster", RA.raster_con,
      "GT/gridcoverage/RasterConOperation.java")
    E("RasterReclass", "raster", RA.raster_reclass,
      "GT/gridcoverage/RasterReclassOperation.java")
    E("RasterSetNull", "raster", RA.raster_set_null,
      "GT/gridcoverage/RasterSetNullOperation.java")
    E("RasterReplaceValues", "raster", RA.raster_replace,
      "GT/gridcoverage/RasterReplaceValuesOperation.java")
    E("RasterRescale", "raster", RA.raster_rescale,
      "GT/gridcoverage/RasterRescaleOperation.java")
    E("RasterNDVI", "raster", RA.raster_ndvi,
      "GT/gridcoverage/RasterNDVIOperation.java")
    E("RasterCutFill", "raster", RA.raster_cut_fill1,
      "GT/gridcoverage/RasterCutFillOperation.java:55-140 (DEM vs "
      "reference plane, mean-height default, crop, flag raster + "
      "CutFillResult stats)")
    E("RasterCutFill2", "raster", RA.raster_cut_fill2,
      "GT/gridcoverage/RasterCutFillOperation2.java:54-146 (two-DEM "
      "volume change)")
    E("RasterCutFill3", "raster", RA.raster_cut_fill3,
      "GT/gridcoverage/RasterCutFillOperation3.java:64-178 (two DEMs "
      "vs common plane; above-plane masks + overlay change regions)")
    E("RasterSlope", "raster", RS.slope,
      "GT/gridcoverage/RasterSlopeOperation.java")
    E("RasterAspect", "raster", RS.aspect,
      "GT/gridcoverage/RasterAspectOperation.java")
    E("RasterHillshade", "raster", RS.hillshade,
      "GT/gridcoverage/RasterHillshadeOperation.java")
    E("RasterTPI", "raster", RS.tpi, "GT/gridcoverage/RasterTPIOperation")
    E("RasterTRI", "raster", RS.tri, "GT/gridcoverage/RasterTRIOperation")
    E("RasterRoughness", "raster", RS.roughness,
      "GT/gridcoverage/RasterRoughnessOperation")
    E("RasterCurvature", "raster", RS.curvature,
      "GT/gridcoverage/RasterCurvatureOperation")
    E("RasterFlowDirection", "raster", RS.flow_direction,
      "GT/gridcoverage/RasterFlowDirectionOperation")
    E("RasterSurfaceArea", "raster", RS.surface_area,
      "GT/gridcoverage/RasterSurfaceAreaOperation.java")
    E("IDWInterpolation", "raster", RI.idw,
      "GT/gridcoverage/RasterInterpolationIDWOperation.java")
    E("TINInterpolation", "raster", RI.tin_interpolation,
      "GT/gridcoverage/RasterInterpolationTINOperation.java (Delaunay "
      "+ barycentric per tile)")
    E("TPSInterpolation", "raster", RI.tps,
      "GT/gridcoverage/ThinPlateSplineInterpolator.java")
    E("EuclideanDistance", "raster", RI.euclidean_distance,
      "GT/gridcoverage/RasterEuclideanDistanceOperation.java")
    E("RasterClipByExtent", "raster", RG2.clip_by_extent,
      "GT/gridcoverage/RasterClipOperation.java")
    E("RasterFlip", "raster", RG2.flip,
      "GT/gridcoverage/RasterFlipOperation.java")
    E("RasterShift", "raster", RG2.shift,
      "GT/gridcoverage/RasterShiftOperation.java")
    E("RasterResample", "raster", RG2.resample,
      "GT/gridcoverage/RasterResampleOperation.java")
    E("RasterClipByCircle", "raster", RG2.clip_by_circle,
      "GT/gridcoverage/RasterClipOperation.java (circle mask)")
    E("RasterClipByFeatures", "raster", RG2.clip_by_features,
      "GT/gridcoverage/RasterClipOperation.java (polygon mask)")
    E("RasterClipByGeometry", "raster", RG2.clip_by_geometry,
      "GT/gridcoverage/RasterClipOperation.java (geometry mask)")
    E("RasterMirror", "raster", RG2.mirror,
      "GT/gridcoverage/RasterMirrorOperation.java")
    E("RasterRotate", "raster", RG2.rotate,
      "GT/gridcoverage/RasterRotateOperation.java (inverse mapping)")
    E("RasterReproject", "raster", RG2.reproject_raster,
      "GT/gridcoverage/RasterReprojectOperation.java (4326<->3857 "
      "analytic; full PROJ needs pyproj, out of container scope)")
    E("RasterHighLowPoints", "raster", RG2.high_low_points,
      "GT/gridcoverage/RasterHighLowPointsOperation.java")
    E("RasterFuzzy", "raster", RG2.raster_fuzzy,
      "GT/gridcoverage/RasterFuzzyOperation.java:118-206 (2/3/4-value "
      "branches incl. the swapped-dX/dW decreasing quirk)")
    E("GeoTiffRead", "raster", GT2.geotiff_to_tiles,
      "GS/ppio/GeoTiffWithParamsPPIO.java (decode side)")
    E("RasterLinearLOS", "raster", RI.linear_los,
      "GT/gridcoverage/RasterLinearLOSOperation (FunctionalSurface)")
    E("RasterRadialLOS", "raster", RI.radial_los,
      "GT/gridcoverage/RasterRadialLOSOperation")
    E("TextfileToPoint", "transform", TF.textfile_to_points,
      "GT/operations/TextfileToPointOperation.java:111-175")
    E("GeoJSONDecode", "transform", GJ.geojson_to_table,
      "GS/ppio/ApplicationGeoJSONPPIO.java:68-95")
    E("ShapeExport", "transform", SF.write_shapefile,
      "GT/ShapeExportProcess (minimal .shp/.shx/.dbf writer, ESRI ring "
      "orientation; round-trips the reference's hexa.shp fixture)")
    E("ShapefileRead", "transform", SF.read_shapefile,
      "GT/storage/DataStoreFactory.java:64-90 (read side)")
    E("GeoJSONEncode", "transform", GJ.dataset_to_geojson,
      "GS/ppio/ApplicationGeoJSONPPIO.java:96-130")

    # training-data ops (engine extensions)
    E("ExactDedup", "trainingdata", TD.exact_dedup)
    E("MinHashDedup", "trainingdata", TD.minhash_dedup)
    E("SimHash", "trainingdata", TD.simhash_dedup)
    E("EmbeddingNearDup", "trainingdata", TD.embedding_neardup)
    E("TokenCount", "trainingdata", TQ.token_count_batch)
    E("QualityScore", "trainingdata", TQ.quality_score_batch)
    E("LanguageId", "trainingdata", TQ.LanguageId)
    E("Fingerprint", "trainingdata", TQ.fingerprint_batch)
    E("AnnBruteTopK", "trainingdata", ANN.brute_topk)
    E("AnnIvfTopK", "trainingdata", ANN.ivf_topk)
    E("PQEncode", "trainingdata", ANN.pq_encode,
      "engine extension (round 5): product-quantization corpus "
      "encoding (Jégou et al., TPAMI 2011) — m uint8 codes/vector, "
      "32x memory reduction at D=64/float32; the step that fits a "
      "10^12-vector corpus in cluster RAM")
    from .vector import stats as VST

    E("EmbeddingMoments", "trainingdata", VST.embedding_moments,
      "engine extension (round 5): streaming mean/covariance of an "
      "embedding column — per-batch (n, Σx, ΣxxT) sufficient "
      "statistics, two-level reduce, driver holds D+D² floats only")
    E("PcaWhiten", "trainingdata", VST.pca_fit,
      "engine extension (round 5): distributed PCA / whitening "
      "rotation (OPQ prerequisite, Ge et al. 2013 public) — one "
      "covariance pass + driver eigh, deterministic component signs; "
      "pca_transform projects as a stateless batch map")
    E("AnnIvfPqTopK", "trainingdata", ANN.ivfpq_topk,
      "engine extension (round 5): IVF-PQ composition (FAISS IVFPQ "
      "shape, Jégou et al. 2011) — coarse routing prunes WHICH "
      "vectors move (nprobe/nlist), PQ compresses WHAT moves (8-byte "
      "codes, 32x smaller exchange than ivf_topk); raw-vector "
      "codebooks instead of per-bucket residuals (documented); exact "
      "(score, id) partial-top-k tie-break shared with all scorers")
    E("PQTopK", "trainingdata", ANN.pq_topk,
      "engine extension (round 5): ADC approximate cosine top-k over "
      "PQ codes — per-query LUTs built once per actor, uint8 "
      "gather+sum hot path, hash-sampled codebook training, "
      "reusable pre-encoded corpus (codes_ds+books)")
    E("ImageEmbeddings", "multimodal", MM.image_embeddings)
    E("AudioFrameSample", "multimodal", MM.audio_frames)
    E("VideoFrameFeatures", "multimodal", MM.video_frame_features)
    from .ops import sample as SMP

    E("TableSample", "trainingdata", SMP.deterministic_sample,
      "engine extension (SURVEY §2.8: the reference has no table "
      "sampling op) — deterministic multiplicative-hash sample, "
      "reproducible across partitionings/cluster sizes")
    E("RasterInterpolationIDWFixed", "raster", RI.idw_fixed_radius,
      "GT/gridcoverage/IDWInterpolator.java:107-160 (SearchRadiusType"
      ".Fixed; halo co-shuffle scale path — no broadcast, no sample "
      "cap)")
    E("SynthMedia", "multimodal", MM.synth_media_batch)
    from .raster import image as RIMG
    from .raster import jpeg as RJPG

    E("DecodePNG", "multimodal", RIMG.decode_png_any,
      "engine extension (round 4): full stdlib baseline PNG decoder — "
      "all 5 filters / 5 color types at bit depth 8; the real decode "
      "path behind ImageEmbeddings")
    E("DecodeJPEG", "multimodal", RJPG.decode_jpeg,
      "engine extension (rounds 4-5): JPEG decoder for baseline (SOF0) "
      "AND progressive (SOF2: spectral selection + successive "
      "approximation) scans (T.81 public spec) — Huffman + vectorized "
      "IDCT, chroma subsampling, restart markers; paired baseline and "
      "progressive encoders for synthesis")
    from .textops import avi as TAVI
    from .textops import wav as TWAV

    E("DecodeWAV", "multimodal", TWAV.decode_wav,
      "engine extension (round 4): RIFF/WAVE PCM + IEEE-float decoder "
      "(8/16/24/32-bit, multi-channel); the real path behind "
      "AudioFrameSample")
    E("DecodeAVI", "multimodal", TAVI.decode_avi_mjpeg,
      "engine extension (round 4): AVI/MJPEG container decoder (RIFF "
      "walk + per-frame baseline JPEG); the real path behind "
      "VideoFrameFeatures")
    from .sources import dbstore as DBS

    E("DBStoreRead", "source", DBS.read_db_table,
      "GT/storage/DataStoreFactory.java:113-134 (JDBC DataStore "
      "analogue on DuckDB — no DB server/network in this container): "
      "parallel range reads via read-only connections, column/"
      "predicate pushdown")
    E("DBStoreWrite", "sink", DBS.write_db_table,
      "GT/storage/FeatureInserter (buffered tx writer): streamed "
      "iter_batches through the single-writer connection, one "
      "all-or-nothing transaction")
    from .sources import dxf as DXF

    E("DXFStoreRead", "source", DXF.read_dxf,
      "GT/storage DXF DataStore (GeoTools dxf plugin): R12 group-code "
      "reader — POINT/LINE/POLYLINE/LWPOLYLINE to WKB; "
      "blocks/arcs/text out of scope (documented)")
    E("DXFStoreWrite", "sink", DXF.write_dxf,
      "GT/storage DXF DataStore: R12 writer (points, polylines, "
      "closed rings; polygon holes as separate closed polylines)")
    from .sources import warc as WRC

    E("WarcRead", "source", WRC.warc_dataset,
      "engine extension (round 5): WARC/ISO-28500 shard reader — the "
      "container Common-Crawl pages arrive in (input_hint ingest "
      "path); one streaming generator task per shard, per-record gzip "
      "members, HTTP strip, column pruning at the read. Nearest "
      "reference analogue: GS/ppio source PPIOs")
    E("WarcWrite", "sink", WRC.write_warc,
      "engine extension (round 5): WARC writer — per-record gzip "
      "members (Common-Crawl layout, splittable), deterministic "
      "uuid5 record ids")
    E("WarcReadIndexed", "source", WRC.warc_dataset_indexed,
      "engine extension (round 5): CDX-driven WARC read — exact "
      "member (offset, length) ranges grouped into ~target_bytes "
      "byte-range read tasks, so ingest parallelism is RECORD-"
      "bounded instead of shard-bounded (the cc-index consumer "
      "read pattern); output row-identical to WarcRead (pytest)")
    E("CdxIndex", "source", WRC.cdx_dataset,
      "engine extension (round 5): cc-index CDX build — SURT url "
      "keys, sha1-b32 body digests, gzip-member (offset, length) "
      "byte ranges per record; one task per shard; read_warc_at is "
      "the ranged-GET random-access fetch the index enables")
    E("CharsetDecode", "trainingdata", WRC.decode_payloads,
      "engine extension (round 5): crawl-payload charset sniffing "
      "(BOM → Content-Type → WHATWG meta prescan → UTF-8 validate → "
      "latin-1 fallback) and replacement-safe decode — hostile pages "
      "can never raise or hang the pool")
    from .textops import urlops as URL

    E("UrlParse", "trainingdata", URL.parse_urls,
      "engine extension (round 4, input_hint url column): vectorized "
      "RE2 host/domain/path-depth/query parse; SQL-oracled gate "
      "url_parse")
    E("UrlNormalize", "trainingdata", URL.normalize_urls,
      "engine extension (round 4): canonical URL for exact dedup — "
      "lowercase scheme+host, default ports/fragments dropped, "
      "trailing slash trimmed")
    from .textops import htmlops as HTO

    E("HtmlTextExtract", "trainingdata", HTO.html_to_text,
      "engine extension (round 4, input_hint html column): stdlib "
      "HTML-to-text extraction (entity decode, script/style subtree "
      "drop, whitespace collapse) — reproduces the pages text column "
      "byte-identically (north-rule invariant); SQL-oracled gate "
      "html_extract")
    E("DuplicateWindows", "trainingdata", TD.duplicate_window_hits,
      "engine extension (round 4): exact cross-document duplicate "
      "spans, windowed formulation of Lee et al. 2022 suffix-array "
      "dedup (public) — slim (hash, doc, pos) shuffle, bucketized "
      "vectorized distinct-doc counting; SQL-oracled gate "
      "duplicate_windows")
    E("PiiRedact", "trainingdata", URL.redact_pii,
      "engine extension (round 4): Dolma/ROOTS-style PII scrub — "
      "email/IPv4/phone masking, vectorized RE2 (identical pattern "
      "semantics to the DuckDB oracle); SQL-oracled gate pii_redact")
    E("RepetitionSignals", "trainingdata", TQ.repetition_signals,
      "engine extension (round 4): Gopher/MassiveText repetition "
      "quality rules (Rae et al. 2021, public) — unique-word "
      "fraction + top adjacent-bigram share; SQL-oracled gate "
      "gopher_repetition")
    from .textops import charlm as CLM

    E("CharLmScore", "trainingdata", CLM.charlm_score,
      "engine extension (round 5): corpus char-bigram LM fluency "
      "score, the integer-exact formulation of the CCNet perplexity "
      "filter (Wenzek et al. 2020, public) — vocabulary-bounded "
      "count shuffle + broadcast table scoring; SQL-oracled gate "
      "charlm_score. Nearest reference analogue: "
      "GT/statistics DataStatisticsProcess.java:1")
    E("CapPerKey", "trainingdata", TD.cap_per_key,
      "engine extension (round 5): per-domain document cap "
      "(FineWeb/C4 crawl balancing) — slim (key, id) shuffle, "
      "bucket-grouped vectorized rank; SQL-oracled gate domain_cap")
    E("IncrementalDedup", "trainingdata", TD.incremental_dedup,
      "engine extension (round 5): crawl-delta dedup of a new "
      "snapshot against a prior corpus — broadcast Bloom prefilter "
      "(definite-novel rows never shuffle) + bucket-grouped exact "
      "hash anti-join confirm; SQL-oracled gate crawl_delta. "
      "Reference analogue: GT/overlay DifferenceProcess.java:1 "
      "set-difference semantics, keyed by content")
    E("CorpusCuration", "trainingdata", CLM.charlm_score,
      "engine extension (round 5): FineWeb/Gopher-shaped curation "
      "funnel — word/type-token metrics ride through the charlm "
      "scorer (keep_cols), integer cross-multiplied keep rules; "
      "SQL-oracled composite gate corpus_curation")
    from .pipelines import webtext as WTX

    E("CurateCrawl", "pipeline", WTX.curate_crawl,
      "engine extension (round 5): end-to-end crawl curation — WARC "
      "shards → robots filter → charset decode → html extract → "
      "normalize → integer quality funnel → exact dedup (slim hash "
      "shuffle + one bounded payload re-attach) → checkpoint-"
      "resumable bucketed parquet; every stage is an already-gated "
      "operator, composition pytest-covered end-to-end incl. resume")
    from .textops import normalize as NRM

    E("TextNormalize", "trainingdata", NRM.normalize_texts,
      "engine extension (round 5): Unicode NFC/NFKC + casefold + "
      "whitespace squash — the canonicalization pass before dedup "
      "keys; SQL-oracled gate text_normalize (DuckDB nfc_normalize)")
    from .textops import sketch as SKT

    E("CountMinSketch", "trainingdata", SKT.cms_build,
      "engine extension (round 5): mergeable count-min frequency "
      "sketch (Cormode & Muthukrishnan 2005, public) — per-batch "
      "partials, addition merge via two-level reduce; over-count "
      "guarantee + eps*N bound pytest-proven (approximate by design, "
      "no SQL oracle)")
    E("HyperLogLog", "trainingdata", SKT.hll_distinct,
      "engine extension (round 5): mergeable HLL distinct counter "
      "(Flajolet et al. 2007, public) — register-max merge, "
      "linear-counting small-range correction; accuracy + merge-law "
      "pytest-proven (approximate by design, no SQL oracle)")
    from .textops import terms as TRM

    E("TopTerms", "trainingdata", TRM.top_terms,
      "engine extension (round 5): corpus top-k vocabulary — "
      "vocabulary-bounded (term, cnt) shuffle, deterministic "
      "(cnt DESC, term) selection; SQL-oracled gate top_terms")
    E("DocKeywords", "trainingdata", TRM.doc_keywords,
      "engine extension (round 5): per-doc keyword extraction with "
      "the integer-exact tf·idf ordering (tf DESC, df ASC, term) — "
      "broadcast df table + lexsort/reduceat; SQL-oracled gate "
      "doc_keywords")
    E("InvertedIndex", "trainingdata", TRM.inverted_index,
      "engine extension (round 5): search-index construction — slim "
      "distinct (term, doc) shuffle, bucket-grouped vectorized "
      "posting-list assembly; SQL-oracled gate inverted_index")
    from .ops import histogram as HG2

    E("CohortRetention", "events", HG2.cohort_retention,
      "engine extension (round 5): cohort retention matrix — "
      "per-user first-day cohorting, user-bucket co-shuffle of "
      "cohort+activity, all-integer epoch days; SQL-oracled gate "
      "cohort_retention")
    E("RobotsFilter", "trainingdata", URL.robots_filter,
      "engine extension (round 5): RFC 9309 robots.txt crawl-"
      "permission filter — group-selecting parser, longest-match/"
      "Allow-tie semantics, wildcard + anchor patterns, vectorized "
      "RE2 matching; SQL-oracled gate robots_filter")

    # presentational map-output ops (§2.2 WindRose/FlowMap/RingMap/
    # PolarGrids — round-3 closure of the "8 presentational absences")
    from .ops import presentation as PR

    E("WindRoseMap", "presentation", PR.windrose_map,
      "GT/WindRoseMapProcess.java + GT/transformation/"
      "WindroseFeatureCollection.java:125-255")
    E("WindRoseAnchor", "presentation", PR.windrose_anchor,
      "GT/transformation/WindroseAnchorFeatureCollection.java:125-160")
    E("MultiWindRoseMap", "presentation", PR.multi_windrose,
      "GT/MultiWindRoseMapProcess.java + GT/operations/"
      "MultiWindRoseOperation.java:88-420 (per-center sector stats "
      "via (center,sector,input) co-shuffle; documented deviations: "
      "centroid binning, sorted median, anchors once per center)")
    E("FlowMap", "presentation", PR.flow_map,
      "GT/FlowMapProcess.java + GT/transformation/"
      "FlowMapFeatureCollection.java:85-295")
    E("PolarGridsFromFeatures", "presentation", PR.polar_grids,
      "GT/PolarGridsFromFeaturesProcess.java + GT/operations/"
      "PolarGridsOperation.java:239-330")
    E("PolarGridsFromGeometry", "presentation", PR.polar_grid_cells,
      "GT/PolarGridsFromGeometryProcess.java + GT/operations/"
      "PolarGridsOperation.java:180-238")
    from .raster import image as IMG

    E("RasterToImage", "presentation", IMG.raster_to_image,
      "GT/RasterToImageProcess.java:56-140 (bbox window, resample, "
      "stretch, transparency; stdlib PNG codec — SLD styling out of "
      "scope, color ramp instead)")
    E("MapToImage", "presentation", IMG.map_to_image,
      "GT/MapToImageProcess.java (rasterize layer onto the pixel "
      "grid + ramp; SLD symbology out of scope — documented)")
    E("RingMap", "presentation", PR.ring_map,
      "GT/RingMapProcess.java + GT/operations/RingMapsOperation.java:"
      "95-240 (greedy nearest-per-side, driver-side by design — "
      "legend-scale output, max_features cap raises)")


_populate()
