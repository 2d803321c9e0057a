"""Raster layer: tile scatter/reduce vs dense-numpy oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.raster import (RasterMeta, kernel_density, points_to_raster,
                                raster_statistics, raster_to_points,
                                zonal_statistics)
from opengxt_ray.raster.algebra import raster_math, raster_ndvi
from opengxt_ray.raster.density import kernel_matrix
from opengxt_ray.raster.surface import slope
from opengxt_ray.core import wkb as _wkb


META = RasterMeta(origin_x=0.0, origin_y=100.0, cell_size=1.0,
                  width=100, height=100, tile_size=32)


def _pts(n=3000, seed=9):
    rs = np.random.RandomState(seed)
    x = rs.uniform(0, 100, n)
    y = rs.uniform(0, 100, n)
    w = rs.uniform(0.5, 2.0, n)
    return x, y, w


def _dense(tiles_ds, meta):
    """Assemble tile Dataset → dense (H, W) array (zeros where absent)."""
    out = np.zeros((meta.height, meta.width))
    for row in tiles_ds.iter_rows():
        tx, ty = row["tx"], row["ty"]
        h, w = meta.tile_shape(tx, ty)
        arr = np.frombuffer(row["data"], dtype=np.float64).reshape(h, w)
        out[ty * meta.tile_size : ty * meta.tile_size + h,
            tx * meta.tile_size : tx * meta.tile_size + w] = arr
    return out


@pytest.fixture(scope="module")
def pts_ds():
    x, y, w = _pts()
    t = pa.table({"lon": pa.array(x), "lat": pa.array(y), "w": pa.array(w)})
    return ray.data.from_arrow(t).repartition(4), (x, y, w)


def test_points_to_raster_count(pts_ds):
    ds, (x, y, w) = pts_ds
    tiles = points_to_raster(ds, META, assign="count")
    dense = _dense(tiles, META)
    col, row = META.world_to_cell(x, y)
    expect = np.zeros_like(dense)
    np.add.at(expect, (row, col), 1.0)
    np.testing.assert_array_equal(dense, expect)


def test_kernel_density_matches_dense_conv(pts_ds):
    ds, (x, y, w) = pts_ds
    tiles = kernel_density(ds, META, search_radius=5.0, weight_col="w")
    dense = _dense(tiles, META)
    # oracle: dense scatter of kernel windows
    K, valid = kernel_matrix(5, "quadratic")
    scale = valid * 1.0
    col, row = META.world_to_cell(x, y)
    expect = np.zeros((META.height + 10, META.width + 10))
    for xi, yi, wi in zip(col, row, w):
        expect[yi : yi + 11, xi : xi + 11] += wi * K / scale
    expect = expect[5:-5, 5:-5]
    # clip: engine drops out-of-bounds cells, oracle added padding then cropped
    np.testing.assert_allclose(dense, expect, rtol=1e-12)


def test_zonal_statistics(pts_ds):
    ds, (x, y, w) = pts_ds
    tiles = points_to_raster(ds, META, assign="sum", value_col="w")
    zones = pa.table({
        "zid": pa.array([0, 1], pa.int64()),
        "geom": pa.array([
            _wkb.encode_polygon(np.array([[0, 0], [50, 0], [50, 100], [0, 100]])),
            _wkb.encode_polygon(np.array([[50, 0], [100, 0], [100, 100], [50, 100]])),
        ], pa.binary()),
    })
    res = zonal_statistics(tiles, META, zones, zone_key="zid").to_pandas()
    res = res.sort_values("zid").reset_index(drop=True)
    dense = _dense(tiles, META)
    cols, rows = np.meshgrid(np.arange(META.width), np.arange(META.height))
    cx, cy = META.cell_center(cols, rows)
    for zid, (x0, x1) in [(0, (0, 50)), (1, (50, 100))]:
        mask = (cx >= x0) & (cx <= x1)  # boundary-inclusive PIP
        vals = dense[mask]
        assert res.loc[zid, "zcount"] == pytest.approx(mask.sum())
        assert res.loc[zid, "zsum"] == pytest.approx(vals.sum())
        assert res.loc[zid, "zmax"] == pytest.approx(vals.max())


def test_raster_roundtrip_and_stats(pts_ds):
    ds, (x, y, w) = pts_ds
    tiles = points_to_raster(ds, META, assign="sum", value_col="w")
    stats = raster_statistics(tiles, META)
    dense = _dense(tiles, META)
    assert stats["sum"] == pytest.approx(dense.sum())
    assert stats["max"] == pytest.approx(dense.max())
    pts = raster_to_points(tiles, META, drop_zero=True).to_pandas()
    assert len(pts) == int((dense != 0).sum())
    assert pts["val"].sum() == pytest.approx(dense.sum())


def test_raster_math_and_ndvi(pts_ds):
    ds, _ = pts_ds
    a = points_to_raster(ds, META, assign="count")
    doubled = raster_math(a, lambda v: v * 2.0)
    assert raster_statistics(doubled, META)["sum"] == pytest.approx(
        2 * raster_statistics(a, META)["sum"])
    nd = raster_ndvi(doubled, a)  # (2c - c)/(3c) = 1/3 where c>0
    dense = _dense(nd, META)
    vals = dense[~np.isnan(dense) & (dense != 0)]
    np.testing.assert_allclose(vals, 1.0 / 3.0)


def test_slope_flat_and_ramp():
    # ramp raster: z = x → slope = atan(1) = 45° everywhere (interior)
    meta = RasterMeta(0.0, 64.0, 1.0, 64, 64, tile_size=32)
    rows_ = []
    for ty in range(2):
        for tx in range(2):
            h, w = meta.tile_shape(tx, ty)
            cols = np.arange(tx * 32, tx * 32 + w)
            tile = np.tile(cols.astype(np.float64), (h, 1))
            rows_.append({"tx": tx, "ty": ty, "data": tile.tobytes()})
    tiles = ray.data.from_items(rows_).map_batches(
        lambda b: pa.table({"tx": pa.array(b["tx"], pa.int32()),
                            "ty": pa.array(b["ty"], pa.int32()),
                            "data": pa.array(list(b["data"]), pa.binary())}),
        batch_format="pandas")
    s = slope(tiles, meta)
    from tests.test_raster import _dense as dense_fn
    d = dense_fn(s, meta)
    # interior cells all 45°
    np.testing.assert_allclose(d[1:-1, 1:-1], 45.0, atol=1e-9)


def test_extract_values_and_profile(pts_ds):
    from opengxt_ray.raster.tiles import extract_values_to_points, raster_profile

    ds, (x, y, w) = pts_ds
    tiles = points_to_raster(ds, META, assign="sum", value_col="w").materialize()
    dense = _dense(tiles, META)
    sampled = extract_values_to_points(ds, tiles, META).to_pandas()
    col, row = META.world_to_cell(x, y)
    # every point samples its own cell's accumulated value
    expect = dense[row, col]
    got = sampled.sort_index()["raster_val"].to_numpy()
    # align by lon since to_pandas may reorder blocks
    m = sampled.sort_values("lon").reset_index(drop=True)
    order = np.argsort(x)
    np.testing.assert_allclose(m["raster_val"].to_numpy(), dense[row[order], col[order]])
    line = _wkb.encode_linestring(np.array([[0.0, 50.0], [99.0, 50.0]]))
    prof = raster_profile(tiles, META, line, distance=10.0).to_pandas()
    assert len(prof) == 10
    pc_, pr = META.world_to_cell(prof["lon"].to_numpy(), prof["lat"].to_numpy())
    np.testing.assert_allclose(prof["raster_val"].to_numpy(), dense[pr, pc_])


def test_geotiff_writer_roundtrip(tmp_path):
    """RasterExport: write_geotiff → read_geotiff round trip (values,
    nodata, georeferencing), single- and multi-strip, DEFLATE."""
    from opengxt_ray.raster.geotiff import read_geotiff, write_geotiff
    from opengxt_ray.raster.tiles import RasterMeta

    meta = RasterMeta(10.0, 60.0, 0.5, 37, 23, tile_size=8)
    rs = np.random.RandomState(3)
    dense = rs.uniform(-100, 100, (23, 37))
    dense[2, 3] = np.nan
    ts = meta.tile_size
    rows = []
    for ty in range(meta.tiles_y):
        for tx in range(meta.tiles_x):
            h, w = meta.tile_shape(tx, ty)
            rows.append({"tx": tx, "ty": ty, "data": np.ascontiguousarray(
                dense[ty * ts:ty * ts + h, tx * ts:tx * ts + w]).tobytes()})
    t = pa.table({
        "tx": pa.array([r["tx"] for r in rows], pa.int32()),
        "ty": pa.array([r["ty"] for r in rows], pa.int32()),
        "data": pa.array([r["data"] for r in rows], pa.binary())})
    tiles = ray.data.from_arrow(t)
    p = str(tmp_path / "rt.tif")
    write_geotiff(tiles, meta, p, dtype="float64", nodata=-9999.0)
    back, m2 = read_geotiff(p)
    assert (m2.origin_x, m2.origin_y, m2.cell_size, m2.width, m2.height) \
        == (10.0, 60.0, 0.5, 37, 23)
    np.testing.assert_allclose(np.nan_to_num(back, nan=-1),
                               np.nan_to_num(dense, nan=-1))


def test_geotiff_writer_sfdem_roundtrip(tmp_path):
    """Round-trip the reference's real sfdem.tif fixture through the
    writer: values must survive bit-exact (float64 path)."""
    import os

    from opengxt_ray.raster.geotiff import (geotiff_to_tiles, read_geotiff,
                                            write_geotiff)

    src = "/root/reference/GeoTools/process-spatialstatistics/src/test/resources/org/geotools/process/spatialstatistics/test-data/sfdem.tif"
    if not os.path.exists(src):
        pytest.skip("sfdem fixture not present")
    dense0, meta0 = read_geotiff(src)
    tiles, meta = geotiff_to_tiles(src, tile_size=128)
    p = str(tmp_path / "sfdem_rt.tif")
    write_geotiff(tiles, meta, p, dtype="float64", nodata=-9999.0)
    dense1, meta1 = read_geotiff(p)
    assert (meta1.width, meta1.height) == (meta0.width, meta0.height)
    assert meta1.cell_size == pytest.approx(meta0.cell_size)
    np.testing.assert_array_equal(np.nan_to_num(dense1, nan=-1),
                                  np.nan_to_num(dense0, nan=-1))


def test_shapefile_writer_roundtrip(tmp_path):
    """ShapeExport: write_shapefile → read_shapefile_table round trip
    (geometry incl. holes, ESRI ring orientation, attrs)."""
    from opengxt_ray.core import geomops, wkb as W
    from opengxt_ray.sources.shapefile import (read_shapefile_table,
                                               write_shapefile)

    donut = W.encode_polygon(
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float),
        [np.array([[3, 3], [3, 7], [7, 7], [7, 3]], float)])
    sq = W.encode_polygon(np.array([[20, 20], [24, 20], [24, 24],
                                    [20, 24]], float))
    t = pa.table({"geom": pa.array([donut, sq], pa.binary()),
                  "name": pa.array(["a", "b"]),
                  "v": pa.array([1.5, -2.25]),
                  "k": pa.array([7, 9])})
    p = write_shapefile(t, str(tmp_path / "poly.shp"))
    back = read_shapefile_table(p)
    np.testing.assert_allclose(
        geomops.areas(W.decode(back["geom"].to_pylist())), [84.0, 16.0])
    assert back["name"].to_pylist() == ["a", "b"]
    assert back["v"].to_pylist() == [1.5, -2.25]
    assert back["k"].to_pylist() == [7, 9]


def test_shapefile_writer_reference_fixture_roundtrip(tmp_path):
    """Read one of the reference's REAL fixtures, write it back out,
    re-read: per-feature areas and row count must survive."""
    import glob
    import os

    from opengxt_ray.core import geomops, wkb as W
    from opengxt_ray.sources.shapefile import (read_shapefile_table,
                                               write_shapefile)

    fixtures = glob.glob(
        "/root/reference/GeoTools/process-spatialstatistics/src/test/"
        "resources/org/geotools/process/spatialstatistics/test-data/*.shp")
    if not fixtures:
        pytest.skip("no reference fixtures")
    src = sorted(fixtures)[0]
    t0 = read_shapefile_table(src)
    mask = pa.array([g is not None for g in t0["geom"].to_pylist()])
    t0 = t0.filter(mask)
    p = write_shapefile(t0, str(tmp_path / os.path.basename(src)))
    t1 = read_shapefile_table(p)
    assert t1.num_rows == t0.num_rows
    a0 = geomops.areas(W.decode(t0["geom"].to_pylist()))
    a1 = geomops.areas(W.decode(t1["geom"].to_pylist()))
    np.testing.assert_allclose(a1, a0, rtol=1e-12)


def test_extract_values_coshuffle_matches_broadcast(pts_ds):
    """Scale path (union + groupby(tile) + id join) == broadcast path,
    including out-of-raster points (nodata fill)."""
    from opengxt_ray.raster.tiles import extract_values_to_points

    ds, (x, y, w) = pts_ds
    ids = np.arange(len(x), dtype=np.int64)
    x2 = x.copy()
    x2[:5] = -50.0  # off-raster
    t = pa.table({"pid": pa.array(ids), "lon": pa.array(x2),
                  "lat": pa.array(y)})
    pds = ray.data.from_arrow(t).repartition(4)
    tiles = points_to_raster(ds, META, assign="sum", value_col="w") \
        .materialize()
    bc = extract_values_to_points(pds, tiles, META).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    cs = extract_values_to_points(pds, tiles, META, id_col="pid",
                                  max_broadcast_cells=1).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    assert len(cs) == len(bc) == len(x)
    np.testing.assert_allclose(cs["raster_val"].to_numpy(),
                               bc["raster_val"].to_numpy())


def test_extract_values_coshuffle_requires_id():
    from opengxt_ray.raster.tiles import extract_values_to_points

    t = pa.table({"lon": pa.array([1.0]), "lat": pa.array([1.0])})
    pds = ray.data.from_arrow(t)
    tiles = points_to_raster(pds, META, assign="count")
    with pytest.raises(ValueError, match="id_col"):
        extract_values_to_points(pds, tiles, META, max_broadcast_cells=1)
