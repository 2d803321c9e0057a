"""Round-3 registrations: RasterCutFill 1/2/3 + BufferStatistics vs
dense-numpy / brute-force oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import wkb as _wkb
from opengxt_ray.raster import RasterMeta
from opengxt_ray.raster.algebra import (raster_cut_fill1, raster_cut_fill2,
                                        raster_cut_fill3,
                                        raster_cut_fill_features)

META = RasterMeta(origin_x=0.0, origin_y=64.0, cell_size=1.0,
                  width=64, height=64, tile_size=32)


def _tiles_from_dense(arr, meta):
    rows = []
    nty = (meta.height + meta.tile_size - 1) // meta.tile_size
    ntx = (meta.width + meta.tile_size - 1) // meta.tile_size
    for ty in range(nty):
        for tx in range(ntx):
            h, w = meta.tile_shape(tx, ty)
            rows.append({"tx": tx, "ty": ty,
                         "data": arr[ty * meta.tile_size:ty * meta.tile_size + h,
                                     tx * meta.tile_size:tx * meta.tile_size + w]
                         .astype(np.float64).tobytes()})
    return ray.data.from_items(rows).map_batches(
        lambda b: pa.table({"tx": pa.array(b["tx"], pa.int32()),
                            "ty": pa.array(b["ty"], pa.int32()),
                            "data": pa.array(list(b["data"]), pa.binary())}),
        batch_format="pandas")


def _dense(tiles_ds, meta):
    out = np.full((meta.height, meta.width), np.nan)
    for row in tiles_ds.take_all():
        tx, ty = row["tx"], row["ty"]
        h, w = meta.tile_shape(tx, ty)
        out[ty * meta.tile_size:ty * meta.tile_size + h,
            tx * meta.tile_size:tx * meta.tile_size + w] = \
            np.frombuffer(row["data"], np.float64).reshape(h, w)
    return out


def _stats_dict(stats: pa.Table):
    d = stats.to_pydict()
    return {c: (d["count"][i], d["area"][i], d["volume"][i])
            for i, c in enumerate(d["category"])}


@pytest.fixture(scope="module")
def dem(ray_session):
    rs = np.random.RandomState(11)
    a = rs.uniform(0, 100, (64, 64))
    a[5:8, 5:8] = np.nan  # nodata pocket
    return a


def test_cut_fill1_mean_base(dem):
    tiles = _tiles_from_dense(dem, META)
    flags, stats, base = raster_cut_fill1(tiles, META)
    fin = ~np.isnan(dem)
    # engine mean: sum/count (raster_statistics)
    assert base == pytest.approx(dem[fin].mean(), rel=1e-12)
    diff = dem - base
    want = _stats_dict(stats)
    cut = fin & (diff > 0)
    fill = fin & (diff < 0)
    assert want[1][0] == cut.sum() and want[-1][0] == fill.sum()
    assert want[0][0] == fin.sum() - cut.sum() - fill.sum()
    assert want[1][2] == pytest.approx(diff[cut].sum(), rel=1e-9)
    assert want[-1][2] == pytest.approx(-diff[fill].sum(), rel=1e-9)
    assert want[0][2] == 0.0
    d = _dense(flags, META)
    np.testing.assert_array_equal(np.isnan(d), ~fin)
    np.testing.assert_array_equal(d[fin], np.sign(diff[fin]))


def test_cut_fill2_and_features(dem):
    rs = np.random.RandomState(12)
    after = dem + rs.choice([-2.0, 0.0, 3.0], size=dem.shape)
    tb = _tiles_from_dense(dem, META).materialize()
    ta = _tiles_from_dense(after, META).materialize()
    flags, stats = raster_cut_fill2(tb, ta, META)
    flags = flags.materialize()
    fin = ~(np.isnan(dem) | np.isnan(after))
    diff = dem - after
    want = _stats_dict(stats)
    assert want[1][0] == (fin & (diff > 0)).sum()
    assert want[-1][0] == (fin & (diff < 0)).sum()
    assert want[1][2] == pytest.approx(diff[fin & (diff > 0)].sum(), rel=1e-9)
    # features: per-category ring-signed area == category cell area
    fc = raster_cut_fill_features(flags, META, stats).to_pandas()
    assert set(fc["category"]) <= {-1, 0, 1}
    from opengxt_ray.core import geomops
    for _, r in fc.iterrows():
        fg = _wkb.decode([r["geom"]])
        area = sum(geomops.ring_area(ring) * (1 if shell else 1)
                   for ring, shell in fg.rings(0))
        assert area == pytest.approx(r["area"], rel=1e-9)
        assert r["count"] == int(round(r["area"]))


def test_cut_fill3_masks(dem):
    rs = np.random.RandomState(13)
    after = dem + rs.uniform(-5, 5, dem.shape)
    base = 50.0
    tb = _tiles_from_dense(dem, META)
    ta = _tiles_from_dense(after, META)
    res = raster_cut_fill3(tb, ta, META, base_height=base)
    fin = ~(np.isnan(dem) | np.isnan(after))
    db = _dense(res["flags_before"], META)
    da = _dense(res["flags_after"], META)
    np.testing.assert_array_equal(~np.isnan(db), fin & (dem > base))
    np.testing.assert_array_equal(~np.isnan(da), fin & (after > base))
    want = _stats_dict(res["stats"])
    diff = dem - after
    assert want[1][0] == (fin & (diff > 0)).sum()
    assert len(res["before_above"]) >= 1
    assert len(res["after_above"]) >= 1


def test_buffer_statistics_vs_brute(ray_session):
    from opengxt_ray.ops.pip import buffer_statistics

    rs = np.random.RandomState(21)
    px = rs.uniform(0, 40, 800)
    py = rs.uniform(0, 40, 800)
    pv = rs.uniform(0, 10, 800)
    pts = ray.data.from_arrow(pa.table({
        "lon": pa.array(px), "lat": pa.array(py), "v": pa.array(pv)}))
    cx = np.array([10.0, 25.0, 33.0])
    cy = np.array([12.0, 30.0, 8.0])
    centers = pa.table({
        "site": pa.array([0, 1, 2], pa.int64()),
        "geom": pa.array([_wkb.encode_point(a, b)
                          for a, b in zip(cx, cy)], pa.binary())})
    out = buffer_statistics(pts, centers, poly_key="site",
                            spec="Count.v,Sum.v,Avg.v", distance=6.0,
                            quadrant_segs=32).to_pandas() \
        .sort_values("site").reset_index(drop=True)
    # brute: 32-seg n-gon ~ circle; keep test points off the rim
    for s in range(3):
        d = np.hypot(px - cx[s], py - cy[s])
        sel = d <= 6.0 * np.cos(np.pi / (4 * 32))  # inscribed-safe
        selo = d <= 6.0  # circumscribed
        got_n = out.loc[s, "count_v"]
        assert sel.sum() <= got_n <= selo.sum()
        # exact check against the n-gon itself
        from opengxt_ray.core import geomops
        ring = geomops.circle_ring(cx[s], cy[s], 6.0, quadrant_segs=32)
        inside = geomops.points_in_ring(px, py, ring)
        assert got_n == inside.sum()
        assert out.loc[s, "sum_v"] == pytest.approx(pv[inside].sum(),
                                                    rel=1e-9)
        assert out.loc[s, "mean_v"] == pytest.approx(pv[inside].mean(),
                                                     rel=1e-9)


def test_buffer_statistics_zero_distance_requires_polygons(ray_session):
    from opengxt_ray.ops.pip import buffer_statistics

    pts = ray.data.from_arrow(pa.table({
        "lon": pa.array([1.0]), "lat": pa.array([1.0]),
        "v": pa.array([1.0])}))
    centers = pa.table({
        "site": pa.array([0], pa.int64()),
        "geom": pa.array([_wkb.encode_point(0.0, 0.0)], pa.binary())})
    with pytest.raises(ValueError, match="polygon"):
        buffer_statistics(pts, centers, poly_key="site", spec="Count.v")
