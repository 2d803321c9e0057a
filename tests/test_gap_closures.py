"""Round-2 registry gap closures: CircularBinning, LocalSABinning/
Overlay, RasterExtraction, ClipWithGeometry, WKT decode."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import geomops, wkb as _wkb


def test_circular_binning_vs_brute():
    from opengxt_ray.ops.binning import circular_binning

    rs = np.random.RandomState(6)
    x = rs.uniform(0, 20, 600)
    y = rs.uniform(0, 20, 600)
    w = rs.uniform(0, 5, 600)
    ds = ray.data.from_arrow(pa.table({
        "lon": pa.array(x), "lat": pa.array(y), "w": pa.array(w)}))
    out = circular_binning(ds, (0.0, 0.0, 20.0, 20.0), radius=2.0,
                           weight_col="w").take_all()
    got = {r["cell_id"]: (r["val"], r["count"]) for r in out}
    # brute
    col = np.floor(x / 4.0).astype(np.int64)
    row = np.floor(y / 4.0).astype(np.int64)
    cx = (col + 0.5) * 4.0
    cy = (row + 0.5) * 4.0
    ins = (x - cx) ** 2 + (y - cy) ** 2 <= 4.0
    want = {}
    for i in np.nonzero(ins)[0]:
        k = int(row[i]) * (1 << 31) + int(col[i])
        v, c = want.get(k, (0.0, 0.0))
        want[k] = (v + w[i], c + 1)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0], rel=1e-12)
        assert got[k][1] == want[k][1]


def test_local_sa_binning_matches_manual_compose():
    from opengxt_ray.ops.binning import hex_binning
    from opengxt_ray.ops.hotspot import local_morans_i, local_sa_binning

    rs = np.random.RandomState(9)
    x = rs.uniform(0, 30, 800)
    y = rs.uniform(0, 30, 800)
    w = rs.uniform(0, 3, 800)
    ds = ray.data.from_arrow(pa.table({
        "lon": pa.array(x), "lat": pa.array(y), "w": pa.array(w)}))
    got = local_sa_binning(ds, size=3.0, weight_col="w",
                           method="moran", band=6.0).take_all()
    bins = hex_binning(ds, size=3.0, weight_col="w").map_batches(
        lambda b: pa.table({
            "id": ((b["q"].to_numpy() + (1 << 30)) * np.int64(1 << 32)
                   + (b["r"].to_numpy() + (1 << 30))),
            "lon": b["cx"], "lat": b["cy"], "val": b["val"]}),
        batch_format="pyarrow")
    want = local_morans_i(bins, "val", id_col="id", band=6.0).take_all()
    gm = {r["id"]: r for r in got}
    wm = {r["id"]: r for r in want}
    assert set(gm) == set(wm) and len(gm) > 10
    for k in wm:
        assert gm[k]["LMiZScore"] == wm[k]["LMiZScore"]


def test_local_sa_overlay_runs():
    from opengxt_ray.ops.hotspot import local_sa_overlay

    rs = np.random.RandomState(4)
    x = rs.uniform(0, 40, 1000)
    y = rs.uniform(0, 40, 1000)
    pts = ray.data.from_arrow(pa.table({
        "lon": pa.array(x), "lat": pa.array(y)}))
    polys = []
    keys = []
    k = 0
    for r0 in range(4):
        for c0 in range(4):
            polys.append(_wkb.encode_polygon(np.array(
                [[c0 * 10, r0 * 10], [c0 * 10 + 10, r0 * 10],
                 [c0 * 10 + 10, r0 * 10 + 10], [c0 * 10, r0 * 10 + 10]],
                float)))
            keys.append(k)
            k += 1
    pt = pa.table({"zid": pa.array(keys, pa.int64()),
                   "geom": pa.array(polys, pa.binary())})
    out = local_sa_overlay(pts, pt, poly_key="zid", method="moran",
                           band=15.0).take_all()
    assert len(out) == 16
    assert all(np.isfinite(r["LMiZScore"]) for r in out)


def test_raster_extraction_keeps_matching():
    from opengxt_ray.raster.algebra import raster_extraction

    tiles = ray.data.from_arrow(pa.table({
        "tx": pa.array([0], pa.int32()), "ty": pa.array([0], pa.int32()),
        "data": pa.array([np.arange(16.0).tobytes()], pa.binary())}))
    out = raster_extraction(tiles, lambda a: a >= 8.0).take_all()
    arr = np.frombuffer(out[0]["data"], np.float64)
    assert np.isnan(arr[:8]).all() and (arr[8:] == np.arange(8.0) + 8).all()


def test_clip_with_geometry():
    from opengxt_ray.ops.overlay import clip_with_geometry

    tri = _wkb.encode_polygon(np.array([[0, 0], [10, 0], [5, 10]], float))
    pts = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2]),
        "geom": pa.array([_wkb.encode_point(5.0, 2.0),
                          _wkb.encode_point(50.0, 50.0)], pa.binary())}))
    out = clip_with_geometry(pts, tri).take_all()
    assert [r["id"] for r in out] == [1]
