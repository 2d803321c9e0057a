"""Overlay clip/erase/merge tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.ops import overlay


def _overlay_square():
    return pa.table({
        "zid": pa.array([1]),
        "geom": pa.array([_wkb.encode_polygon(
            np.array([[0, 0], [10, 0], [10, 10], [0, 10]]))], pa.binary()),
    })


def test_clip_points():
    pts = pa.table({
        "pid": pa.array([0, 1, 2]),
        "geom": pa.array([_wkb.encode_point(5, 5), _wkb.encode_point(15, 5),
                          _wkb.encode_point(-1, -1)], pa.binary()),
    })
    ds = ray.data.from_arrow(pts)
    out = overlay.clip_with_features(ds, _overlay_square()).to_pandas()
    assert out.pid.tolist() == [0]
    er = overlay.erase_features(ds, _overlay_square()).to_pandas()
    assert sorted(er.pid.tolist()) == [1, 2]


def test_clip_lines_exact_length():
    lines = pa.table({
        "lid": pa.array([1]),
        "geom": pa.array([_wkb.encode_linestring(
            np.array([[-5, 5], [15, 5]]))], pa.binary()),
    })
    ds = ray.data.from_arrow(lines)
    out = overlay.clip_with_features(ds, _overlay_square()).to_pandas()
    fg = _wkb.decode(out.geom.tolist())
    assert geomops.lengths(fg)[0] == pytest.approx(10.0, abs=1e-9)
    er = overlay.erase_features(ds, _overlay_square()).to_pandas()
    fg = _wkb.decode(er.geom.tolist())
    assert geomops.lengths(fg)[0] == pytest.approx(10.0, abs=1e-9)  # 5+5


def test_clip_polygon_convex():
    polys = pa.table({
        "pid": pa.array([1]),
        "geom": pa.array([_wkb.encode_polygon(
            np.array([[5, 5], [15, 5], [15, 15], [5, 15]]))], pa.binary()),
    })
    ds = ray.data.from_arrow(polys)
    out = overlay.clip_with_features(ds, _overlay_square()).to_pandas()
    fg = _wkb.decode(out.geom.tolist())
    assert geomops.areas(fg)[0] == pytest.approx(25.0, abs=1e-9)


def test_polygon_erase_exact():
    polys = pa.table({
        "pid": pa.array([1]),
        "geom": pa.array([_wkb.encode_polygon(
            np.array([[5, 5], [15, 5], [15, 15], [5, 15]]))], pa.binary()),
    })
    ds = ray.data.from_arrow(polys)
    out = overlay.erase_features(ds, _overlay_square()).to_pandas()
    fg = _wkb.decode(out.geom.tolist())
    assert geomops.areas(fg)[0] == pytest.approx(75.0, abs=1e-9)
    # predicate_only path keeps whole disjoint polygons
    far = pa.table({
        "pid": pa.array([1, 2]),
        "geom": pa.array([
            _wkb.encode_polygon(np.array([[50, 50], [60, 50], [60, 60], [50, 60]])),
            _wkb.encode_polygon(np.array([[5, 5], [8, 5], [8, 8], [5, 8]])),
        ], pa.binary()),
    })
    ds2 = ray.data.from_arrow(far)
    out = overlay.erase_features(ds2, _overlay_square(),
                                 predicate_only=True).to_pandas()
    assert out.pid.tolist() == [1]


def test_nonconvex_overlay_clip():
    """Concave overlay (L-shape) clipping a polygon — GH path."""
    L = pa.table({"zid": pa.array([1]), "geom": pa.array(
        [_wkb.encode_polygon(np.array(
            [[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]]))],
        pa.binary())})
    sq = pa.table({"pid": pa.array([1]), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[2, 2], [8, 2], [8, 8], [2, 8]]))],
        pa.binary())})
    ds = ray.data.from_arrow(sq)
    out = overlay.clip_with_features(ds, L).to_pandas()
    fg = _wkb.decode(out.geom.tolist())
    # sq∩L = 36 − 16 = 20
    assert geomops.areas(fg).sum() == pytest.approx(20.0, abs=1e-9)
    # erase: sq − L = 16
    er = overlay.erase_features(ds, L).to_pandas()
    fg = _wkb.decode(er.geom.tolist())
    assert geomops.areas(fg).sum() == pytest.approx(16.0, abs=1e-9)
    # hole case: big square minus small interior square
    big = pa.table({"pid": pa.array([1]), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[0, 0], [20, 0], [20, 20], [0, 20]]))],
        pa.binary())})
    small = pa.table({"zid": pa.array([1]), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[5, 5], [9, 5], [9, 9], [5, 9]]))],
        pa.binary())})
    er2 = overlay.erase_features(ray.data.from_arrow(big), small).to_pandas()
    fg = _wkb.decode(er2.geom.tolist())
    assert geomops.areas(fg)[0] == pytest.approx(400.0 - 16.0, abs=1e-9)
    # the hole is real
    assert not geomops.points_in_geom(np.array([7.0]), np.array([7.0]), fg, 0)[0]


def test_merge_features():
    a = ray.data.from_arrow(pa.table({"x": pa.array([1, 2]),
                                      "name": pa.array(["a", "b"])}))
    b = ray.data.from_arrow(pa.table({"x": pa.array([3]),
                                      "extra": pa.array([9.5])}))
    m = overlay.merge_features(a, b).to_pandas()
    assert len(m) == 3
    assert set(m.columns) == {"x", "name", "extra"}
    assert m.extra.isna().sum() == 2


def test_histogram_and_sessions():
    from opengxt_ray.ops.histogram import histogram, session_stats

    ds = ray.data.from_arrow(pa.table({"v": pa.array(
        [1.0, 5.0, 10.0, 15.0, 20.0, 25.0, 99.0])}))
    h = histogram(ds, "v", [0.0, 10.0, 20.0, 30.0])
    assert h["count"].to_pylist() == [2, 2, 2]  # 99 out of range
    ts = np.array(["2025-01-01T00:00", "2025-01-01T00:10",
                   "2025-01-01T02:00", "2025-01-01T02:05"],
                  dtype="datetime64[us]")
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([7, 7, 7, 7]),
        "ts": pa.array(ts, pa.timestamp("us")),
    }))
    ss = session_stats(ev).to_pandas().sort_values("session_idx")
    assert len(ss) == 2
    assert ss.n_events.tolist() == [2, 2]
    assert ss.duration_sec.tolist() == [600.0, 300.0]


def test_eliminate_slivers():
    from opengxt_ray.ops.overlay import eliminate

    # 3-column strip with a thin middle sliver
    polys, fids = [], []
    polys.append(_wkb.encode_polygon(np.array([[0, 0], [1, 0], [1, 1], [0, 1]])))
    fids.append(1)
    polys.append(_wkb.encode_polygon(np.array([[1, 0], [1.1, 0], [1.1, 1], [1, 1]])))
    fids.append(2)  # sliver
    polys.append(_wkb.encode_polygon(np.array([[1.1, 0], [2.6, 0], [2.6, 1], [1.1, 1]])))
    fids.append(3)
    ds = ray.data.from_arrow(pa.table({"fid": pa.array(fids),
                                       "geom": pa.array(polys, pa.binary())}))
    out = eliminate(ds, fid_col="fid", min_area=0.5).to_pandas()
    fg = _wkb.decode(out.geom.tolist())
    assert len(out) == 2
    assert 2 not in out.fid.tolist()  # sliver absorbed
    assert geomops.areas(fg).sum() == pytest.approx(2.6, abs=1e-9)


def test_intersect_identity_update():
    from opengxt_ray.ops.overlay import (identity_features,
                                         intersect_features, update_features)

    inp = pa.table({"pid": pa.array([1]), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[0, 0], [10, 0], [10, 10], [0, 10]]))],
        pa.binary())})
    over = pa.table({"zid": pa.array([7], pa.int64()), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[5, 5], [15, 5], [15, 15], [5, 15]]))],
        pa.binary())})
    ds = ray.data.from_arrow(inp)
    it = intersect_features(ds, over).to_pandas()
    fg = _wkb.decode(it.geom.tolist())
    assert len(it) == 1 and it.zid.iloc[0] == 7
    assert geomops.areas(fg)[0] == pytest.approx(25.0, abs=1e-9)
    ident = identity_features(ds, over).to_pandas()
    fg = _wkb.decode(ident.geom.tolist())
    assert geomops.areas(fg).sum() == pytest.approx(100.0, abs=1e-9)
    assert ident.zid.isna().sum() == 1  # the outside piece
    upd = update_features(ds, over).to_pandas()
    fg = _wkb.decode(upd.geom.tolist())
    assert geomops.areas(fg).sum() == pytest.approx(75.0 + 100.0, abs=1e-9)


def test_erase_overlay_hole_readded():
    """ADVICE round-1 #4: input inside an overlay HOLE must survive an
    erase (the hole is not part of the overlay)."""
    from opengxt_ray.ops.overlay import erase_features

    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[3, 3], [3, 7], [7, 7], [7, 3]], float)
    ov = pa.table({"geom": pa.array([_wkb.encode_polygon(shell, [hole])],
                                    pa.binary())})
    inp = pa.table({"id": pa.array([1]), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[2, 2], [8, 2], [8, 8], [2, 8]],
                                      float))], pa.binary())})
    out = erase_features(ray.data.from_arrow(inp), ov).to_pandas()
    fg = _wkb.decode(out.geom.tolist())
    assert geomops.areas(fg).sum() == pytest.approx(16.0, abs=1e-9)

    # straddling input: the part outside the shell survives too
    inp2 = pa.table({"id": pa.array([1]), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[8, 4], [12, 4], [12, 6], [8, 6]],
                                      float))], pa.binary())})
    out2 = erase_features(ray.data.from_arrow(inp2), ov).to_pandas()
    fg2 = _wkb.decode(out2.geom.tolist())
    assert geomops.areas(fg2).sum() == pytest.approx(4.0, abs=1e-9)


def test_union_overlay_two_layers():
    """UnionProcess: A∩B pieces carry both attrs, A−B carries A only,
    B−A carries B only; areas partition |A ∪ B|."""
    from opengxt_ray.ops.overlay import union_features

    at = pa.table({"pid": pa.array([1]), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[0, 0], [10, 0], [10, 10], [0, 10]]))],
        pa.binary())})
    bt = pa.table({"zid": pa.array([7], pa.int64()), "geom": pa.array(
        [_wkb.encode_polygon(np.array([[5, 5], [15, 5], [15, 15], [5, 15]]))],
        pa.binary())})
    out = union_features(ray.data.from_arrow(at), bt, at,
                         ray.data.from_arrow(bt),
                         right_cols=["zid"]).to_pandas()
    fg = _wkb.decode(out.geom.tolist())
    areas = geomops.areas(fg)
    assert areas.sum() == pytest.approx(100.0 + 100.0 - 25.0, abs=1e-9)
    both = out[out.pid.notna() & out.zid.notna()]
    a_only = out[out.pid.notna() & out.zid.isna()]
    b_only = out[out.pid.isna() & out.zid.notna()]
    assert len(both) == 1 and len(a_only) == 1 and len(b_only) == 1
    assert geomops.areas(_wkb.decode(both.geom.tolist()))[0] == \
        pytest.approx(25.0, abs=1e-9)
    assert geomops.areas(_wkb.decode(a_only.geom.tolist()))[0] == \
        pytest.approx(75.0, abs=1e-9)
    assert geomops.areas(_wkb.decode(b_only.geom.tolist()))[0] == \
        pytest.approx(75.0, abs=1e-9)
