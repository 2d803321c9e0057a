"""PointsToLine vs a brute-force serial oracle.

Reference semantics: GT/operations/PointsToLineOperation.java:92-233 —
group by lineField (null groups skipped), sort ascending by sortField,
chain each feature's first coordinate with consecutive-duplicate
collapse, drop groups with <=1 coords (<3 when closing), closeLine ->
Polygon, `length` = geometry length.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import wkb as _wkb
from opengxt_ray.ops.lineops import points_to_line


def _mk_points(n=200, seed=3, ngroups=7, with_null=True, with_dups=True):
    rs = np.random.RandomState(seed)
    x = rs.uniform(-50, 50, n)
    y = rs.uniform(-30, 30, n)
    grp = rs.randint(0, ngroups, n).astype(np.float64)
    if with_null:
        grp[rs.rand(n) < 0.05] = np.nan
    sortv = rs.permutation(n).astype(np.int64)
    if with_dups:
        # force some consecutive duplicates after sort within a group
        order = np.argsort(sortv, kind="stable")
        for g in range(0, ngroups, 2):
            idx = order[grp[order] == g]
            if len(idx) >= 2:
                x[idx[1]] = x[idx[0]]
                y[idx[1]] = y[idx[0]]
    geom = [_wkb.encode_point(float(a), float(b)) for a, b in zip(x, y)]
    grp_arr = pa.array([None if np.isnan(g) else int(g) for g in grp],
                       pa.int64())
    return pa.table({"geom": pa.array(geom, pa.binary()),
                     "grp": grp_arr,
                     "sortv": pa.array(sortv)}), x, y, grp, sortv


def _oracle(x, y, grp, sortv, close=False):
    out = {}
    for g in sorted({int(v) for v in grp if not np.isnan(v)}):
        idx = [i for i in np.argsort(sortv, kind="stable")
               if not np.isnan(grp[i]) and int(grp[i]) == g]
        coords = []
        for i in idx:
            c = (x[i], y[i])
            if not coords or coords[-1] != c:
                coords.append(c)
        if len(coords) <= 1 or (close and len(coords) < 3):
            continue
        if close and coords[0] != coords[-1]:
            coords.append(coords[0])
        arr = np.array(coords)
        length = float(np.sum(np.hypot(np.diff(arr[:, 0]),
                                       np.diff(arr[:, 1]))))
        out[g] = (arr, length)
    return out


def test_points_to_line_open_vs_oracle(ray_session):
    tbl, x, y, grp, sortv = _mk_points()
    ds = ray.data.from_arrow(tbl)
    got = points_to_line(ds, line_field="grp", sort_field="sortv").take_all()
    want = _oracle(x, y, grp, sortv, close=False)
    assert {r["grp"] for r in got} == set(want)
    for r in got:
        arr, length = want[r["grp"]]
        fg = _wkb.decode([r["geom"]])
        assert fg.types[0] == 2  # LineString
        np.testing.assert_allclose(fg.geom_coords(0), arr, rtol=0, atol=0)
        assert r["length"] == pytest.approx(length, rel=1e-12)


def test_points_to_line_closed_polygon(ray_session):
    tbl, x, y, grp, sortv = _mk_points(seed=9, with_dups=False)
    ds = ray.data.from_arrow(tbl)
    got = points_to_line(ds, line_field="grp", sort_field="sortv",
                         close_line=True).take_all()
    want = _oracle(x, y, grp, sortv, close=True)
    assert {r["grp"] for r in got} == set(want)
    for r in got:
        arr, length = want[r["grp"]]
        fg = _wkb.decode([r["geom"]])
        assert fg.types[0] == 3  # Polygon
        ring = fg.geom_coords(0)
        np.testing.assert_allclose(ring, arr, rtol=0, atol=0)
        assert np.all(ring[0] == ring[-1])
        assert r["length"] == pytest.approx(length, rel=1e-12)


def test_points_to_line_small_groups_dropped(ray_session):
    # one group of 1 point, one group of 2 identical points -> both dropped
    geom = [_wkb.encode_point(1.0, 2.0), _wkb.encode_point(3.0, 4.0),
            _wkb.encode_point(3.0, 4.0), _wkb.encode_point(5.0, 6.0),
            _wkb.encode_point(7.0, 8.0)]
    tbl = pa.table({"geom": pa.array(geom, pa.binary()),
                    "grp": pa.array([0, 1, 1, 2, 2], pa.int64()),
                    "sortv": pa.array([0, 0, 1, 0, 1], pa.int64())})
    got = points_to_line(ray.data.from_arrow(tbl), line_field="grp",
                         sort_field="sortv").take_all()
    assert {r["grp"] for r in got} == {2}


def test_points_to_line_no_group_field(ray_session):
    geom = [_wkb.encode_point(0.0, 0.0), _wkb.encode_point(3.0, 4.0),
            _wkb.encode_point(3.0, 8.0)]
    tbl = pa.table({"geom": pa.array(geom, pa.binary()),
                    "sortv": pa.array([2, 0, 1], pa.int64())})
    got = points_to_line(ray.data.from_arrow(tbl),
                         sort_field="sortv").take_all()
    assert len(got) == 1
    fg = _wkb.decode([got[0]["geom"]])
    np.testing.assert_allclose(fg.geom_coords(0),
                               [[3, 4], [3, 8], [0, 0]])
    assert got[0]["length"] == pytest.approx(4 + np.sqrt(73))


def test_points_to_line_bezier_and_geodesic(ray_session):
    geom = [_wkb.encode_point(0.0, 0.0), _wkb.encode_point(10.0, 0.0),
            _wkb.encode_point(10.0, 10.0)]
    tbl = pa.table({"geom": pa.array(geom, pa.binary()),
                    "sortv": pa.array([0, 1, 2], pa.int64())})
    bez = points_to_line(ray.data.from_arrow(tbl), sort_field="sortv",
                         use_bezier=True).take_all()
    fg = _wkb.decode([bez[0]["geom"]])
    c = fg.geom_coords(0)
    # 2 segments x 24 samples, starts at p0, bows off the straight chain
    assert len(c) == 48
    np.testing.assert_allclose(c[0], [0, 0])
    assert np.max(np.abs(c[:24, 1])) > 1.0  # control point lifts the curve

    geo = points_to_line(ray.data.from_arrow(tbl), sort_field="sortv",
                         geodesic=True).take_all()
    fg2 = _wkb.decode([geo[0]["geom"]])
    g = fg2.geom_coords(0)
    assert len(g) > 100
    np.testing.assert_allclose(g[0], [0, 0])
    np.testing.assert_allclose(g[-1], [10, 10])
    # equatorial segment stays on the equator (great circle)
    eq = g[(g[:, 0] > 0.1) & (g[:, 0] < 9.9) & (np.abs(g[:, 1]) < 1e-9)]
    assert len(eq) > 50
