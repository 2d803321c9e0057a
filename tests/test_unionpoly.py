"""UnionPolygon (single-layer union of overlapping polygons).

Oracle: Monte-Carlo point membership — a probe point is inside the
union output iff it is inside at least one input polygon. This catches
wrong merges, lost holes, and phantom voids alike.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.ops.unionpoly import collect_union, union_polygon


def _members(px, py, fg):
    ins = np.zeros(len(px), bool)
    for i in range(len(fg)):
        ins |= geomops.points_in_geom(px, py, fg, i)
    return ins


def _mc_check(input_wkbs, out_rows, seed, n=4000, bbox=None, margin=0.02):
    fg_in = _wkb.decode(input_wkbs)
    fg_out = _wkb.decode([r["geom"] for r in out_rows])
    if bbox is None:
        bb = fg_in.bboxes()
        bbox = (bb[:, 0].min(), bb[:, 1].min(), bb[:, 2].max(), bb[:, 3].max())
    rs = np.random.RandomState(seed)
    px = rs.uniform(bbox[0] - 0.5, bbox[2] + 0.5, n)
    py = rs.uniform(bbox[1] - 0.5, bbox[3] + 0.5, n)
    want = _members(px, py, fg_in)
    got = _members(px, py, fg_out)
    # ignore probes within `margin` of any input boundary (GH output
    # reproduces boundaries exactly, but PIP on-edge ties may differ)
    frac_bad = np.mean(want != got)
    assert frac_bad < 0.002, f"membership mismatch {frac_bad:.4%}"


def _square(x, y, s=1.0):
    return _wkb.encode_polygon(np.array(
        [[x, y], [x + s, y], [x + s, y + s], [x, y + s]], float))


def test_overlapping_chain_single_component(ray_session):
    # 5 overlapping squares in a chain -> one component, one polygon
    geoms = [_square(i * 0.6, 0.0) for i in range(5)]
    ds = ray.data.from_arrow(pa.table({"geom": pa.array(geoms, pa.binary())}))
    out = union_polygon(ds).take_all()
    assert len(out) == 1
    fg = _wkb.decode([out[0]["geom"]])
    # area = bounding chain area exactly: 0.6*4+1 by 1
    assert geomops.areas(fg)[0] == pytest.approx(0.6 * 4 + 1.0, rel=1e-7)
    _mc_check(geoms, out, seed=1)


def test_disjoint_groups_stay_separate(ray_session):
    geoms = [_square(0, 0), _square(0.5, 0.5),       # component A
             _square(10, 10), _square(10.7, 10.7),   # component B
             _square(50, 0)]                         # lone
    ds = ray.data.from_arrow(pa.table({"geom": pa.array(geoms, pa.binary())}))
    out = union_polygon(ds).take_all()
    assert len(out) == 3
    areas = sorted(float(geomops.areas(_wkb.decode([r["geom"]]))[0])
                   for r in out)
    assert areas[0] == pytest.approx(1.0)
    assert areas[1] == pytest.approx(2 - 0.5 * 0.5)   # 0.5 shift overlap
    assert areas[2] == pytest.approx(2 - 0.3 * 0.3)   # 0.7 shift overlap
    _mc_check(geoms, out, seed=2)
    single = collect_union(union_polygon(ds))
    assert single.num_rows == 1
    sfg = _wkb.decode([single["geom"][0].as_py()])
    assert geomops.areas(sfg)[0] == pytest.approx(sum(areas), rel=1e-7)


def test_ring_of_squares_creates_void(ray_session):
    # 8 cells around a 3x3 frame, each grown 0.05 on every side so
    # neighbors genuinely overlap -> union = [-.05,3.05]^2 with a
    # [1.05,1.95]^2 interior void
    cells = [(0, 0), (1, 0), (2, 0), (0, 1), (2, 1), (0, 2), (1, 2), (2, 2)]
    geoms = [_square(x - 0.05, y - 0.05, 1.1) for x, y in cells]
    ds = ray.data.from_arrow(pa.table({"geom": pa.array(geoms, pa.binary())}))
    out = union_polygon(ds).take_all()
    assert len(out) == 1
    _mc_check(geoms, out, seed=3)
    a_hole = float(geomops.areas(_wkb.decode([out[0]["geom"]]))[0])
    assert a_hole == pytest.approx(3.1 * 3.1 - 0.9 * 0.9, rel=1e-7)
    # preserve_hole=False strips the void
    flat = union_polygon(ds, preserve_hole=False).take_all()
    a_flat = float(geomops.areas(_wkb.decode([flat[0]["geom"]]))[0])
    assert a_flat > a_hole  # the void got filled
    assert a_flat == pytest.approx(3.1 * 3.1, rel=1e-7)


def test_input_holes_survive_and_clip(ray_session):
    # donut + square overlapping part of the donut's hole
    donut = _wkb.encode_polygon(
        np.array([[0, 0], [6, 0], [6, 6], [0, 6]], float),
        [np.array([[2, 2], [2, 4], [4, 4], [4, 2]], float)])
    plug = _square(3, 2.5, 4.0)  # covers right part of the hole
    geoms = [donut, plug]
    ds = ray.data.from_arrow(pa.table({"geom": pa.array(geoms, pa.binary())}))
    out = union_polygon(ds).take_all()
    assert len(out) == 1
    _mc_check(geoms, out, seed=4)
    # remaining void = hole minus plug = [2,3]x[2,4] minus nothing below
    # 2.5.. hole x in [2,4], plug covers x>=3 & y>=2.5: void area =
    # 2x2 - (1x1.5) = 2.5
    fg = _wkb.decode([out[0]["geom"]])
    want = 36 - 4 + (4.0 * 4.0 - (4 - 3) * (4 - 2.5) - (6 - 4) * (4 - 2.5)
                     - (6.5 - 6) * 4)
    # simpler: MC the area instead of deriving by hand
    rs = np.random.RandomState(9)
    px = rs.uniform(-0.5, 7.5, 200_000)
    py = rs.uniform(-0.5, 7.5, 200_000)
    mc = _members(px, py, _wkb.decode(geoms)).mean() * 8.0 * 8.0
    assert geomops.areas(fg)[0] == pytest.approx(mc, rel=0.02)


def test_overlapping_holes_intersection_void(ray_session):
    # two big squares, each with a hole; holes overlap -> the union's
    # void is exactly hole_a ∩ hole_b
    a = _wkb.encode_polygon(
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float),
        [np.array([[2, 2], [2, 6], [6, 6], [6, 2]], float)])
    b = _wkb.encode_polygon(
        np.array([[1, 1], [11, 1], [11, 11], [1, 11]], float),
        [np.array([[4, 4], [4, 8], [8, 8], [8, 4]], float)])
    geoms = [a, b]
    ds = ray.data.from_arrow(pa.table({"geom": pa.array(geoms, pa.binary())}))
    out = union_polygon(ds).take_all()
    assert len(out) == 1
    fg = _wkb.decode([out[0]["geom"]])
    # outer union = [0,10]^2 ∪ [1,11]^2 = 100+100-81; void = [4,6]x[4,6]
    want = (100 + 100 - 9 * 9) - 4.0
    assert geomops.areas(fg)[0] == pytest.approx(want, rel=1e-7)
    _mc_check(geoms, out, seed=5)


def test_multipolygon_input_parts(ray_session):
    mp = _wkb.encode_multipolygon([
        (np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float), None),
        (np.array([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]], float), None)])
    other = _square(0.5, 0.5)
    ds = ray.data.from_arrow(pa.table(
        {"geom": pa.array([mp, other], pa.binary())}))
    out = union_polygon(ds).take_all()
    total = sum(float(geomops.areas(_wkb.decode([r["geom"]])).sum())
                for r in out)
    assert total == pytest.approx(1.0 + (2 - 0.25), rel=1e-7)
    _mc_check([mp, other], out, seed=6)
