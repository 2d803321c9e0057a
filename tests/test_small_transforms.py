"""Small-transform sweep oracles (judge round-1 #10)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.ops.aggregate import (collect_features,
                                       singlepart_to_multipart)
from opengxt_ray.stages.transforms import (feature_to_line,
                                           feature_to_polygon,
                                           make_polygons_along_lines,
                                           make_random_points_per_features,
                                           make_split_line_at_points,
                                           maximum_inscribed_rectangle)


def test_feature_to_line_and_polygon():
    sq = _wkb.encode_polygon(np.array([[0, 0], [4, 0], [4, 4], [0, 4]],
                                      float))
    line_closed = _wkb.encode_linestring(
        np.array([[0, 0], [2, 0], [2, 2], [0, 0]], float))
    pt = _wkb.encode_point(1.0, 1.0)
    batch = pa.table({"id": pa.array([1, 2, 3]),
                      "geom": pa.array([sq, line_closed, pt], pa.binary())})
    lines = feature_to_line(batch)
    assert lines["id"].to_pylist() == [1, 2]
    fg = _wkb.decode(lines["geom"].to_pylist())
    assert geomops.lengths(fg)[0] == pytest.approx(16.0)

    polys = feature_to_polygon(batch)
    assert polys["id"].to_pylist() == [1, 2]
    fgp = _wkb.decode(polys["geom"].to_pylist())
    assert geomops.areas(fgp)[0] == pytest.approx(16.0)
    assert geomops.areas(fgp)[1] == pytest.approx(2.0)


def test_maximum_inscribed_rectangle_inside():
    # L-shaped polygon: the MIR must be fully inside and reasonably big
    L = _wkb.encode_polygon(np.array(
        [[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float))
    batch = pa.table({"geom": pa.array([L], pa.binary())})
    out = maximum_inscribed_rectangle(batch, rotate=False)
    fg = _wkb.decode(out["geom"].to_pylist())
    rect = fg.geom_coords(0)
    src = _wkb.decode([L])
    assert geomops.points_in_geom(rect[:, 0], rect[:, 1], src, 0).all()
    area = abs(geomops.ring_area(np.vstack([rect, rect[:1]])
                                 if not np.array_equal(rect[0], rect[-1])
                                 else rect))
    assert area >= 0.6 * 40.0   # true MIR is 40 (10x4); grid DP gets close


def test_split_line_at_points():
    line = _wkb.encode_linestring(np.array([[0, 0], [10, 0]], float))
    batch = pa.table({"lid": pa.array([5]),
                      "geom": pa.array([line], pa.binary())})
    fn = make_split_line_at_points(np.array([[3.0, 0.0], [7.0, 0.001]]),
                                   tolerance=0.01)
    out = fn(batch)
    assert len(out) == 3
    fg = _wkb.decode(out["geom"].to_pylist())
    lens = sorted(geomops.lengths(fg))
    assert lens == pytest.approx([3.0, 3.0, 4.0], abs=1e-6)
    # point beyond tolerance → no split
    fn2 = make_split_line_at_points(np.array([[5.0, 2.0]]), tolerance=0.5)
    out2 = fn2(batch)
    assert len(out2) == 1


def test_polygons_along_lines():
    line = _wkb.encode_linestring(np.array([[0, 0], [10, 0]], float))
    batch = pa.table({"geom": pa.array([line], pa.binary())})
    fn = make_polygons_along_lines(distance=4.0, width=1.0)
    out = fn(batch)
    fg = _wkb.decode(out["geom"].to_pylist())
    areas = geomops.areas(fg)
    # pieces 0-4, 4-8, 8-10 → flat-cap rects 4x2, 4x2, 2x2
    assert sorted(np.round(areas, 9)) == pytest.approx([4.0, 8.0, 8.0])
    # merge_factor: trailing 2-long piece merges into the previous
    fn2 = make_polygons_along_lines(distance=4.0, width=1.0,
                                    merge_factor=0.6)
    out2 = fn2(batch)
    areas2 = geomops.areas(_wkb.decode(out2["geom"].to_pylist()))
    assert sorted(np.round(areas2, 9)) == pytest.approx([8.0, 12.0])


def test_random_points_per_features_deterministic():
    sq1 = _wkb.encode_polygon(np.array([[0, 0], [4, 0], [4, 4], [0, 4]],
                                       float))
    sq2 = _wkb.encode_polygon(np.array([[10, 10], [14, 10], [14, 18],
                                        [10, 18]], float))
    batch = pa.table({"pid": pa.array([1, 2]),
                      "geom": pa.array([sq1, sq2], pa.binary())})
    fn = make_random_points_per_features(count=20)
    out1 = fn(batch)
    out2 = fn(batch)  # deterministic
    assert out1.equals(out2)
    assert len(out1) == 40
    fg = _wkb.decode(out1["geom"].to_pylist())
    src = _wkb.decode([sq1, sq2])
    for i in range(len(out1)):
        p = fg.geom_coords(i)[0]
        gi = 0 if out1["pid"][i].as_py() == 1 else 1
        assert geomops.points_in_geom(p[:1] * 0 + p[0],
                                      np.array([p[1]]), src, gi)[0]


def test_singlepart_to_multipart_and_collect():
    sq1 = _wkb.encode_polygon(np.array([[0, 0], [1, 0], [1, 1], [0, 1]],
                                       float))
    sq2 = _wkb.encode_polygon(np.array([[2, 0], [3, 0], [3, 1], [2, 1]],
                                       float))
    sq3 = _wkb.encode_polygon(np.array([[5, 5], [6, 5], [6, 6], [5, 6]],
                                       float))
    ds = ray.data.from_arrow(pa.table({
        "grp": pa.array([1, 1, 2]),
        "geom": pa.array([sq1, sq2, sq3], pa.binary())}))
    out = singlepart_to_multipart(ds, group_col="grp").take_all()
    assert len(out) == 2
    by_grp = {r["grp"]: r["geom"] for r in out}
    fg = _wkb.decode([by_grp[1]])
    assert geomops.areas(fg)[0] == pytest.approx(2.0)   # two unit squares
    tab = collect_features(ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2, 3])})))
    assert isinstance(tab, pa.Table) and tab.num_rows == 3


def test_force_dimension_roundtrip():
    from opengxt_ray.stages.transforms import make_force_dimension

    pt = _wkb.encode_point(3.0, 4.0)
    line = _wkb.encode_linestring(np.array([[0, 0], [5, 5], [9, 2]], float))
    donut = _wkb.encode_polygon(
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float),
        [np.array([[3, 3], [3, 7], [7, 7], [7, 3]], float)])
    batch = pa.table({"id": pa.array([1, 2, 3]),
                      "geom": pa.array([pt, line, donut], pa.binary())})
    up = make_force_dimension(3, z=7.5)(batch)
    wkbs = up["geom"].to_pylist()
    # ISO Z type codes present
    import struct as _st
    assert _st.unpack("<I", wkbs[0][1:5])[0] == 1001
    assert _st.unpack("<I", wkbs[1][1:5])[0] == 1002
    assert _st.unpack("<I", wkbs[2][1:5])[0] == 1003
    # z value stored
    assert _st.unpack("<d", wkbs[0][21:29])[0] == 7.5
    # decoder strips z: geometry identical after the round trip
    down = make_force_dimension(2)(up)
    fg0 = _wkb.decode([pt, line, donut])
    fg1 = _wkb.decode(down["geom"].to_pylist())
    for i in range(3):
        np.testing.assert_array_equal(fg0.geom_coords(i), fg1.geom_coords(i))
    areas0 = geomops.areas(fg0)
    areas1 = geomops.areas(fg1)
    np.testing.assert_allclose(areas0, areas1)
