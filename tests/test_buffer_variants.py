"""Buffer variants (judge round-1 #9) — area-convergence oracles."""

import numpy as np
import pyarrow as pa
import pytest

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.stages.transforms import (make_single_sided_buffer,
                                           make_variable_buffer,
                                           make_wedge_buffer)


def _area(table):
    return geomops.areas(_wkb.decode(table["geom"].to_pylist()))


def test_single_sided_buffer_straight_line():
    line = _wkb.encode_linestring(np.array([[0, 0], [10, 0]], float))
    batch = pa.table({"geom": pa.array([line], pa.binary())})
    left = make_single_sided_buffer(2.0)(batch)
    a = _area(left)
    assert a[0] == pytest.approx(20.0, abs=1e-9)
    fg = _wkb.decode(left["geom"].to_pylist())
    pts = fg.geom_coords(0)
    assert pts[:, 1].min() >= -1e-12        # left side of west→east = north
    right = make_single_sided_buffer(-2.0)(batch)
    fgr = _wkb.decode(right["geom"].to_pylist())
    assert fgr.geom_coords(0)[:, 1].max() <= 1e-12
    assert abs(_area(right)[0]) == pytest.approx(20.0, abs=1e-9)


def test_single_sided_buffer_bent_line_area():
    line = _wkb.encode_linestring(
        np.array([[0, 0], [10, 0], [10, 10]], float))
    batch = pa.table({"geom": pa.array([line], pa.binary())})
    out = make_single_sided_buffer(1.0)(batch)
    # left side of the L (inner corner): union of the two side strips
    # = 10 + 10 − 1 (the mitered offset collapses the corner square)
    assert abs(_area(out)[0]) == pytest.approx(19.0, abs=1e-9)


def test_variable_buffer_area_bounds():
    line = _wkb.encode_linestring(np.array([[0, 0], [20, 0]], float))
    batch = pa.table({"geom": pa.array([line], pa.binary())})
    out = make_variable_buffer(1.0, 3.0, quadrant_segs=16)(batch)
    a = abs(_area(out)[0])
    # trapezoid body 2·20·(1+3)/2 = 80 plus two half-disks (π/2 + 9π/2)
    want = 80.0 + np.pi / 2 * (1.0 ** 2 + 3.0 ** 2)
    assert a == pytest.approx(want, rel=0.02)   # n-gon arc under-shoot


def test_wedge_buffer_sector_area():
    pt = _wkb.encode_point(5.0, 5.0)
    batch = pa.table({"az": pa.array([0.0]), "geom": pa.array([pt],
                                                             pa.binary())})
    out = make_wedge_buffer(azimuth="az", wedge_angle=90.0,
                            inner_radius=0.0, outer_radius=4.0,
                            segs=96)(batch)
    a = abs(_area(out)[0])
    assert a == pytest.approx(np.pi * 16.0 / 4.0, rel=0.01)
    fg = _wkb.decode(out["geom"].to_pylist())
    pts = fg.geom_coords(0)
    # azimuth 0 = north wedge: all arc points above the center
    assert pts[:, 1].max() > 8.9 and pts[:, 1].min() >= 5.0 - 1e-9
    # annulus sector
    out2 = make_wedge_buffer(azimuth=90.0, wedge_angle=60.0,
                             inner_radius=2.0, outer_radius=4.0,
                             segs=96)(batch)
    a2 = abs(_area(out2)[0])
    assert a2 == pytest.approx(np.pi * (16.0 - 4.0) / 6.0, rel=0.01)
    # full ring
    out3 = make_wedge_buffer(azimuth=0.0, wedge_angle=360.0,
                             inner_radius=2.0, outer_radius=4.0,
                             segs=96)(batch)
    a3 = _area(out3)[0]
    assert a3 == pytest.approx(np.pi * 12.0, rel=0.01)
