"""Core kernel tests: WKB codec, geometry ops, AS-66 stats, cell indexes."""

import numpy as np
import pytest

from opengxt_ray.core import fid, geomops, gridindex, ssutils, wkb
from opengxt_ray.index import hexgrid, quadgrid


def test_wkb_point_roundtrip():
    x = np.array([1.5, -120.25, 0.0, 179.999])
    y = np.array([45.0, -33.3, 0.0, -89.9])
    enc = wkb.encode_points(x, y)
    dx, dy = wkb.decode_points(list(enc))
    np.testing.assert_allclose(dx, x)
    np.testing.assert_allclose(dy, y)


def test_polygon_pip_hole_boundary():
    sq = wkb.encode_polygon(
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]]),
        [np.array([[4, 4], [6, 4], [6, 6], [4, 6]])],
    )
    fg = wkb.decode([sq])
    px = np.array([5.0, 1.0, 11.0, 5.0, 0.0])
    py = np.array([5.0, 1.0, 5.0, 0.0, 0.0])
    res = geomops.points_in_geom(px, py, fg, 0)
    # in-hole, inside, outside, on-boundary, on-corner
    assert list(res) == [False, True, False, True, True]


def test_area_length_centroid():
    sq = wkb.encode_polygon(
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]]),
        [np.array([[4, 4], [6, 4], [6, 6], [4, 6]])],
    )
    fg = wkb.decode([sq])
    np.testing.assert_allclose(geomops.areas(fg), [96.0])
    np.testing.assert_allclose(geomops.lengths(fg), [48.0])
    cx, cy = geomops.centroids([sq])
    np.testing.assert_allclose([cx[0], cy[0]], [5.0, 5.0])


def test_multipolygon_decode():
    mp = wkb.encode_multipolygon([
        (np.array([[0, 0], [1, 0], [1, 1], [0, 1]]), []),
        (np.array([[5, 5], [6, 5], [6, 6], [5, 6]]), []),
    ])
    fg = wkb.decode([mp])
    assert len(fg) == 1
    np.testing.assert_allclose(geomops.areas(fg), [2.0])
    inside = geomops.points_in_geom(
        np.array([0.5, 5.5, 3.0]), np.array([0.5, 5.5, 3.0]), fg, 0)
    assert list(inside) == [True, True, False]


def test_zprob_matches_normal_cdf():
    # AS-66 is a 1e-7-accurate approximation of the exact normal tail
    from math import erf, sqrt

    for z in [0.0, 0.5, 1.0, 1.96, 2.58, 3.5, 6.0]:
        exact_right = 0.5 * (1 - erf(z / sqrt(2)))
        assert ssutils.zprob(z, "right") == pytest.approx(exact_right, abs=1e-6)
    # two-sided at 1.96 ≈ 0.05
    assert ssutils.zprob(1.96) == pytest.approx(0.05, abs=1e-4)
    # tail behavior matches reference: z > 7 → p = 0
    assert ssutils.zprob(8.0, "right") == 0.0
    assert ssutils.zprob(-8.0, "left") == 0.0


def test_format_round_half_up():
    assert ssutils.format_round(1.234567895) == 1.2345679
    assert ssutils.format_round(-1.234567895) == -1.2345679
    assert ssutils.format_round(2.5, 0) == 3.0
    assert ssutils.format_round(-2.5, 0) == -3.0
    assert np.isnan(ssutils.format_round(float("nan")))


def test_hex_cell_center_inverse():
    rs = np.random.RandomState(7)
    lon = rs.uniform(-180, 180, 500)
    lat = rs.uniform(-85, 85, 500)
    for res in (3, 7, 12):
        c = hexgrid.hex_cell(lon, lat, res)
        hx, hy = hexgrid.hex_center(c)
        # every point is within the circumradius of its cell center
        assert (np.hypot(lon - hx, lat - hy) <= hexgrid.hex_size(res) + 1e-9).all()
        # center maps back to the same cell
        assert (hexgrid.hex_cell(hx, hy, res) == c).all()


def test_hex_rings_and_disk():
    c = int(hexgrid.hex_cell(np.array([10.0]), np.array([20.0]), 8)[0])
    assert len(hexgrid.hex_ring(c, 1)) == 6
    assert len(hexgrid.hex_ring(c, 3)) == 18
    assert len(hexgrid.hex_disk(c, 2)) == 19


def test_hex_cover_bbox_superset():
    # every point in the bbox maps to a covered cell
    rs = np.random.RandomState(3)
    lon = rs.uniform(2, 5, 300)
    lat = rs.uniform(40, 42, 300)
    cover = set(hexgrid.cover_bbox(2, 40, 5, 42, 6))
    cells = hexgrid.hex_cell(lon, lat, 6)
    assert all(int(c) in cover for c in cells)


def test_quadgrid():
    lon = np.array([0.0, -179.9, 179.9, 10.5])
    lat = np.array([0.0, -89.9, 89.9, -45.0])
    c = quadgrid.quad_cell(lon, lat, 10)
    qx, qy = quadgrid.quad_center(c)
    assert (np.abs(lon - qx) <= 360 / 2**10).all()
    assert (np.abs(lat - qy) <= 180 / 2**10).all()
    assert len(quadgrid.quad_neighbors(int(c[0]))) == 9


def test_grid_point_index_knn_radius():
    rs = np.random.RandomState(0)
    x = rs.uniform(-100, 100, 2000)
    y = rs.uniform(-50, 50, 2000)
    idx = gridindex.GridPointIndex(x, y)
    d_all = np.hypot(x - 3.0, y - 4.0)
    ii, dd = idx.query_knn(3.0, 4.0, k=5)
    np.testing.assert_array_equal(np.sort(ii), np.sort(np.argsort(d_all)[:5]))
    rr = idx.query_radius(3.0, 4.0, 10.0)
    assert set(rr) == set(np.nonzero(d_all <= 10.0)[0])


def test_fid_fnv1a_exact():
    h = fid.hash_strings(["abc", "", "hello world"])

    def ref(s):
        v = 0xCBF29CE484222325
        for b in s.encode():
            v = ((v ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return v

    assert [int(x) for x in h] == [ref("abc"), ref(""), ref("hello world")]


def test_convex_hull_and_simplify():
    rs = np.random.RandomState(1)
    pts = rs.uniform(0, 10, (200, 2))
    hull = geomops.convex_hull(pts)
    fgh = wkb.decode([wkb.encode_polygon(hull)])
    inside = geomops.points_in_geom(pts[:, 0], pts[:, 1], fgh, 0)
    assert inside.all()
    line = np.array([[0, 0], [1, 0.01], [2, -0.01], [3, 0], [3, 5]])
    simp = geomops.douglas_peucker(line, 0.1)
    np.testing.assert_allclose(simp, [[0, 0], [3, 0], [3, 5]])


def test_vincenty_known_geodesics():
    from opengxt_ray.core.geomops import vincenty

    # WGS84 ellipsoid invariants
    np.testing.assert_allclose(
        vincenty([0.0], [0.0], [1.0], [0.0]), [111319.491], atol=0.001)
    np.testing.assert_allclose(
        vincenty([0.0], [0.0], [0.0], [1.0]), [110574.389], atol=0.01)
    # Paris → NYC geodesic ≈ 5853.1 km (ellipsoidal)
    d = vincenty([2.3522], [48.8566], [-74.0060], [40.7128])
    assert abs(d[0] / 1000.0 - 5853.1) < 2.0
    assert vincenty([5.0], [5.0], [5.0], [5.0])[0] == 0.0


def test_empty_bundle_warning_filter_precision():
    """The log filter drops ONLY the benign empty-schema RefBundle
    warning; typed-vs-typed mismatches (the class that predicts real
    breakage) still pass."""
    import logging

    from opengxt_ray.core.util import install_empty_bundle_warning_filter

    install_empty_bundle_warning_filter()
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    mk = lambda msg: logging.LogRecord("x", logging.WARNING, "f", 1,
                                       msg, None, None)
    benign_new = ("Operator produced a RefBundle with a different schema "
                  "than the previous one. Previous schema: rep: int64\n"
                  "geom: binary, new schema: . This may lead to "
                  "unexpected behavior.")
    benign_prev = ("Operator produced a RefBundle with a different schema "
                   "than the previous one. Previous schema: , new schema: "
                   "a: int64. This may lead to unexpected behavior.")
    real = ("Operator produced a RefBundle with a different schema "
            "than the previous one. Previous schema: a: int64, new "
            "schema: a: double. This may lead to unexpected behavior.")
    other = "some unrelated warning"
    assert not lg.filter(mk(benign_new))
    assert not lg.filter(mk(benign_prev))
    assert lg.filter(mk(real))
    assert lg.filter(mk(other))
