"""Property-based tests (hypothesis) for core invariants."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opengxt_ray.core import fid, geomops, ssutils, wkb
from opengxt_ray.index import hexgrid, quadgrid

coord = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False,
                  width=64)
lat_s = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(coord, lat_s), min_size=1, max_size=50))
def test_wkb_point_roundtrip_prop(pts):
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    dx, dy = wkb.decode_points(list(wkb.encode_points(x, y)))
    np.testing.assert_array_equal(dx, x)
    np.testing.assert_array_equal(dy, y)


@settings(max_examples=200, deadline=None)
@given(coord, lat_s, st.integers(min_value=0, max_value=15))
def test_hex_cell_contains_point(lon, lat, res):
    c = hexgrid.hex_cell(np.array([lon]), np.array([lat]), res)
    hx, hy = hexgrid.hex_center(c)
    # point within circumradius of its assigned center, and the center
    # round-trips to the same cell
    assert np.hypot(lon - hx[0], lat - hy[0]) <= hexgrid.hex_size(res) * (1 + 1e-9)
    assert hexgrid.hex_cell(hx, hy, res)[0] == c[0]


@settings(max_examples=100, deadline=None)
@given(coord, lat_s, st.integers(min_value=1, max_value=20))
def test_quad_cell_contains_point(lon, lat, level):
    c = quadgrid.quad_cell(np.array([lon]), np.array([lat]), level)
    qx, qy = quadgrid.quad_center(c)
    assert abs(lon - qx[0]) <= 360.0 / 2 ** level / 2 + 1e-9
    assert abs(lat - qy[0]) <= 180.0 / 2 ** level / 2 + 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=64),
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=64)),
    min_size=3, max_size=40))
def test_convex_hull_contains_all(pts):
    arr = np.array(pts)
    hull = geomops.convex_hull(arr)
    if len(hull) < 4:  # degenerate (collinear)
        return
    fg = wkb.decode([wkb.encode_polygon(hull)])
    inside = geomops.points_in_geom(arr[:, 0], arr[:, 1], fg, 0)
    # denormal cross-product underflow can leave a point an ulp outside
    # the boundary — the meaningful invariant is distance-to-hull ≈ 0
    if not inside.all():
        d = geomops.points_to_geom_dist(arr[~inside, 0], arr[~inside, 1],
                                        fg, 0)
        assert (d < 1e-9).all()


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-6.9, max_value=6.9, allow_nan=False, width=64))
def test_zprob_is_probability(z):
    for tail in ("left", "right", "both"):
        p = ssutils.zprob(z, tail)
        assert 0.0 <= p <= 1.0 + 1e-12
    # left + right = 1 (+ rounding)
    assert abs(ssutils.zprob(z, "left") + ssutils.zprob(z, "right") - 1.0) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=30))
def test_fnv_hash_matches_reference(strings):
    hs = fid.hash_strings(strings)

    def ref(s):
        v = 0xCBF29CE484222325
        for b in s.encode():
            v = ((v ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return v

    assert [int(h) for h in hs] == [ref(s) for s in strings]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                          width=64), min_size=2, max_size=100),
       st.integers(min_value=2, max_value=5))
def test_jenks_breaks_monotone_and_bounding(vals, k):
    from opengxt_ray.ops.classify import jenks_breaks

    arr = np.asarray(vals)
    breaks = jenks_breaks(arr, min(k, len(set(vals))) or 1)
    assert breaks == sorted(breaks)
    assert breaks[0] <= arr.min() + 1e-9
    assert breaks[-1] >= arr.max() - 1e-9


def test_null_geometry_handling():
    """Null geom rows flow through decode and transforms without crashing."""
    from opengxt_ray.stages.transforms import calculate_area

    t = pa.table({"geom": pa.array(
        [wkb.encode_polygon(np.array([[0, 0], [1, 0], [1, 1], [0, 1]])),
         None], pa.binary())})
    fg = wkb.decode(t["geom"].to_pylist())
    assert len(fg) == 2
    areas = geomops.areas(fg)
    assert areas[0] == 1.0 and areas[1] == 0.0
    out = calculate_area(t)
    assert out["geom_area"][1].as_py() == 0.0


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=10**9), st.integers(2, 6),
       st.integers(2, 6))
def test_pip_join_matches_brute_on_random_grids(seed, gx, gy):
    """Property: broadcast PIP join == brute-force PIP for random point
    sets against random rect grids (exercises bucketed candidates +
    stacked refinement)."""
    import pyarrow as pa
    import ray

    from opengxt_ray.core import wkb as W
    from opengxt_ray.ops.join import PipJoiner, PolygonBundle

    rs = np.random.RandomState(seed % (2**31))
    n = 300
    px = rs.uniform(-5, gx * 10 + 5, n)
    py = rs.uniform(-5, gy * 10 + 5, n)
    polys, zids = [], []
    for r in range(gy):
        for c in range(gx):
            x0, y0 = c * 10.0, r * 10.0
            polys.append(W.encode_polygon(np.array(
                [[x0, y0], [x0 + 10, y0], [x0 + 10, y0 + 10], [x0, y0 + 10]])))
            zids.append(r * gx + c)
    zt = pa.table({"zid": pa.array(zids, pa.int64()),
                   "geom": pa.array(polys, pa.binary())})
    joiner = PipJoiner([PolygonBundle(zt)], predicate="intersects",
                       how="inner", dedup="suffix", right_cols=["zid"])
    batch = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(px),
                      "lat": pa.array(py)})
    out = joiner(batch).to_pandas()
    # brute force
    fg = wkb.decode(polys)
    expect = set()
    for g in range(len(polys)):
        inside = geomops.points_in_geom(px, py, fg, g)
        for p in np.nonzero(inside)[0]:
            expect.add((int(p), zids[g]))
    got = set(zip(out.pid.astype(int), out.zid.astype(int)))
    assert got == expect


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=10**9))
def test_gh_matches_sutherland_hodgman_on_convex(seed):
    """Two independent clippers must agree: Greiner–Hormann vs
    Sutherland–Hodgman for random convex polygon pairs."""
    from opengxt_ray.core.polyclip import polygon_intersection

    rs = np.random.RandomState(seed % (2**31))

    def convex(cx, cy, r, n):
        ang = np.sort(rs.uniform(0, 2 * np.pi, n))
        return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])

    A = convex(0, 0, rs.uniform(2, 6), rs.randint(3, 9))
    B = convex(rs.uniform(-3, 3), rs.uniform(-3, 3), rs.uniform(2, 6),
               rs.randint(3, 9))
    gh = polygon_intersection(A, B)
    gh_area = sum(abs(geomops.ring_area(r)) for r in gh)
    sh = geomops.clip_polygon_convex(A, B)
    sh_area = abs(geomops.ring_area(np.vstack([sh, sh[:1]]))) if len(sh) >= 3 else 0.0
    assert gh_area == pytest.approx(sh_area, abs=1e-9, rel=1e-9)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=10**9))
def test_gh_partition_identity(seed):
    """A∩B area + A−B area == area(A) for random polygon pairs
    (intersection and difference are complementary partitions of A)."""
    from opengxt_ray.core.polyclip import (polygon_difference,
                                           polygon_intersection)

    rs = np.random.RandomState(seed % (2**31))

    def star(cx, cy, n):
        # jittered even spacing keeps every angular gap < π — a gap
        # larger than π lets the chord cross the far side of the
        # polygon (self-intersection), which GH does not support
        ang = (np.arange(n) + rs.uniform(0.05, 0.95, n)) * (2 * np.pi / n)
        rad = rs.uniform(2, 6, n)
        return np.column_stack([cx + rad * np.cos(ang),
                                cy + rad * np.sin(ang)])

    A = star(0, 0, rs.randint(4, 12))
    B = star(rs.uniform(-2, 2), rs.uniform(-2, 2), rs.randint(4, 12))
    a_area = abs(geomops.ring_area(np.vstack([A, A[:1]])))
    inter = sum(abs(geomops.ring_area(r))
                for r in polygon_intersection(A, B))
    diff_rings = polygon_difference(A, B)
    # signed accounting: shells minus holes (containment-classified)
    from opengxt_ray.ops.overlay import _classify_rings

    diff = 0.0
    for shell, holes in _classify_rings(diff_rings):
        diff += abs(geomops.ring_area(np.vstack([shell, shell[:1]])))
        for h in holes:
            diff -= abs(geomops.ring_area(np.vstack([h, h[:1]])))
    assert inter + diff == pytest.approx(a_area, rel=1e-6, abs=1e-9)


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=2**63 - 1),
       st.integers(min_value=2, max_value=12))
def test_cells_to_rings_area_preserved(seed, side):
    """Random occupancy masks (incl. diagonal contacts and holes):
    the signed areas of the chained boundary rings must sum to exactly
    the number of occupied cells."""
    from opengxt_ray.raster.vectorize import _cells_to_edges, _chain_rings

    rs = np.random.RandomState(seed % (2**32))
    mask = rs.rand(side, side) < 0.5
    rows, cols = np.nonzero(mask)
    if len(rows) == 0:
        return
    rings = _chain_rings(_cells_to_edges(rows, cols))
    total = 0.0
    for ch in rings:
        # grid nodes (r, c) → world (x=c, y=−r): CCW shells positive
        arr = np.array([[c, -r] for r, c in ch], dtype=np.float64)
        total += geomops.ring_area(arr)
    assert total == float(mask.sum())


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_wkt_wkb_roundtrip_polygon(seed):
    """WKT → WKB → WKT → WKB is stable and area-preserving for random
    simple (convex-hull) polygons."""
    from opengxt_ray.sources.geojson import wkb_to_wkt, wkt_to_wkb

    rs = np.random.RandomState(seed % (2**32))
    pts = rs.uniform(-50, 50, (rs.randint(3, 12), 2))
    hull = geomops.convex_hull(pts)
    if len(hull) < 4:
        return
    b1 = wkb.encode_polygon(hull)
    txt = wkb_to_wkt(b1)
    b2 = wkt_to_wkb(txt)
    a1 = geomops.areas(wkb.decode([b1]))[0]
    a2 = geomops.areas(wkb.decode([b2]))[0]
    # wkb_to_wkt prints ~6 significant digits (WKT PPIO formatting)
    assert a2 == pytest.approx(a1, rel=1e-3)
    # and the parse itself is exact: WKT → WKB → WKT is a fixed point
    from opengxt_ray.sources.geojson import wkb_to_wkt as _w
    assert _w(b2) == _w(wkt_to_wkb(_w(b2)))
