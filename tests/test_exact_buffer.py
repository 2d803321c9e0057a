"""Exact polygon/line buffer (capsule union fold) vs distance oracle.

JTS semantics oracle: buffer(G, r) = {p : dist(p, G) <= r}. We sample
points and compare membership, excluding a band of +/-2% r around the
boundary where the inscribed n-gon disk (quadrant_segs=8 -> sagitta
~0.48% r) legitimately differs from the true circle.
"""

import numpy as np
import pyarrow as pa
import pytest

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.ops.unionpoly import buffer_exact, encode_pieces
from opengxt_ray.stages.transforms import make_buffer


def _dist_to_ring_edges(px, py, ring):
    d = np.full(len(px), np.inf)
    for j in range(len(ring) - 1):
        d = np.minimum(d, geomops.point_segment_dist(
            px, py, ring[j, 0], ring[j, 1], ring[j + 1, 0], ring[j + 1, 1]))
    return d


def _poly_truth(px, py, shell, holes, r):
    """membership in buffer(polygon, r) + distance-to-boundary."""
    inside = geomops.points_in_ring(px, py, shell)
    d = _dist_to_ring_edges(px, py, shell)
    for h in holes:
        in_h = geomops.points_in_ring(px, py, h)
        inside = inside & ~in_h
        d = np.minimum(d, _dist_to_ring_edges(px, py, h))
    return inside | (d <= r), d


def _result_membership(wkb_bytes, px, py):
    """even-odd membership over all rings of the (multi)polygon."""
    fg = _wkb.decode([wkb_bytes])
    m = np.zeros(len(px), dtype=bool)
    for ring, _ in fg.rings(0):
        m ^= geomops.points_in_ring(px, py, ring)
    return m


L_SHAPE = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]],
                   dtype=float)


def test_concave_polygon_buffer_membership():
    r = 0.5
    wkb_in = _wkb.encode_polygon(L_SHAPE)
    fg = _wkb.decode([wkb_in])
    out = encode_pieces(buffer_exact(fg, 0, r, quadrant_segs=8))
    rng = np.random.default_rng(7)
    px = rng.uniform(-1, 5, 6000)
    py = rng.uniform(-1, 5, 6000)
    truth, d = _poly_truth(px, py, L_SHAPE, [], r)
    got = _result_membership(out, px, py)
    keep = np.abs(d - r) > 0.02 * r
    assert np.array_equal(got[keep], truth[keep])
    # and the result is strictly bigger than the input
    fgo = _wkb.decode([out])
    area = sum(abs(geomops.ring_area(rg)) for rg, _ in fgo.rings(0))
    assert area > abs(geomops.ring_area(L_SHAPE))


def test_polygon_with_hole_shrinks_hole():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[3, 3], [3, 7], [7, 7], [7, 3], [3, 3]], float)  # CW
    r = 1.0
    wkb_in = _wkb.encode_polygon(shell, [hole])
    fg = _wkb.decode([wkb_in])
    out = encode_pieces(buffer_exact(fg, 0, r, quadrant_segs=8))
    rng = np.random.default_rng(11)
    px = rng.uniform(-2, 12, 6000)
    py = rng.uniform(-2, 12, 6000)
    truth, d = _poly_truth(px, py, shell, [hole], r)
    got = _result_membership(out, px, py)
    keep = np.abs(d - r) > 0.02 * r
    assert np.array_equal(got[keep], truth[keep])
    # hole center is still a hole (4x4 hole, r=1 -> 2x2 remains)
    assert not _result_membership(out, np.array([5.0]), np.array([5.0]))[0]


def test_hole_narrower_than_2r_vanishes():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], float)
    wkb_in = _wkb.encode_polygon(shell, [hole])
    fg = _wkb.decode([wkb_in])
    out = encode_pieces(buffer_exact(fg, 0, 1.5, quadrant_segs=8))
    assert _result_membership(out, np.array([5.0]), np.array([5.0]))[0]
    fgo = _wkb.decode([out])
    rings = list(fgo.rings(0))
    assert all(is_shell for _, is_shell in rings)


def test_convex_square_matches_hull_fast_path_area():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    r, qs = 0.75, 8
    fg = _wkb.decode([_wkb.encode_polygon(sq)])
    pieces = buffer_exact(fg, 0, r, quadrant_segs=qs)
    assert len(pieces) == 1 and not pieces[0][1]
    area_fold = abs(geomops.ring_area(
        np.vstack([pieces[0][0], pieces[0][0][:1]])))
    # hull-of-circles (the convex fast path in make_buffer)
    allc = [geomops.circle_ring(x, y, r, qs)[:-1] for x, y in sq[:-1]]
    hull = geomops.convex_hull(np.concatenate(allc))
    area_hull = abs(geomops.ring_area(hull))
    assert area_fold == pytest.approx(area_hull, rel=1e-6)
    # analytic check: A + P*r + inscribed-n-gon area
    n = 4 * qs
    disk = 0.5 * n * r * r * np.sin(2 * np.pi / n)
    assert area_fold == pytest.approx(4 + 8 * r + disk, rel=1e-6)


def test_line_exact_buffer_membership():
    line = np.array([[0, 0], [3, 0], [3, 3], [6, 3]], float)
    r = 0.8
    wkb_in = _wkb.encode_linestring(line)
    fg = _wkb.decode([wkb_in])
    out = encode_pieces(buffer_exact(fg, 0, r, quadrant_segs=8))
    rng = np.random.default_rng(3)
    px = rng.uniform(-2, 8, 6000)
    py = rng.uniform(-2, 5, 6000)
    d = _dist_to_ring_edges(px, py, line)
    truth = d <= r
    got = _result_membership(out, px, py)
    keep = np.abs(d - r) > 0.02 * r
    assert np.array_equal(got[keep], truth[keep])


def test_self_intersecting_offset_line():
    """A hairpin whose inner offset self-intersects — the offset-curve
    path is approximate here; the capsule fold must stay exact."""
    line = np.array([[0, 0], [5, 0], [5, 1.0], [0, 1.0]], float)
    r = 0.8  # > half the 1.0 gap: inner offsets collide
    fg = _wkb.decode([_wkb.encode_linestring(line)])
    out = encode_pieces(buffer_exact(fg, 0, r, quadrant_segs=8))
    rng = np.random.default_rng(5)
    px = rng.uniform(-2, 7, 6000)
    py = rng.uniform(-2, 3, 6000)
    d = _dist_to_ring_edges(px, py, line)
    truth = d <= r
    got = _result_membership(out, px, py)
    keep = np.abs(d - r) > 0.02 * r
    assert np.array_equal(got[keep], truth[keep])
    # the gap between the arms is fully covered
    assert _result_membership(out, np.array([2.5]), np.array([0.5]))[0]


def test_multipoint_disjoint_disks():
    mp = _wkb.encode_multipoint(np.array([[0, 0], [10, 0]], float))
    fg = _wkb.decode([mp])
    out = encode_pieces(buffer_exact(fg, 0, 1.0, quadrant_segs=8))
    fgo = _wkb.decode([out])
    shells = [rg for rg, sh in fgo.rings(0) if sh]
    assert len(shells) == 2
    # and the two disks are far apart (centers 0 and 10)
    cxs = sorted(float(s[:-1, 0].mean()) for s in shells)
    assert abs(cxs[0] - 0) < 0.01 and abs(cxs[1] - 10) < 0.01


def test_make_buffer_routes_concave_polygon_exact():
    tbl = pa.table({"geom": pa.array([_wkb.encode_polygon(L_SHAPE)],
                                     pa.binary())})
    out = make_buffer(0.5)(tbl)
    rng = np.random.default_rng(17)
    px = rng.uniform(-1, 5, 4000)
    py = rng.uniform(-1, 5, 4000)
    truth, d = _poly_truth(px, py, L_SHAPE, [], 0.5)
    got = _result_membership(bytes(out["geom"][0].as_py()), px, py)
    keep = np.abs(d - 0.5) > 0.02 * 0.5
    assert np.array_equal(got[keep], truth[keep])


def test_make_buffer_exact_false_keeps_hull():
    tbl = pa.table({"geom": pa.array([_wkb.encode_polygon(L_SHAPE)],
                                     pa.binary())})
    out = make_buffer(0.5, exact=False)(tbl)
    fgo = _wkb.decode([bytes(out["geom"][0].as_py())])
    ring = next(rg for rg, sh in fgo.rings(0) if sh)
    # hull is convex; the exact result of an L is concave
    d = np.diff(np.vstack([ring[:-1], ring[:2]]), axis=0)
    cr = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    assert np.all(cr >= -1e-12) or np.all(cr <= 1e-12)


def test_multilinestring_buffer_disjoint_parts():
    from opengxt_ray.core import wkb as _wkb2

    ml = _wkb2.encode_multilinestring([
        np.array([[0, 0], [4, 0]], float),
        np.array([[0, 20], [4, 20]], float)])
    fg = _wkb2.decode([ml])
    pieces = buffer_exact(fg, 0, 1.0, quadrant_segs=8)
    assert len(pieces) == 2
    for s, hs in pieces:
        assert not hs
        # capsule area = rect + inscribed n-gon
        n = 32
        disk = 0.5 * n * np.sin(2 * np.pi / n)
        a = abs(geomops.ring_area(np.vstack([s, s[:1]])))
        assert a == pytest.approx(4 * 2 + disk, rel=1e-6)


def test_buffer_composition_property():
    """buffer(buffer(P, r1), r2) ≈ buffer(P, r1+r2) (Minkowski sum
    associativity) on random star polygons — membership compared off
    a 6% band (two discretization layers compound: inscribed n-gon
    sag + arc-vertex chaining on the second pass)."""
    rng = np.random.default_rng(53)
    for trial in range(3):
        nv = int(rng.integers(5, 11))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(2.0, 5.0, nv)
        shell = np.column_stack([np.cos(ang) * rad, np.sin(ang) * rad])
        shell = np.vstack([shell, shell[:1]])
        r1, r2 = 0.5, 0.4
        fg = _wkb.decode([_wkb.encode_polygon(shell)])
        once = encode_pieces(buffer_exact(fg, 0, r1 + r2, quadrant_segs=8))
        fg1 = _wkb.decode([encode_pieces(
            buffer_exact(fg, 0, r1, quadrant_segs=8))])
        twice = encode_pieces(buffer_exact(fg1, 0, r2, quadrant_segs=8))
        px = rng.uniform(-8, 8, 4000)
        py = rng.uniform(-8, 8, 4000)
        d = _dist_to_ring_edges(px, py, shell)
        inside = geomops.points_in_ring(px, py, shell)
        dist_to_p = np.where(inside, 0.0, d)
        band = np.abs(dist_to_p - (r1 + r2)) > 0.06 * (r1 + r2)
        m1 = _result_membership(once, px, py)
        m2 = _result_membership(twice, px, py)
        assert np.array_equal(m1[band], m2[band]), f"trial {trial}"
