"""Negative (erosion) buffer vs distance oracle.

erode(P, r) = {p : p in P and dist(p, boundary(P)) >= r}. Sampled
membership with a +/-2% r exclusion band for the inscribed n-gon arc
discretization around reflex corners (same convention as
test_exact_buffer).
"""

import numpy as np
import pyarrow as pa
import pytest

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.ops.unionpoly import encode_pieces, erode_exact
from opengxt_ray.stages.transforms import make_buffer
from tests.test_exact_buffer import (_dist_to_ring_edges,
                                     _result_membership)


def _erode_truth(px, py, shell, holes, r):
    inside = geomops.points_in_ring(px, py, shell)
    d = _dist_to_ring_edges(px, py, shell)
    for h in holes:
        inside &= ~geomops.points_in_ring(px, py, h)
        d = np.minimum(d, _dist_to_ring_edges(px, py, h))
    return inside & (d >= r), d


def _check(shell, holes, r, lo, hi, seed=23, n=6000):
    fg = _wkb.decode([_wkb.encode_polygon(shell, holes or None)])
    pieces = erode_exact(fg, 0, r, quadrant_segs=8)
    out = encode_pieces(pieces)
    rng = np.random.default_rng(seed)
    px = rng.uniform(lo, hi, n)
    py = rng.uniform(lo, hi, n)
    truth, d = _erode_truth(px, py, shell, holes, r)
    got = _result_membership(out, px, py)
    keep = np.abs(d - r) > 0.02 * r
    assert np.array_equal(got[keep], truth[keep])
    return pieces


def test_square_erosion_exact_area():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    pieces = _check(sq, [], 2.0, -1, 11)
    assert len(pieces) == 1 and not pieces[0][1]
    area = abs(geomops.ring_area(
        np.vstack([pieces[0][0], pieces[0][0][:1]])))
    # erosion of a convex polygon has no arcs: exactly the 6x6 square
    assert area == pytest.approx(36.0, rel=1e-7)


def test_concave_L_erosion():
    L = np.array([[0, 0], [8, 0], [8, 3], [3, 3], [3, 8], [0, 8], [0, 0]],
                 float)
    _check(L, [], 1.0, -1, 9)


def test_hole_grows_on_erosion():
    shell = np.array([[0, 0], [12, 0], [12, 12], [0, 12], [0, 0]], float)
    hole = np.array([[5, 5], [5, 7], [7, 7], [7, 5], [5, 5]], float)  # CW
    pieces = _check(shell, [hole], 1.0, -1, 13)
    # result has exactly one hole (the grown one)
    assert sum(len(hs) for _s, hs in pieces) == 1


def test_erosion_to_empty():
    sq = np.array([[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]], float)
    fg = _wkb.decode([_wkb.encode_polygon(sq)])
    pieces = erode_exact(fg, 0, 2.0, quadrant_segs=8)
    assert pieces == []


def test_dumbbell_splits_into_two():
    # two 6x6 squares joined by a thin 0.5-high neck; r=1 severs it
    ring = np.array([
        [0, 0], [6, 0], [6, 2.75], [10, 2.75], [10, 0], [16, 0],
        [16, 6], [10, 6], [10, 3.25], [6, 3.25], [6, 6], [0, 6], [0, 0]],
        float)
    pieces = _check(ring, [], 1.0, -1, 17, seed=5)
    assert len(pieces) == 2


def test_make_buffer_negative_distance():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    tbl = pa.table({"geom": pa.array([_wkb.encode_polygon(sq)],
                                     pa.binary())})
    out = make_buffer(-2.0)(tbl)
    fgo = _wkb.decode([bytes(out["geom"][0].as_py())])
    ring = next(rg for rg, sh in fgo.rings(0) if sh)
    assert abs(geomops.ring_area(ring)) == pytest.approx(36.0, rel=1e-7)
    # negative buffer of a line is empty
    line = _wkb.encode_linestring(np.array([[0, 0], [5, 5]], float))
    out2 = make_buffer(-1.0)(pa.table({"geom": pa.array([line],
                                                        pa.binary())}))
    fge = _wkb.decode([bytes(out2["geom"][0].as_py())])
    assert list(fge.rings(0)) == []


def test_two_close_holes_merge_when_grown():
    """Two holes 1 apart with r=0.75: the grown holes overlap and must
    merge into one void (exercises the polygon_union pre-merge in
    erode_exact)."""
    shell = np.array([[0, 0], [20, 0], [20, 12], [0, 12], [0, 0]], float)
    h1 = np.array([[5, 5], [5, 7], [7, 7], [7, 5], [5, 5]], float)
    h2 = np.array([[8, 5], [8, 7], [10, 7], [10, 5], [8, 5]], float)
    pieces = _check(shell, [h1, h2], 0.75, -1, 21, seed=31)
    # merged: a single void in one piece
    assert len(pieces) == 1
    assert len(pieces[0][1]) == 1


def test_hole_breaching_shell_splits_region():
    """A hole near the shell: erosion opens a channel and the eroded
    region splits (transversal difference path)."""
    shell = np.array([[0, 0], [20, 0], [20, 10], [0, 10], [0, 0]], float)
    # hole spanning vertically with 1.2-wide bridges top and bottom
    hole = np.array([[9, 1.2], [9, 8.8], [11, 8.8], [11, 1.2], [9, 1.2]],
                    float)
    pieces = _check(shell, [hole], 1.0, -1, 21, seed=37)
    # bridges (1.2 < 2r) erode away -> two disjoint pieces, no holes
    assert len(pieces) == 2
    assert all(not hs for _s, hs in pieces)


def test_multipolygon_erosion_per_part():
    a = np.array([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]], float)
    b = np.array([[10, 0], [18, 0], [18, 8], [10, 8], [10, 0]], float)
    mp = _wkb.encode_multipolygon([(a, None), (b, None)])
    fg = _wkb.decode([mp])
    pieces = erode_exact(fg, 0, 1.0, quadrant_segs=8)
    areas = sorted(abs(geomops.ring_area(np.vstack([s, s[:1]])))
                   for s, _ in pieces)
    assert len(pieces) == 2
    assert areas[0] == pytest.approx(16.0, rel=1e-7)   # 4x4
    assert areas[1] == pytest.approx(36.0, rel=1e-7)   # 6x6


def test_morphological_opening_closing_property():
    """For random simple (star-convex) polygons: the opening
    erode(P,r) ⊕ r is a subset of P and the closing (P ⊕ r) ⊖ r is a
    superset of P — the defining identities of morphological
    open/close, checked by sampled membership with the usual 2% r
    discretization band around both offset boundaries."""
    from opengxt_ray.ops.unionpoly import buffer_exact

    rng = np.random.default_rng(41)
    for trial in range(4):
        nv = int(rng.integers(6, 14))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(2.0, 6.0, nv)
        shell = np.column_stack([np.cos(ang) * rad, np.sin(ang) * rad])
        shell = np.vstack([shell, shell[:1]])
        r = 0.6
        fg = _wkb.decode([_wkb.encode_polygon(shell)])

        px = rng.uniform(-8, 8, 4000)
        py = rng.uniform(-8, 8, 4000)
        inside_p = geomops.points_in_ring(px, py, shell)
        d = _dist_to_ring_edges(px, py, shell)
        band = np.abs(d - r) > 0.05 * r  # both offsets live near ±r

        # opening: erode then dilate
        er = erode_exact(fg, 0, r, quadrant_segs=8)
        if er:
            fge = _wkb.decode([encode_pieces(er)])
            opened = buffer_exact(fge, 0, r, quadrant_segs=8)
            mo = _result_membership(encode_pieces(opened), px, py)
            bad = mo & ~inside_p & band & (d > 0.05 * r)
            assert not bad.any(), f"opening escaped P on trial {trial}"

        # closing: dilate then erode
        bufp = buffer_exact(fg, 0, r, quadrant_segs=8)
        fgb = _wkb.decode([encode_pieces(bufp)])
        closed = erode_exact(fgb, 0, r, quadrant_segs=8)
        mc = _result_membership(encode_pieces(closed), px, py)
        miss = inside_p & ~mc & band & (d > 0.05 * r)
        assert not miss.any(), f"closing lost P points on trial {trial}"
