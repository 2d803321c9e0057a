"""General polygon boolean ops — Greiner–Hormann (1998), pure Python/
numpy. Handles arbitrary SIMPLE polygons (convex or concave, no holes
in the inputs; self-intersecting rings are undefined behavior — run
them through transforms.repair_geometry first). Degenerate contacts (vertex exactly on an edge,
collinear overlaps) are broken by a deterministic micro-perturbation of
the clip ring (documented epsilon approach; the reference relies on
JTS's full robustness machinery instead).

Used by the overlay operators for non-convex clip polygons; convex
clips keep the cheaper Sutherland–Hodgman path.
"""

from __future__ import annotations

import numpy as np

from . import geomops


class _Node:
    __slots__ = ("pt", "next", "prev", "inter", "entry", "pair", "alpha",
                 "visited")

    def __init__(self, pt, inter=False, alpha=0.0):
        self.pt = pt
        self.next = None
        self.prev = None
        self.inter = inter
        self.entry = False
        self.pair = None
        self.alpha = alpha
        self.visited = False


def _ring_open(r: np.ndarray) -> np.ndarray:
    return r[:-1] if len(r) > 1 and np.array_equal(r[0], r[-1]) else r


def _build_list(ring: np.ndarray) -> list[_Node]:
    nodes = [_Node(tuple(p)) for p in ring]
    for i, nd in enumerate(nodes):
        nd.next = nodes[(i + 1) % len(nodes)]
        nd.prev = nodes[(i - 1) % len(nodes)]
    return nodes

def _insert_sorted(edge_start: _Node, node: _Node):
    """Insert an intersection node after edge_start, keeping alpha order
    among consecutive intersection nodes on the same edge."""
    cur = edge_start
    while (cur.next.inter and cur.next.alpha <= node.alpha
           and cur.next is not edge_start):
        cur = cur.next
    node.next = cur.next
    node.prev = cur
    cur.next.prev = node
    cur.next = node


def _point_in_ring(pt, ring: np.ndarray) -> bool:
    return bool(geomops.points_in_ring(
        np.asarray([pt[0]]), np.asarray([pt[1]]),
        np.vstack([ring, ring[:1]]))[0])


def _has_degeneracy(s: np.ndarray, c: np.ndarray, eps: float) -> bool:
    """Any clip vertex on a subject edge / subject vertex on clip edge /
    exactly-coincident vertices → perturb."""
    d1 = geomops.point_segment_dist(
        c[:, 0][:, None], c[:, 1][:, None],
        s[:, 0][None, :], s[:, 1][None, :],
        np.roll(s[:, 0], -1)[None, :], np.roll(s[:, 1], -1)[None, :])
    d2 = geomops.point_segment_dist(
        s[:, 0][:, None], s[:, 1][:, None],
        c[:, 0][None, :], c[:, 1][None, :],
        np.roll(c[:, 0], -1)[None, :], np.roll(c[:, 1], -1)[None, :])
    return bool((d1.min() < eps) or (d2.min() < eps))


def polygon_intersection(subject: np.ndarray, clip: np.ndarray,
                         *, max_perturb_tries: int = 4) -> list[np.ndarray]:
    """Intersection of two simple rings → list of closed result rings.

    Greiner–Hormann with perturbation fallback for degenerate contacts.
    """
    s = _ring_open(np.asarray(subject, dtype=np.float64))
    c = _ring_open(np.asarray(clip, dtype=np.float64))
    if len(s) < 3 or len(c) < 3:
        return []
    scale = max(s.ptp(axis=0).max(), c.ptp(axis=0).max(), 1e-12)
    eps = scale * 1e-12
    cc = c
    for attempt in range(max_perturb_tries):
        if not _has_degeneracy(s, cc, eps * 10):
            break
        # deterministic micro-shift of the clip ring
        shift = scale * 1e-9 * (attempt + 1)
        cc = c + np.array([shift, shift * 0.618])
    result = _gh_core(s, cc)
    return result


def polygon_difference(subject: np.ndarray, clip: np.ndarray,
                       *, max_perturb_tries: int = 4) -> list[np.ndarray]:
    """Difference subject − clip → list of closed rings (holes are
    returned as CW rings immediately after their containing shell —
    only in the fully-contained special case)."""
    s = _ring_open(np.asarray(subject, dtype=np.float64))
    c = _ring_open(np.asarray(clip, dtype=np.float64))
    if len(s) < 3:
        return []
    if len(c) < 3:
        return [np.vstack([s, s[:1]])]
    scale = max(s.ptp(axis=0).max(), c.ptp(axis=0).max(), 1e-12)
    eps = scale * 1e-12
    cc = c
    for attempt in range(max_perturb_tries):
        if not _has_degeneracy(s, cc, eps * 10):
            break
        shift = scale * 1e-9 * (attempt + 1)
        cc = c + np.array([shift, shift * 0.618])
    return _gh_core(s, cc, op="difference")


def polygon_union(subject: np.ndarray, clip: np.ndarray,
                  *, max_perturb_tries: int = 4) -> list[np.ndarray]:
    """Union of two simple rings → closed rings (shell(s); a CW ring
    following a shell is its hole — can occur when the union encloses a
    void between concave boundaries)."""
    s = _ring_open(np.asarray(subject, dtype=np.float64))
    c = _ring_open(np.asarray(clip, dtype=np.float64))
    if len(s) < 3:
        return [np.vstack([c, c[:1]])] if len(c) >= 3 else []
    if len(c) < 3:
        return [np.vstack([s, s[:1]])]
    scale = max(s.ptp(axis=0).max(), c.ptp(axis=0).max(), 1e-12)
    eps = scale * 1e-12
    cc = c
    for attempt in range(max_perturb_tries):
        if not _has_degeneracy(s, cc, eps * 10):
            break
        shift = scale * 1e-9 * (attempt + 1)
        cc = c + np.array([shift, shift * 0.618])
    return _gh_core(s, cc, op="union")


def _gh_core(s: np.ndarray, c: np.ndarray,
             op: str = "intersection") -> list[np.ndarray]:
    snodes = _build_list(s)
    cnodes = _build_list(c)
    # pairwise intersections with parameters
    a0 = s
    a1 = np.roll(s, -1, axis=0)
    b0 = c
    b1 = np.roll(c, -1, axis=0)
    d1 = a1 - a0
    d2 = b1 - b0
    denom = d1[:, None, 0] * d2[None, :, 1] - d1[:, None, 1] * d2[None, :, 0]
    diff0 = b0[None, :, 0] - a0[:, None, 0]
    diff1 = b0[None, :, 1] - a0[:, None, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (diff0 * d2[None, :, 1] - diff1 * d2[None, :, 0]) / denom
        u = (diff0 * d1[:, None, 1] - diff1 * d1[:, None, 0]) / denom
    ok = (denom != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    ia, ib = np.nonzero(ok)
    if len(ia) == 0:
        # containment / disjoint cases
        s_in_c = _point_in_ring(s[0], c)
        c_in_s = _point_in_ring(c[0], s)
        if op == "difference":
            if s_in_c:
                return []                     # fully erased
            if c_in_s:
                # shell + CW hole
                hole = c[::-1] if geomops.ring_area(
                    np.vstack([c, c[:1]])) > 0 else c
                return [np.vstack([s, s[:1]]), np.vstack([hole, hole[:1]])]
            return [np.vstack([s, s[:1]])]    # disjoint
        if op == "union":
            if s_in_c:
                return [np.vstack([c, c[:1]])]
            if c_in_s:
                return [np.vstack([s, s[:1]])]
            return [np.vstack([s, s[:1]]), np.vstack([c, c[:1]])]  # disjoint
        if s_in_c:
            return [np.vstack([s, s[:1]])]
        if c_in_s:
            return [np.vstack([c, c[:1]])]
        return []
    # create paired nodes
    for k in range(len(ia)):
        i, j = int(ia[k]), int(ib[k])
        px = a0[i] + t[i, j] * d1[i]
        ns = _Node(tuple(px), inter=True, alpha=float(t[i, j]))
        nc = _Node(tuple(px), inter=True, alpha=float(u[i, j]))
        ns.pair = nc
        nc.pair = ns
        _insert_sorted(snodes[i], ns)
        _insert_sorted(cnodes[j], nc)
    # entry/exit flags: alternate starting from PIP of the first vertex;
    # difference = invert the SUBJECT flags (keep-outside) and traverse
    # the clip ring REVERSED (A − B ≡ A ∩ Bᶜ)
    inv_s = op in ("difference", "union")
    inv_c = op in ("difference", "union")
    for nodes, other, invert in ((snodes, c, inv_s),
                                 (cnodes, s, inv_c)):
        status = not _point_in_ring(nodes[0].pt, other)
        if invert:
            status = not status
        cur = nodes[0]
        first = nodes[0]
        while True:
            if cur.inter:
                cur.entry = status
                status = not status
            cur = cur.next
            if cur is first:
                break
    # trace
    results = []
    for start in _iter_inters(snodes):
        if start.visited:
            continue
        ring = []
        cur = start
        on_subject = True
        guard = 0
        while True:
            guard += 1
            if guard > 100000:
                return []  # safety: malformed topology
            cur.visited = True
            if cur.pair is not None:
                cur.pair.visited = True
            forward = cur.entry
            if op == "difference" and not on_subject:
                forward = not forward  # clip traversed in reverse
            node = cur
            while True:
                ring.append(node.pt)
                node = node.next if forward else node.prev
                if node.inter:
                    break
            cur = node.pair
            on_subject = not on_subject
            if cur is start or cur.pair is start or node is start:
                break
        if len(ring) >= 3:
            arr = np.asarray(ring)
            results.append(np.vstack([arr, arr[:1]]))
    return results


def _iter_inters(nodes):
    seen = []
    cur = nodes[0]
    first = nodes[0]
    while True:
        if cur.inter and not cur.visited:
            seen.append(cur)
        cur = cur.next
        if cur is first:
            break
    return seen
