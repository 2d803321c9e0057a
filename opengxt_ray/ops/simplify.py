"""Topology-preserving polygon simplification.

Reference: GT/operations/SimplifyPolygonFeaturesOperation.java:94-260 —
the reference splits each exterior ring at its intersection nodes with
neighboring polygon boundaries, simplifies each boundary arc separately
(so the nodes survive), and re-polygonizes; interior rings simplify
independently (:145-153, "skip intersection test"); parts below
``minimum_area`` are dropped (:104-106).

Ray-Data-first design (shared boundaries stay EXACTLY shared):

1. map_batches: per feature, hash every quantized shell edge → slim
   ``(ekey, fid)`` rows (no geometry in the shuffle).
2. ``groupby(ekey)`` partial-aggregates an owner signature
   ``(count, min fid, max fid)`` per undirected edge — a run of edges
   with the same signature lies against the same neighbor.
3. The slim per-edge signatures hash-join back to each feature's edge
   list; a union + ``groupby(fid)`` co-groups them with the feature
   payload (wide geometry never shuffles with per-edge rows).
4. Within a feature: split each shell ring into arcs where the
   signature changes (these breakpoints are exactly the reference's
   intersection nodes for noded tessellations), CANONICALIZE each arc
   (direction by lexicographic endpoint order; rotation of node-free
   rings to their smallest vertex) and Douglas-Peucker it with fixed
   endpoints. Both owners of a shared arc compute the identical
   canonical sequence → identical simplified vertices → no slivers,
   with zero cross-feature coordination beyond the edge signatures.

Scale: two slim all-to-all exchanges (edge keys, int rows only) + one
payload co-group; per-arc DP is local and vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import geomops, wkb as _wkb
from ..core.util import default_join_partitions, default_shuffle_partitions

_QUANT = 1e-9


def _quant(coords: np.ndarray) -> np.ndarray:
    return np.rint(coords / _QUANT).astype(np.int64)


def _mix64(a: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, uint64 wraparound)."""
    z = a.astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _edge_keys(ring_q: np.ndarray) -> np.ndarray:
    """Direction-independent 64-bit keys of the closed ring's edges.

    ring_q: (m, 2) quantized int64 vertices, closed (first == last).
    Returns (m-1,) int64 keys (uint64 bits viewed signed).
    """
    a = ring_q[:-1]
    b = ring_q[1:]
    # canonical endpoint order
    swap = (a[:, 0] > b[:, 0]) | ((a[:, 0] == b[:, 0]) & (a[:, 1] > b[:, 1]))
    lo = np.where(swap[:, None], b, a)
    hi = np.where(swap[:, None], a, b)
    h = _mix64(lo[:, 0].view(np.uint64))
    for col in (lo[:, 1], hi[:, 0], hi[:, 1]):
        h = _mix64(h ^ _mix64(col.view(np.uint64)))
    return h.view(np.int64)  # int64: Ray hash-shuffle chokes on uint64


def _shell_rings(fg: "_wkb.FlatGeoms", i: int):
    """Yield the shell rings of geometry i (holes handled separately)."""
    for ring, is_shell in fg.rings(i):
        if is_shell and len(ring) >= 4:
            yield ring


def _canonical_arc_dp(arc: np.ndarray, tol: float) -> np.ndarray:
    """DP-simplify an open arc as a pure function of its canonical
    (direction-normalized) vertex sequence, so both owners agree."""
    aq = _quant(arc)
    fwd = tuple(aq[0]) < tuple(aq[-1]) or (
        tuple(aq[0]) == tuple(aq[-1])
        and list(map(tuple, aq)) <= list(map(tuple, aq[::-1])))
    canon = arc if fwd else arc[::-1]
    simp = geomops.douglas_peucker(canon, tol)
    return simp if fwd else simp[::-1]


def _simplify_ring_canonical(ring: np.ndarray, tol: float) -> np.ndarray:
    """Closed node-free ring: rotate to the lexicographically smallest
    quantized vertex, direction-normalize, DP, rotate back closed."""
    rq = _quant(ring[:-1])
    start = int(np.lexsort((rq[:, 1], rq[:, 0]))[0])
    rot = np.concatenate([ring[:-1][start:], ring[:-1][:start],
                          ring[:-1][start:start + 1]])
    # direction: compare vertex after start vs vertex before start
    nxt = tuple(_quant(rot[1:2])[0])
    prv = tuple(_quant(rot[-2:-1])[0])
    if prv < nxt:
        rot = rot[::-1]
    simp = geomops.douglas_peucker(rot, tol)
    if prv < nxt:
        simp = simp[::-1]
    return simp


def _split_runs(sig: np.ndarray) -> list[np.ndarray]:
    """Split edge indices 0..m-1 of a closed ring into maximal runs of
    equal signature, merging the wrap-around run (reference
    splitLines needMerge, :225-240). Returns arcs as index arrays."""
    m = len(sig)
    change = np.nonzero(sig != np.roll(sig, 1))[0]
    if len(change) == 0:
        return []  # node-free ring
    arcs = []
    for k in range(len(change)):
        s = change[k]
        e = change[(k + 1) % len(change)]
        idx = np.arange(s, e if e > s else e + m) % m
        arcs.append(idx)
    return arcs


def simplify_polygon_topo(ds, tolerance: float, *, geom_col: str = "geom",
                          fid_col: str = "fid",
                          minimum_area: float = 0.0,
                          preserve_topology: bool = True):
    """SimplifyPolygon — shared boundaries between adjacent polygons
    stay exactly shared (see module docstring). ``fid_col`` must be a
    unique integer feature id. ``preserve_topology=False`` falls back
    to plain per-feature DP (reference :256-260)."""
    import ray

    if not preserve_topology:
        from ..stages.transforms import make_simplify

        return ds.map_batches(make_simplify(tolerance, geom_col=geom_col),
                              batch_format="pyarrow")

    def _edges(batch: pa.Table) -> pa.Table:
        fg = _wkb.decode(batch[geom_col].to_pylist())
        fids = batch[fid_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, owner = [], []
        for i in range(len(fg)):
            for ring in _shell_rings(fg, i):
                ek = _edge_keys(_quant(ring))
                keys.append(ek)
                owner.append(np.full(len(ek), fids[i], np.int64))
        if not keys:
            return pa.table({"ekey": pa.array([], pa.int64()),
                             "owner": pa.array([], pa.int64())})
        return pa.table({
            "ekey": pa.array(np.concatenate(keys)),
            "owner": pa.array(np.concatenate(owner))})

    edges = ds.map_batches(_edges, batch_format="pyarrow")
    import ray.data.aggregate as A

    owners = edges.groupby(
        "ekey", num_partitions=default_shuffle_partitions()).aggregate(
        A.Count(), A.Min("owner"), A.Max("owner"))
    owners = owners.map_batches(
        lambda b: pa.table({
            "ekey": b["ekey"],
            "sig": pa.array(
                _mix64(b["count()"].to_numpy().astype(np.uint64)
                       ^ _mix64(b["min(owner)"].to_numpy().view(np.uint64))
                       ^ _mix64(np.uint64(0x9E3779B97F4A7C15)
                                * b["max(owner)"].to_numpy().view(np.uint64))
                       ).view(np.int64)),
        }), batch_format="pyarrow")

    # per-feature edge list (slim) joined with signatures
    def _edge_list(batch: pa.Table) -> pa.Table:
        fg = _wkb.decode(batch[geom_col].to_pylist())
        fids = batch[fid_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, owner, ring_i, edge_i = [], [], [], []
        for i in range(len(fg)):
            for r, ring in enumerate(_shell_rings(fg, i)):
                ek = _edge_keys(_quant(ring))
                keys.append(ek)
                owner.append(np.full(len(ek), fids[i], np.int64))
                ring_i.append(np.full(len(ek), r, np.int32))
                edge_i.append(np.arange(len(ek), dtype=np.int32))
        if not keys:
            return pa.table({
                "ekey": pa.array([], pa.int64()),
                fid_col: pa.array([], pa.int64()),
                "ring_i": pa.array([], pa.int32()),
                "edge_i": pa.array([], pa.int32())})
        return pa.table({
            "ekey": pa.array(np.concatenate(keys)),
            fid_col: pa.array(np.concatenate(owner)),
            "ring_i": pa.array(np.concatenate(ring_i)),
            "edge_i": pa.array(np.concatenate(edge_i))})

    elist = ds.map_batches(_edge_list, batch_format="pyarrow")
    elist = elist.join(owners, join_type="inner",
                       num_partitions=default_join_partitions(),
                       on=("ekey",))

    # union(slim signature rows, payload rows) → groupby(fid)
    sig_rows = elist.map_batches(
        lambda b: pa.table({
            fid_col: b[fid_col],
            "ring_i": b["ring_i"].cast(pa.int32()),
            "edge_i": b["edge_i"].cast(pa.int32()),
            "sig": b["sig"],
            geom_col: pa.array([None] * b.num_rows, pa.binary()),
        }), batch_format="pyarrow")
    pay_rows = ds.map_batches(
        lambda b: pa.table({
            fid_col: b[fid_col].cast(pa.int64()),
            "ring_i": pa.array(np.full(b.num_rows, -1, np.int32)),
            "edge_i": pa.array(np.full(b.num_rows, -1, np.int32)),
            "sig": pa.array(np.zeros(b.num_rows, np.int64)),
            geom_col: b[geom_col],
        }), batch_format="pyarrow")

    def _rebuild(group: pa.Table) -> pa.Table:
        ring_idx = group["ring_i"].to_numpy(zero_copy_only=False)
        pay = np.nonzero(ring_idx == -1)[0]
        if len(pay) == 0:
            return pa.table({fid_col: pa.array([], pa.int64()),
                             geom_col: pa.array([], pa.binary())})
        fid = int(group[fid_col][int(pay[0])].as_py())
        wkb_in = group[geom_col][int(pay[0])].as_py()
        fg = _wkb.decode([wkb_in])
        sig_by_ring: dict[int, np.ndarray] = {}
        er = ring_idx[ring_idx >= 0]
        ee = group["edge_i"].to_numpy(zero_copy_only=False)[ring_idx >= 0]
        es = group["sig"].to_numpy(zero_copy_only=False)[ring_idx >= 0]
        for r in np.unique(er):
            m = er == r
            sig = np.empty(int(ee[m].max()) + 1, np.int64)
            sig[ee[m]] = es[m]
            sig_by_ring[int(r)] = sig
        # reassemble polygons: walk rings in stored order
        polys = []
        shell_no = 0
        cur_shell = None
        cur_holes: list[np.ndarray] = []
        for ring, is_shell in fg.rings(0):
            if is_shell:
                if cur_shell is not None:
                    polys.append((cur_shell, cur_holes))
                cur_holes = []
                if len(ring) < 4:
                    cur_shell = ring
                    continue
                if minimum_area > 0 and abs(geomops.ring_area(ring)) \
                        < minimum_area:
                    cur_shell = None
                    shell_no += 1
                    continue
                sig = sig_by_ring.get(shell_no)
                shell_no += 1
                arcs = _split_runs(sig) if sig is not None else []
                if not arcs:
                    simp = _simplify_ring_canonical(ring, tolerance)
                else:
                    pieces = []
                    for idx in arcs:
                        # edge run idx covers vertices idx[0]..idx[-1]+1
                        vs = np.concatenate([idx, [idx[-1] + 1]])
                        arc = ring[np.mod(vs, len(ring) - 1)]
                        # un-mod the closing vertex of a wrapping arc
                        pieces.append(_canonical_arc_dp(arc, tolerance))
                    simp = np.vstack([p[:-1] for p in pieces]
                                     + [pieces[-1][-1:]])
                if len(simp) < 4 or tuple(simp[0]) != tuple(simp[-1]):
                    simp = ring  # degenerate → keep original (no collapse)
                cur_shell = simp
            else:
                hole = _simplify_ring_canonical(ring, tolerance)
                if len(hole) >= 4:
                    cur_holes.append(hole)
                else:
                    cur_holes.append(ring)
        if cur_shell is not None:
            polys.append((cur_shell, cur_holes))
        if not polys:
            return pa.table({fid_col: pa.array([], pa.int64()),
                             geom_col: pa.array([], pa.binary())})
        if len(polys) == 1:
            geom = _wkb.encode_polygon(polys[0][0], polys[0][1] or None)
        else:
            geom = _wkb.encode_multipolygon(
                [(s, h or None) for s, h in polys])
        return pa.table({fid_col: pa.array([fid], pa.int64()),
                         geom_col: pa.array([geom], pa.binary())})

    out = sig_rows.union(pay_rows).groupby(
        fid_col, num_partitions=default_shuffle_partitions()).map_groups(
        _rebuild, batch_format="pyarrow")
    return out
