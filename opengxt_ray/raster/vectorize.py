"""Raster → vector bridges.

Reference semantics:
- RasterToPolygon: GT/gridcoverage/RasterToPolygonOperation.java
  (~179 LoC) — dissolve equal-valued cells into polygons.
- RasterToGridPolygon: one rectangle polygon per (non-nodata) cell.

Execution (distributed, two stages):
1. per-TILE vectorize: cells of each distinct value → boundary rings by
   directed-edge cancellation on the cell grid (unit-step rings, kept
   unsimplified so tile borders cancel exactly in stage 2);
2. ``groupby(value)`` cross-tile merge: the unit edges of all tile
   pieces are cancelled again (tile-border edges of neighboring tiles
   are exact float duplicates — both sides derive node coordinates from
   the same ``origin + k·cell`` expression), then chained into final
   rings and collinear-simplified.

Ring assembly is a MULTIGRAPH Euler walk (edges consumed exactly once),
so corner-touching same-value cells cannot drop edges — areas stay
exact even when the walk produces a self-touching ring.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from ..core import geomops, wkb as _wkb
from .tiles import RasterMeta


def _cells_to_edges(rows: np.ndarray, cols: np.ndarray):
    """Cell (row, col) set → surviving directed boundary unit edges in
    GRID-NODE integer coordinates (CCW per cell in world orientation:
    TL→BL→BR→TR).

    Vectorized: internal edges vanish where a 4-neighbor is also set
    (mask diff against the padded occupancy grid), so only O(boundary)
    edges are materialized — no per-cell Python loop."""
    if len(rows) == 0:
        return []
    r0, c0 = int(rows.min()), int(cols.min())
    h = int(rows.max()) - r0 + 1
    w = int(cols.max()) - c0 + 1
    m = np.zeros((h + 2, w + 2), dtype=bool)
    m[rows - r0 + 1, cols - c0 + 1] = True
    core = m[1:-1, 1:-1]
    edges = []

    def _emit(rr, cc, d):
        # rr, cc are LOCAL cell coords (0-based in core)
        gr = rr + r0
        gc = cc + c0
        if d == "left":       # TL -> BL
            a = np.stack([gr, gc], 1)
            b = np.stack([gr + 1, gc], 1)
        elif d == "bottom":   # BL -> BR
            a = np.stack([gr + 1, gc], 1)
            b = np.stack([gr + 1, gc + 1], 1)
        elif d == "right":    # BR -> TR
            a = np.stack([gr + 1, gc + 1], 1)
            b = np.stack([gr, gc + 1], 1)
        else:                 # TR -> TL
            a = np.stack([gr, gc + 1], 1)
            b = np.stack([gr, gc], 1)
        edges.extend(((int(x1), int(y1)), (int(x2), int(y2)))
                     for (x1, y1), (x2, y2) in zip(a, b))

    rr, cc = np.nonzero(core & ~m[1:-1, :-2])    # no left neighbor
    _emit(rr, cc, "left")
    rr, cc = np.nonzero(core & ~m[2:, 1:-1])     # no below neighbor
    _emit(rr, cc, "bottom")
    rr, cc = np.nonzero(core & ~m[1:-1, 2:])     # no right neighbor
    _emit(rr, cc, "right")
    rr, cc = np.nonzero(core & ~m[:-2, 1:-1])    # no above neighbor
    _emit(rr, cc, "top")
    return edges


def _cancel_edges(edges):
    """Cancel (a, b) against (b, a) across a list of directed edges."""
    count: dict = defaultdict(int)
    for a, b in edges:
        if count[(b, a)] > 0:
            count[(b, a)] -= 1
        else:
            count[(a, b)] += 1
    return [(a, b) for (a, b), n in count.items() for _ in range(n)]


def _chain_rings(edges):
    """Multigraph walk consuming every directed edge exactly once into
    SIMPLE closed rings.

    All edges are emitted with the region on their LEFT (CCW cells), so
    at a junction vertex (corner-touching diagonal cells: two out-edges)
    the boundary of the current 4-connected component is the out-edge
    with the most COUNTERclockwise (left-most) turn relative to the
    incoming direction — this keeps diagonal components' boundaries
    separate instead of welding them into figure-eight rings. Shells
    come out CCW, holes CW.
    """
    out: dict = defaultdict(list)
    for a, b in edges:
        out[a].append(b)

    def _left(d):
        # grid coords (row, col) with world x=+col, y=−row:
        # east(0,1)→north(−1,0)→west(0,−1)→south(1,0)
        return (-d[1], d[0])

    rings = []
    for start in list(out):
        while out[start]:
            nxt0 = out[start].pop()
            chain = [start, nxt0]
            cur = nxt0
            din = (nxt0[0] - start[0], nxt0[1] - start[1])
            while cur != start:
                cands = out.get(cur)
                if not cands:
                    chain = None
                    break
                if len(cands) == 1:
                    nxt = cands.pop()
                else:
                    # preference: left turn, straight, right turn, back
                    pref = [_left(din), din, _left(_left(_left(din))),
                            (-din[0], -din[1])]
                    nxt = None
                    for d in pref:
                        cand = (cur[0] + d[0], cur[1] + d[1])
                        if cand in cands:
                            cands.remove(cand)
                            nxt = cand
                            break
                    if nxt is None:
                        nxt = cands.pop()
                din = (nxt[0] - cur[0], nxt[1] - cur[1])
                chain.append(nxt)
                cur = nxt
            if chain and len(chain) >= 4:
                rings.append(chain)
    return rings


def _simplify_collinear(ring: np.ndarray) -> np.ndarray:
    """Drop interior points of straight runs (rectilinear rings)."""
    if len(ring) < 4:
        return ring
    pts = ring[:-1]
    prv = np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0)
    keep = ((nxt[:, 0] - prv[:, 0]) * (pts[:, 1] - prv[:, 1])
            != (pts[:, 0] - prv[:, 0]) * (nxt[:, 1] - prv[:, 1]))
    if not keep.any():
        return ring
    kept = pts[keep]
    return np.vstack([kept, kept[:1]])


def _node_to_world(meta: RasterMeta, nodes) -> np.ndarray:
    arr = np.asarray(nodes, dtype=np.float64)
    x = meta.origin_x + arr[:, 1] * meta.cell_size
    y = meta.origin_y - arr[:, 0] * meta.cell_size
    return np.column_stack([x, y])


def _rings_to_wkb(rings_nodes, meta: RasterMeta, *, simplify: bool) -> bytes:
    """Ring node chains → WKB polygon / multipolygon.

    CCW rings are shells, CW rings are holes; each hole is assigned to
    the shell containing a point just inside the hole (first-edge
    midpoint offset half a cell to the RIGHT of the CW direction — the
    hole interior side), which is robust even when hole and shell
    touch at corners."""
    world = [_node_to_world(meta, ch) for ch in rings_nodes]
    shells = []
    holes = []
    for r in world:
        a = geomops.ring_area(r)
        if a > 0:
            shells.append(r)
        elif a < 0:
            holes.append(r)
    if not shells:       # cannot happen for non-empty cell sets
        shells, holes = holes, []
    assigned = [[] for _ in shells]
    for h in holes:
        mx = (h[0, 0] + h[1, 0]) * 0.5
        my = (h[0, 1] + h[1, 1]) * 0.5
        dx = h[1, 0] - h[0, 0]
        dy = h[1, 1] - h[0, 1]
        n = max(np.hypot(dx, dy), 1e-12)
        # right of direction (dx,dy) is (dy,−dx)
        px = mx + 0.5 * meta.cell_size * dy / n
        py = my - 0.5 * meta.cell_size * dx / n
        best = 0
        if len(shells) > 1:
            # among containing shells pick the SMALLEST-area one: with
            # shell-hole-shell-hole nesting (island in a lake with its
            # own pond) the outer shell also contains the probe point,
            # and first-match would attach the inner hole to it,
            # producing an OGC-invalid nesting.
            best_area = np.inf
            for si, srng in enumerate(shells):
                sfg = _wkb.decode([_wkb.encode_polygon(srng)])
                if geomops.points_in_geom(np.array([px]), np.array([py]),
                                          sfg, 0)[0]:
                    a = abs(geomops.ring_area(srng))
                    if a < best_area:
                        best, best_area = si, a
        assigned[best].append(h)
    if simplify:
        shells = [_simplify_collinear(r) for r in shells]
        assigned = [[_simplify_collinear(h) for h in hs] for hs in assigned]
    if len(shells) == 1:
        return _wkb.encode_polygon(shells[0], assigned[0])
    return _wkb.encode_multipolygon(list(zip(shells, assigned)))


def raster_to_polygon(tiles, meta: RasterMeta, *, value_col: str = "value",
                      simplify: bool = True):
    """RasterToPolygon — dissolve equal-valued cells into polygons.
    Returns a Dataset (value, geom) with one row per distinct value
    (geometry may be a multi-ring polygon; disjoint parts are separate
    CCW rings in ring-set form)."""

    def _tile_vec(batch: pa.Table) -> pa.Table:
        vals_out, geoms_out = [], []
        for i in range(len(batch)):
            tx = int(batch["tx"][i].as_py())
            ty = int(batch["ty"][i].as_py())
            h, w = meta.tile_shape(tx, ty)
            data = np.frombuffer(batch["data"][i].as_py(),
                                 dtype=np.float64).reshape(h, w)
            finite = np.isfinite(data)
            if not np.isnan(meta.nodata):
                finite &= data != meta.nodata
            for v in np.unique(data[finite]):
                rr, cc = np.nonzero(finite & (data == v))
                edges = _cells_to_edges(rr + ty * meta.tile_size,
                                        cc + tx * meta.tile_size)
                rings = _chain_rings(edges)
                if not rings:
                    continue
                vals_out.append(float(v))
                # unsimplified: unit edges must cancel across tiles
                geoms_out.append(_rings_to_wkb(rings, meta, simplify=False))
        return pa.table({value_col: pa.array(vals_out, pa.float64()),
                         "geom": pa.array(geoms_out, pa.binary())})

    pieces = tiles.map_batches(_tile_vec, batch_format="pyarrow")

    def _merge(group: pa.Table) -> pa.Table:
        v = group[value_col][0].as_py()
        fg = _wkb.decode(group["geom"].to_pylist())
        edges = []
        inv = 1.0 / meta.cell_size
        for i in range(len(fg)):
            for ring, _ in fg.rings(i):
                # back to integer node coords (exact: nodes are
                # origin + k·cell by construction)
                nr = np.rint((meta.origin_y - ring[:, 1]) * inv).astype(np.int64)
                nc = np.rint((ring[:, 0] - meta.origin_x) * inv).astype(np.int64)
                for j in range(len(ring) - 1):
                    edges.append(((int(nr[j]), int(nc[j])),
                                  (int(nr[j + 1]), int(nc[j + 1]))))
        rings = _chain_rings(_cancel_edges(edges))
        if not rings:
            return pa.table({value_col: pa.array([], pa.float64()),
                             "geom": pa.array([], pa.binary())})
        return pa.table({
            value_col: pa.array([float(v)], pa.float64()),
            "geom": pa.array([_rings_to_wkb(rings, meta, simplify=simplify)],
                             pa.binary()),
        })

    from ..core.util import default_shuffle_partitions

    return pieces.groupby(
        value_col, num_partitions=default_shuffle_partitions()).map_groups(
        _merge, batch_format="pyarrow")


def raster_to_grid_polygon(tiles, meta: RasterMeta, *,
                           value_col: str = "value"):
    """RasterToGridPolygon — one rectangle polygon per non-nodata cell."""

    def _explode(batch: pa.Table) -> pa.Table:
        vals, geoms, rows_o, cols_o = [], [], [], []
        cs = meta.cell_size
        for i in range(len(batch)):
            tx = int(batch["tx"][i].as_py())
            ty = int(batch["ty"][i].as_py())
            h, w = meta.tile_shape(tx, ty)
            data = np.frombuffer(batch["data"][i].as_py(),
                                 dtype=np.float64).reshape(h, w)
            finite = np.isfinite(data)
            if not np.isnan(meta.nodata):
                finite &= data != meta.nodata
            rr, cc = np.nonzero(finite)
            gr = rr + ty * meta.tile_size
            gc = cc + tx * meta.tile_size
            for r, c, v in zip(gr.tolist(), gc.tolist(),
                               data[rr, cc].tolist()):
                x0 = meta.origin_x + c * cs
                y1 = meta.origin_y - r * cs
                geoms.append(_wkb.encode_polygon(np.array(
                    [[x0, y1 - cs], [x0 + cs, y1 - cs],
                     [x0 + cs, y1], [x0, y1]])))
                vals.append(v)
                rows_o.append(r)
                cols_o.append(c)
        return pa.table({
            "row": pa.array(rows_o, pa.int64()),
            "col": pa.array(cols_o, pa.int64()),
            value_col: pa.array(vals, pa.float64()),
            "geom": pa.array(geoms, pa.binary()),
        })

    return tiles.map_batches(_explode, batch_format="pyarrow")
