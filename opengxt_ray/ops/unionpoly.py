"""Single-layer polygon union (UnionPolygon).

Reference: GT/UnionPolygonProcess.java:99-121 — CascadedPolygonUnion
over every polygon in the layer → one (multi)polygon feature, with a
``preserveHole`` option that strips interior rings from the result.

Ray-Data-first design (NOT a driver-side cascade):

1. slim bbox rows per polygon part (fid, bbox — no geometry) feed a
   grid-cell co-shuffle that emits bbox-overlap candidate edges;
2. :func:`opengxt_ray.textops.dedup.connected_components` labels the
   overlap components (driver union-find on small graphs, distributed
   hash-to-min + pointer jumping beyond);
3. a union + ``groupby(fid)`` message-pass attaches each feature's
   component rep (Dataset.join's schema-less empty partitions break a
   downstream groupby — CLAUDE.md gotcha), then ``groupby(rep)``
   co-locates each overlap component and a ``map_groups`` folds it
   with pairwise Greiner–Hormann unions. Components are independent,
   so the wide work scales with the largest *overlap component*, not
   the layer.

Hole semantics per pairwise fold step (exact within GH robustness):
voids of A∪B = GH union voids ∪ (holes(A) ∖ shell(B)) ∪
(holes(B) ∖ shell(A)) ∪ (holes(A) ∩ holes(B)) — the three derived
sets are interior-disjoint, so no dedup pass is needed.

Robustness envelope (documented, same as dissolve's overlapping-member
fold): exact for simple shells whose pairwise GH union is
well-conditioned; near-degenerate shared-edge overlaps rely on
polygon_union's perturbation retries. ``max_component`` bounds the
O(m²) per-component fold and raises past it (no-silent-caps rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import geomops, wkb as _wkb
from ..core.util import coalesce_for_groupby, default_shuffle_partitions


def _part_pieces(fg, i):
    """Geometry i → [(shell CCW open, [holes CW open])] per polygon part."""
    out = []
    for ring, is_shell in fg.rings(i):
        if len(ring) < 4:
            continue
        r = ring[:-1]
        if is_shell:
            a = geomops.ring_area(ring)
            out.append((r if a > 0 else r[::-1], []))
        elif out:
            a = geomops.ring_area(ring)
            out[-1][1].append(r if a < 0 else r[::-1])
    return out


def _bb(r: np.ndarray):
    return (r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max())


def _bb_disjoint(a, b) -> bool:
    return a[0] > b[2] or a[2] < b[0] or a[1] > b[3] or a[3] < b[1]


def _merge_pair(cur, other):
    """Union two (shell, holes) pieces. Returns None if their shells do
    not merge into one (disjoint), else the merged (shell, holes)."""
    from ..core.polyclip import (polygon_difference, polygon_intersection,
                                 polygon_union)
    from .overlay import _classify_rings

    rings = polygon_union(cur[0], other[0])
    cls = _classify_rings(rings)
    shells = [s for s, _ in cls]
    if len(shells) != 1:
        return None
    voids = list(cls[0][1])
    for h in cur[1]:
        for piece in polygon_difference(h, other[0]):
            if len(piece) >= 4:
                voids.append(piece[:-1][::-1] if
                             geomops.ring_area(piece) > 0 else piece[:-1])
    for h in other[1]:
        for piece in polygon_difference(h, cur[0]):
            if len(piece) >= 4:
                voids.append(piece[:-1][::-1] if
                             geomops.ring_area(piece) > 0 else piece[:-1])
    for ha in cur[1]:
        for hb in other[1]:
            if _bb_disjoint(_bb(ha), _bb(hb)):
                continue
            for piece in polygon_intersection(ha, hb):
                if len(piece) >= 4:
                    voids.append(piece[:-1][::-1] if
                                 geomops.ring_area(piece) > 0 else piece[:-1])
    return (shells[0], voids)


def _fold_pieces(pieces):
    """Fold [(shell, holes)] into disjoint union pieces."""
    out = []
    bbs = []
    for piece in pieces:
        cur = piece
        cur_bb = _bb(cur[0])
        i = 0
        while i < len(out):
            if _bb_disjoint(cur_bb, bbs[i]):
                i += 1
                continue
            merged = _merge_pair(cur, out[i])
            if merged is None:
                i += 1
                continue
            out.pop(i)
            bbs.pop(i)
            cur = merged
            cur_bb = _bb(cur[0])
            i = 0  # rescan: the grown piece may now reach earlier ones
        out.append(cur)
        bbs.append(cur_bb)
    return out


def _capsule(a, b, r: float, qs: int) -> np.ndarray:
    """Open CCW ring of the convex hull of the two endpoint disks — the
    exact (n-gon-discretized) buffer of segment a→b."""
    ca = geomops.circle_ring(float(a[0]), float(a[1]), r, qs)[:-1]
    if a[0] == b[0] and a[1] == b[1]:
        return ca
    cb = geomops.circle_ring(float(b[0]), float(b[1]), r, qs)[:-1]
    return geomops.convex_hull(np.vstack([ca, cb]))[:-1]


def buffer_exact(fg, i: int, radius: float, *, quadrant_segs: int = 8,
                 max_edges: int = 4000):
    """Exact round-join buffer of geometry ``i`` — JTS ``buffer()``
    semantics (GT BufferExpression / BufferFeatures use JTS round
    joins+caps), discretized with an INSCRIBED ``4*quadrant_segs``-gon
    disk like JTS's arc approximation.

    Construction: the Minkowski sum of a geometry with a disk equals
    the union of (a) one capsule — hull of the two endpoint disks —
    per boundary segment and (b) for areal inputs the polygon itself.
    The capsules are folded boundary-order with pairwise
    Greiner–Hormann unions (:func:`_fold_pieces`); ``_merge_pair``'s
    hole algebra then shrinks interior rings by exactly the buffer
    distance and drops holes narrower than ``2*radius`` — correct for
    concave shells and self-intersecting offsets, where the round-1
    hull-of-circles / offset-curve paths were approximations.

    Returns a list of ``(shell_open_ccw, [holes_open_cw])`` pieces
    (multiple pieces when buffered parts stay disjoint). Raises past
    ``max_edges`` boundary segments (no-silent-caps; the fold is
    O(edges²) in the worst case).
    """
    if radius <= 0:
        raise ValueError("buffer_exact requires a positive distance; "
                         "use erode_exact for negative (erosion) "
                         "buffers of polygons.")
    typ = fg.types[i]
    pieces: list = []
    if typ in (_wkb.POLYGON, _wkb.MULTIPOLYGON):
        # polygon parts FIRST: each capsule then merges transversally
        # into the filled interior (shell grows, voids shrink via
        # holes∖capsule, which keeps the void set disjoint). Folding
        # the boundary tube first instead would build an annulus whose
        # inner-offset pseudo-void overlaps the true holes and breaks
        # the flat (shell, voids) piece model.
        pieces.extend(_part_pieces(fg, i))
    if typ in (_wkb.POINT, _wkb.MULTIPOINT):
        for px, py in fg.geom_coords(i):
            pieces.append((geomops.circle_ring(
                float(px), float(py), radius, quadrant_segs)[:-1], []))
    else:
        is_poly = typ in (_wkb.POLYGON, _wkb.MULTIPOLYGON)
        n_seg = 0
        for part, _is_shell in fg.rings(i):
            closed = is_poly and len(part) >= 4 and \
                bool(np.all(part[0] == part[-1]))
            pts = part[:-1] if closed else part
            m = len(pts)
            if m == 0:
                continue
            if m == 1:
                pieces.append((geomops.circle_ring(
                    float(pts[0, 0]), float(pts[0, 1]), radius,
                    quadrant_segs)[:-1], []))
                continue
            n_edges = m if closed else m - 1
            n_seg += n_edges
            if n_seg > max_edges:
                raise ValueError(
                    f"geometry has >{max_edges} boundary segments; the "
                    "pairwise capsule fold is O(edges^2) — simplify "
                    "first or raise max_edges.")
            for j in range(n_edges):
                pieces.append((_capsule(pts[j], pts[(j + 1) % m], radius,
                                        quadrant_segs), []))
    return _fold_pieces(pieces)


def _ring_tube(ring_closed: np.ndarray, radius: float, quadrant_segs: int):
    """Capsule-union tube around one closed ring → folded pieces
    [(outer_ring, [inner voids])]."""
    pts = ring_closed[:-1]
    pieces = [(_capsule(pts[j], pts[(j + 1) % len(pts)], radius,
                        quadrant_segs), []) for j in range(len(pts))]
    return _fold_pieces(pieces)


def erode_exact(fg, i: int, radius: float, *, quadrant_segs: int = 8,
                max_edges: int = 4000):
    """Exact negative (erosion) buffer — JTS ``buffer(-r)`` semantics.

    Per part: the eroded shell regions S⊖r are DIRECTLY the inner
    voids of the shell ring's capsule tube (the boundary's dilation;
    self-intersecting inner offsets split it into several voids — the
    dumbbell case); each grown hole H⊕r is DIRECTLY the outer ring of
    that hole ring's tube. The result folds the voids minus the grown
    holes with ``polygon_difference`` (whose containment branch emits
    the hole ring when H⊕r sits strictly inside an eroded region);
    grown holes that overlap are pre-merged with ``polygon_union``.

    Returns (shell, holes) pieces like :func:`buffer_exact` — an
    empty list when the polygon erodes away. Documented envelope: a
    grown hole that pokes OUTSIDE the eroded shell region is handled
    by the transversal GH difference; coincident tangencies resolve
    via the micro-perturbation retries (~1e-9 relative).
    """
    from ..core.polyclip import polygon_difference, polygon_union
    from .overlay import _classify_rings

    if radius <= 0:
        raise ValueError("erode_exact needs a positive radius")
    if fg.types[i] not in (_wkb.POLYGON, _wkb.MULTIPOLYGON):
        raise ValueError("negative buffers are defined for polygons")

    n_seg = sum(len(part) - 1 for part, _ in fg.rings(i) if len(part) >= 4)
    if n_seg > max_edges:
        raise ValueError(
            f"geometry has >{max_edges} boundary segments; the pairwise "
            "capsule fold is O(edges^2) — simplify first or raise "
            "max_edges.")

    # group rings into parts (shell + its holes)
    parts: list[tuple[np.ndarray, list[np.ndarray]]] = []
    for ring, is_shell in fg.rings(i):
        if len(ring) < 4:
            continue
        if is_shell:
            parts.append((ring, []))
        elif parts:
            parts[-1][1].append(ring)

    result: list = []
    for shell_ring, hole_rings in parts:
        # carve the part with a DIFFERENCE fold — region ∖ capsule per
        # boundary edge. (The earlier construction took the inner
        # voids of the boundary tube's union fold, but closing the
        # annulus unions two nearly-coincident capsule arcs — on
        # arc-heavy rings, e.g. the output of buffer_exact, the
        # degenerate closing union could swallow the void entirely.)
        sr = shell_ring[:-1]
        if geomops.ring_area(shell_ring) < 0:
            sr = sr[::-1]
        regions = [(sr, [])]
        pts = shell_ring[:-1]
        for j in range(len(pts)):
            cap = _capsule(pts[j], pts[(j + 1) % len(pts)], radius,
                           quadrant_segs)
            capc = np.vstack([cap, cap[:1]])
            cap_bb = _bb(cap)
            nxt = []
            for shell, holes in regions:
                if _bb_disjoint(_bb(shell), cap_bb):
                    nxt.append((shell, holes))
                    continue
                diff = polygon_difference(np.vstack([shell, shell[:1]]),
                                          capc)
                for s_ring, voids in _classify_rings(diff):
                    sc = s_ring[:-1] if np.all(
                        s_ring[0] == s_ring[-1]) else s_ring
                    hs = [v[:-1] if np.all(v[0] == v[-1]) else v
                          for v in voids]
                    for oh in holes:
                        hx, hy = oh[0]
                        if geomops.points_in_ring(
                                np.array([hx]), np.array([hy]),
                                np.vstack([sc, sc[:1]]))[0]:
                            hs.append(oh)
                    nxt.append((sc, hs))
            regions = nxt
        if not regions:
            continue
        # grown holes = outer rings of each hole ring's tube; merge
        # overlapping ones so the difference sees disjoint regions
        grown: list[np.ndarray] = []
        for h in hole_rings:
            for outer, _voids in _ring_tube(h, radius, quadrant_segs):
                g_new = outer
                merged = True
                while merged:
                    merged = False
                    for k in range(len(grown)):
                        if _bb_disjoint(_bb(g_new), _bb(grown[k])):
                            continue
                        u = polygon_union(g_new, grown[k])
                        cls = _classify_rings(u)
                        if len(cls) == 1:
                            g_new = cls[0][0][:-1] if np.all(
                                cls[0][0][0] == cls[0][0][-1]) \
                                else cls[0][0]
                            grown.pop(k)
                            merged = True
                            break
                grown.append(g_new)
        for g in grown:
            gc = np.vstack([g, g[:1]])
            nxt = []
            for shell, holes in regions:
                if _bb_disjoint(_bb(shell), _bb(g)):
                    nxt.append((shell, holes))
                    continue
                diff = polygon_difference(np.vstack([shell, shell[:1]]), gc)
                cls = _classify_rings(diff)
                old_holes = list(holes)
                for s_ring, voids in cls:
                    sc = s_ring if not np.all(s_ring[0] == s_ring[-1]) \
                        else s_ring[:-1]
                    hs = [v if not np.all(v[0] == v[-1]) else v[:-1]
                          for v in voids]
                    # re-attach prior holes that landed in this piece
                    for oh in old_holes:
                        px, py = oh[0]
                        if geomops.points_in_ring(
                                np.array([px]), np.array([py]),
                                np.vstack([sc, sc[:1]]))[0]:
                            hs.append(oh)
                    nxt.append((sc, hs))
            regions = nxt
        result.extend(regions)
    return result


def encode_pieces(pieces) -> bytes:
    """(shell, holes) pieces → WKB (multi)polygon."""
    polys = [(np.vstack([s, s[:1]]),
              [np.vstack([h, h[:1]]) for h in hs]) for s, hs in pieces]
    if len(polys) == 1:
        return _wkb.encode_polygon(polys[0][0], polys[0][1] or None)
    return _wkb.encode_multipolygon([(s, h or None) for s, h in polys])


def union_polygon(ds, *, geom_col: str = "geom", fid_col: str | None = None,
                  preserve_hole: bool = True, grid_size: float | None = None,
                  max_component: int = 20_000):
    """Single-layer polygon union → Dataset (rep, geom): one row per
    OVERLAP COMPONENT (geometry = that component's unioned polygon,
    holes per ``preserve_hole``). The layer-level union is exactly the
    collection of these disjoint geometries; ``collect_union`` gathers
    them into the reference's single multipolygon feature."""
    from ..textops.dedup import connected_components

    def _slim(batch: pa.Table) -> pa.Table:
        fg = _wkb.decode(batch[geom_col].to_pylist())
        if fid_col is None:
            from ..core.fid import hash_strings

            fids = hash_strings(
                pa.array([g.hex() for g in batch[geom_col].to_pylist()])
            ).view(np.int64)
        else:
            fids = batch[fid_col].to_numpy(zero_copy_only=False).astype(
                np.int64)
        bb = fg.bboxes() if len(fg) else np.empty((0, 4))
        return pa.table({
            "fid": pa.array(fids, pa.int64()),
            "minx": pa.array(bb[:, 0], pa.float64()),
            "miny": pa.array(bb[:, 1], pa.float64()),
            "maxx": pa.array(bb[:, 2], pa.float64()),
            "maxy": pa.array(bb[:, 3], pa.float64()),
        })

    slim = ds.map_batches(_slim, batch_format="pyarrow").materialize()

    if grid_size is None:
        # bounded gather: bbox dims of ~4096 rows pick a cell size such
        # that a typical bbox covers ≤ 2×2 cells. The sample is a
        # multiplicative-hash subset (uniform even over source-sorted
        # layers — a limit() here would size the grid from one region's
        # features; round-4 scale audit), falling back to the whole
        # table when it is small.
        n_slim = slim.count()
        if n_slim > 4096:
            from .sample import sample_mask

            rate_bp = max(1, min(10_000, -(-4096 * 10_000 // n_slim)))

            def _samp(b: pa.Table) -> pa.Table:
                keys = b["fid"].to_numpy(zero_copy_only=False)
                return b.filter(pa.array(sample_mask(
                    keys.astype(np.uint64), rate_bp)))

            samp = slim.map_batches(_samp,
                                    batch_format="pyarrow").to_pandas()
        else:
            samp = slim.to_pandas()
        if len(samp):
            dims = np.maximum(samp["maxx"] - samp["minx"],
                              samp["maxy"] - samp["miny"]).to_numpy()
            grid_size = float(max(np.max(dims), 1e-9)) * 1.01
        else:
            grid_size = 1.0

    def _cells(batch: pa.Table) -> pa.Table:
        fid = batch["fid"].to_numpy()
        x0 = np.floor(batch["minx"].to_numpy() / grid_size).astype(np.int64)
        x1 = np.floor(batch["maxx"].to_numpy() / grid_size).astype(np.int64)
        y0 = np.floor(batch["miny"].to_numpy() / grid_size).astype(np.int64)
        y1 = np.floor(batch["maxy"].to_numpy() / grid_size).astype(np.int64)
        out_cell, out_fid, out_bb = [], [], []
        bb = np.column_stack([batch["minx"].to_numpy(),
                              batch["miny"].to_numpy(),
                              batch["maxx"].to_numpy(),
                              batch["maxy"].to_numpy()])
        for i in range(len(fid)):
            cx = np.arange(x0[i], x1[i] + 1)
            cy = np.arange(y0[i], y1[i] + 1)
            gx, gy = np.meshgrid(cx, cy)
            # offset-before-shift: bias to non-negative before packing
            key = ((gx.ravel() + (1 << 30)) << np.int64(31)) + \
                (gy.ravel() + (1 << 30))
            out_cell.append(key)
            out_fid.append(np.full(len(key), fid[i], np.int64))
            out_bb.append(np.repeat(bb[i:i + 1], len(key), axis=0))
        if not out_cell:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "fid": pa.array([], pa.int64()),
                             "minx": pa.array([], pa.float64()),
                             "miny": pa.array([], pa.float64()),
                             "maxx": pa.array([], pa.float64()),
                             "maxy": pa.array([], pa.float64())})
        allbb = np.vstack(out_bb)
        return pa.table({
            "cell": pa.array(np.concatenate(out_cell)),
            "fid": pa.array(np.concatenate(out_fid)),
            "minx": pa.array(allbb[:, 0]), "miny": pa.array(allbb[:, 1]),
            "maxx": pa.array(allbb[:, 2]), "maxy": pa.array(allbb[:, 3]),
        })

    def _cell_edges(group: pa.Table) -> pa.Table:
        fid = group["fid"].to_numpy()
        bb = np.column_stack([group[c].to_numpy()
                              for c in ("minx", "miny", "maxx", "maxy")])
        n = len(fid)
        if n < 2:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        iu, ju = np.triu_indices(n, k=1)
        ok = ~((bb[iu, 0] > bb[ju, 2]) | (bb[iu, 2] < bb[ju, 0])
               | (bb[iu, 1] > bb[ju, 3]) | (bb[iu, 3] < bb[ju, 1]))
        ok &= fid[iu] != fid[ju]
        a, b = fid[iu[ok]], fid[ju[ok]]
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    edges = coalesce_for_groupby(
        slim.map_batches(_cells, batch_format="pyarrow")).groupby(
        "cell", num_partitions=default_shuffle_partitions()).map_groups(
        _cell_edges, batch_format="pyarrow")
    comp = connected_components(edges)

    # attach rep via union + groupby(fid) message passing
    pay = ds.map_batches(
        lambda b, _slimfn=_slim: pa.table({
            "fid": _slimfn(b)["fid"],
            "rep": pa.nulls(b.num_rows, pa.int64()),
            geom_col: b[geom_col],
        }), batch_format="pyarrow")
    lab = comp.map_batches(
        lambda b: pa.table({"fid": b["node"], "rep": b["rep"],
                            geom_col: pa.nulls(len(b), pa.binary())}),
        batch_format="pyarrow")

    def _attach(group: pa.Table) -> pa.Table:
        g = group[geom_col].combine_chunks()
        has_geom = np.asarray(g.is_valid())
        reps = group["rep"].combine_chunks()
        rep_valid = np.asarray(reps.is_valid())
        rep = (int(reps[int(np.nonzero(rep_valid)[0][0])].as_py())
               if rep_valid.any()
               else int(group["fid"][0].as_py()))
        idx = np.nonzero(has_geom)[0]
        if len(idx) == 0:
            return pa.table({"rep": pa.array([], pa.int64()),
                             geom_col: pa.array([], pa.binary())})
        return pa.table({
            "rep": pa.array(np.full(len(idx), rep, np.int64)),
            geom_col: g.take(pa.array(idx))})

    labeled = coalesce_for_groupby(pay.union(lab)).groupby(
        "fid", num_partitions=default_shuffle_partitions()).map_groups(
        _attach, batch_format="pyarrow")

    def _component_union(group: pa.Table) -> pa.Table:
        fg = _wkb.decode(group[geom_col].to_pylist())
        if len(fg) > max_component:
            raise ValueError(
                f"overlap component of {len(fg)} polygons exceeds "
                f"max_component={max_component}; the O(m^2) pairwise "
                "fold would not terminate usefully — raise the cap or "
                "pre-dissolve tessellating members.")
        pieces = []
        for i in range(len(fg)):
            pieces.extend(_part_pieces(fg, i))
        folded = _fold_pieces(pieces)
        if not folded:
            return pa.table({"rep": pa.array([], pa.int64()),
                             geom_col: pa.array([], pa.binary())})
        if not preserve_hole:
            folded = [(s, []) for s, _ in folded]
        polys = [(np.vstack([s, s[:1]]),
                  [np.vstack([h, h[:1]]) for h in hs])
                 for s, hs in folded]
        geom = (_wkb.encode_polygon(polys[0][0], polys[0][1] or None)
                if len(polys) == 1
                else _wkb.encode_multipolygon(
                    [(s, h or None) for s, h in polys]))
        return pa.table({"rep": pa.array([int(group["rep"][0].as_py())],
                                         pa.int64()),
                         geom_col: pa.array([geom], pa.binary())})

    return coalesce_for_groupby(labeled).groupby(
        "rep", num_partitions=default_shuffle_partitions()).map_groups(
        _component_union, batch_format="pyarrow")


def collect_union(ds_out, *, geom_col: str = "geom") -> pa.Table:
    """Gather union_polygon's per-component rows into the reference's
    single multipolygon feature (UnionPolygonProcess emits ONE row).
    Driver-side by design: the result of a layer union is one feature;
    size scales with boundary complexity, not input rows."""
    rows = ds_out.take_all()
    parts = []
    for r in rows:
        fg = _wkb.decode([r[geom_col]])
        cur = None
        for ring, is_shell in fg.rings(0):
            if is_shell:
                if cur is not None:
                    parts.append(cur)
                cur = (ring, [])
            elif cur is not None:
                cur[1].append(ring)
        if cur is not None:
            parts.append(cur)
    if not parts:
        return pa.table({geom_col: pa.array([], pa.binary())})
    geom = (_wkb.encode_polygon(parts[0][0], parts[0][1] or None)
            if len(parts) == 1
            else _wkb.encode_multipolygon(
                [(s, h or None) for s, h in parts]))
    return pa.table({geom_col: pa.array([geom], pa.binary())})
