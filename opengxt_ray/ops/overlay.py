"""Overlay operators: clip, erase/difference, intersect with geometry
output, merge.

Reference (SURVEY.md §2.3):
- ClipWithGeometry/ClipWithFeatures: GT/transformation/
  ClipWithGeometryFeatureCollection.java, GT/operations/
  ClipWithFeaturesOperation.java
- Difference: GT/transformation/DifferenceFeatureCollection.java
- Intersect: GT/transformation/IntersectFeatureCollection.java:294-350
  (1-to-many; intersection geometry mapped to input dimension)
- MergeFeatures: GT/transformation/MergeFeatureCollection.java

Geometry-output semantics without GEOS:
- point inputs: exact (PIP)
- line inputs: exact (segment-crossing parameter clipping)
- polygon inputs: convex overlays via Sutherland–Hodgman; general
  simple overlays via Greiner–Hormann intersection/difference
  (core/polyclip.py) with deterministic micro-perturbation for
  degenerate contacts; input holes carried but not re-clipped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..core import geomops, wkb as _wkb
from ..core.util import default_concurrency
from .join import PolygonBundle, _resolve_bundle, put_bundle


def _is_convex(ring: np.ndarray) -> bool:
    r = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    if len(r) < 3:
        return False
    d = np.diff(np.vstack([r, r[:2]]), axis=0)
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    return bool((cross >= -1e-12).all() or (cross <= 1e-12).all())


def _clip_line_to_poly(ring_line: np.ndarray, bundle: PolygonBundle,
                       gi: int, keep_inside: bool) -> list[np.ndarray]:
    """Clip one polyline against polygon gi → list of kept pieces."""
    pieces: list[np.ndarray] = []
    cur: list[np.ndarray] = []
    a = ring_line[:-1]
    b = ring_line[1:]
    for k in range(len(a)):
        p, q = a[k], b[k]
        seglen = float(np.hypot(*(q - p)))
        if seglen == 0:
            continue
        ts = [0.0, 1.0]
        for ring, _ in bundle.fg.rings(gi):
            if len(ring) < 2:
                continue
            xs, ys, _, _ = geomops.segment_intersections(
                p[None, :], q[None, :], ring[:-1], ring[1:])
            if len(xs):
                t = ((xs - p[0]) * (q[0] - p[0]) + (ys - p[1]) * (q[1] - p[1])) \
                    / (seglen * seglen)
                ts.extend(np.atleast_1d(t).tolist())
        ts = np.clip(np.unique(ts), 0, 1)
        mids = (ts[:-1] + ts[1:]) / 2
        mx = p[0] + mids * (q[0] - p[0])
        my = p[1] + mids * (q[1] - p[1])
        inside = geomops.points_in_geom(mx, my, bundle.fg, gi)
        keep = inside if keep_inside else ~inside
        for j in range(len(mids)):
            if keep[j]:
                p0 = p + ts[j] * (q - p)
                p1 = p + ts[j + 1] * (q - p)
                if cur and np.allclose(cur[-1], p0):
                    cur.append(p1)
                else:
                    if len(cur) >= 2:
                        pieces.append(np.asarray(cur))
                    cur = [p0, p1]
            else:
                if len(cur) >= 2:
                    pieces.append(np.asarray(cur))
                cur = []
    if len(cur) >= 2:
        pieces.append(np.asarray(cur))
    return pieces


class OverlayClipper:
    """Actor stage for clip/erase against broadcast overlay polygons."""

    def __init__(self, bundle_ref, *, mode: str = "clip",
                 geom_col: str = "geom", predicate_only: bool = False):
        self.bundle = _resolve_bundle(bundle_ref)
        self.index = self.bundle.build_index()
        self.mode = mode  # "clip" (keep inside) | "erase" (keep outside)
        self.geom_col = geom_col
        self.predicate_only = predicate_only
        self._convex = self.bundle.convex_flags()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fg = _wkb.decode(batch[self.geom_col].to_pylist())
        keep_inside = self.mode == "clip"
        take, geoms = [], []
        bboxes = fg.bboxes()
        for i in range(len(fg)):
            cands = self.index.query_bbox(bboxes[i])
            t = fg.types[i]
            if t == _wkb.POINT:
                pts = fg.geom_coords(i)
                inside = np.zeros(len(pts), dtype=bool)
                for g in cands:
                    inside |= geomops.points_in_geom(pts[:, 0], pts[:, 1],
                                                     self.bundle.fg, int(g))
                kp = pts[inside] if keep_inside else pts[~inside]
                if len(kp):
                    take.append(i)
                    geoms.append(_wkb.encode_point(float(kp[0, 0]), float(kp[0, 1]))
                                 if len(kp) == 1 else _wkb.encode_multipoint(kp))
            elif t == _wkb.LINESTRING:
                if keep_inside:
                    pieces = []
                    for g in cands:
                        for r, _ in fg.rings(i):
                            pieces.extend(_clip_line_to_poly(
                                r, self.bundle, int(g), True))
                else:
                    pieces = [r for r, _ in fg.rings(i)]
                    for g in cands:
                        nxt = []
                        for piece in pieces:
                            nxt.extend(_clip_line_to_poly(
                                piece, self.bundle, int(g), False))
                        pieces = nxt
                if pieces:
                    take.append(i)
                    geoms.append(_wkb.encode_linestring(pieces[0])
                                 if len(pieces) == 1
                                 else _wkb.encode_multilinestring(pieces))
            else:  # polygon
                if self.predicate_only:
                    hit = False
                    pts = fg.geom_coords(i)
                    for g in cands:
                        if geomops.points_in_geom(pts[:, 0], pts[:, 1],
                                                  self.bundle.fg, int(g)).any():
                            hit = True
                            break
                    if hit == keep_inside:
                        take.append(i)
                        geoms.append(bytes(batch[self.geom_col][i].as_py()))
                    continue
                if not keep_inside:
                    # erase: subtract every overlay candidate in turn
                    # (Greiner–Hormann difference; input holes are
                    # carried but not themselves re-clipped — exact for
                    # hole-free inputs, documented). Overlay HOLES are
                    # not part of the overlay, so the input∩hole pieces
                    # are re-added (ADVICE round-1 #4: they were being
                    # erased along with the shell).
                    from ..core.polyclip import (polygon_difference,
                                                 polygon_intersection)

                    pieces = []
                    for r, sflag in fg.rings(i):
                        if sflag and len(r) >= 4:
                            pieces.append((r, []))
                    for g in cands:
                        # candidate rings → [(shell, [holes])]; holes
                        # follow their shell in WKB ring order
                        cparts = []
                        for cr, cs in self.bundle.fg.rings(int(g)):
                            if cs:
                                cparts.append((cr, []))
                            elif cparts:
                                cparts[-1][1].append(cr)
                        clip_convex = self._convex[int(g)]
                        for clip_shell, clip_holes in cparts:
                            cminx, cminy = clip_shell.min(axis=0)
                            cmaxx, cmaxy = clip_shell.max(axis=0)
                            nxt = []
                            for shell, holes in pieces:
                                # containment fast paths (measured 10×
                                # on grid-over-zones unions: most
                                # cell/zone pairs are trivially nested)
                                sminx, sminy = shell.min(axis=0)
                                smaxx, smaxy = shell.max(axis=0)
                                if (not clip_holes and clip_convex
                                        and sminx >= cminx and sminy >= cminy
                                        and smaxx <= cmaxx and smaxy <= cmaxy
                                        and geomops.points_in_ring(
                                            shell[:, 0], shell[:, 1],
                                            clip_shell).all()):
                                    # piece wholly inside a convex clip
                                    # → fully erased
                                    continue
                                if (not clip_holes
                                        and cminx > sminx and cminy > sminy
                                        and cmaxx < smaxx and cmaxy < smaxy
                                        and _is_convex(shell)
                                        and geomops.points_in_ring(
                                            clip_shell[:, 0],
                                            clip_shell[:, 1], shell).all()):
                                    # clip strictly inside a convex piece
                                    # → punch a hole, no GH needed.
                                    # Clips are assumed mutually disjoint
                                    # once contained — the same
                                    # carried-holes limitation as the GH
                                    # path (sequential difference also
                                    # double-subtracts overlapping
                                    # clips), so no extra check is won
                                    # by falling through.
                                    hole = clip_shell[::-1] if \
                                        geomops.ring_area(clip_shell) > 0 \
                                        else clip_shell
                                    holes.append(hole)
                                    nxt.append((shell, holes))
                                    continue
                                rings = polygon_difference(shell, clip_shell)
                                nxt.extend(_classify_rings(rings, holes))
                                for hr in clip_holes:
                                    if len(hr) < 4:
                                        continue
                                    hccw = hr if geomops.ring_area(hr) > 0 \
                                        else hr[::-1]
                                    for rr in polygon_intersection(shell, hccw):
                                        if len(rr) >= 4:
                                            nxt.append((rr, list(holes)))
                            pieces = nxt
                    if pieces:
                        take.append(i)
                        geoms.append(_wkb.encode_polygon(*pieces[0])
                                     if len(pieces) == 1
                                     else _wkb.encode_multipolygon(pieces))
                    continue
                from ..core.polyclip import polygon_intersection

                out_rings = []
                for g in cands:
                    for clip_ring, is_shell in self.bundle.fg.rings(int(g)):
                        if not is_shell:
                            continue
                        for r, sflag in fg.rings(i):
                            if not sflag:
                                continue
                            if self._convex[int(g)]:
                                clipped = geomops.clip_polygon_convex(
                                    r, clip_ring)
                                if len(clipped) >= 3:
                                    out_rings.append(clipped)
                            else:
                                for rr in polygon_intersection(r, clip_ring):
                                    if len(rr) >= 4:
                                        out_rings.append(rr)
                if out_rings:
                    take.append(i)
                    geoms.append(_wkb.encode_polygon(out_rings[0])
                                 if len(out_rings) == 1
                                 else _wkb.encode_multipolygon(
                                     [(r, []) for r in out_rings]))
        out = batch.take(pa.array(take)) if take else batch.slice(0, 0)
        if len(out):
            gi = out.column_names.index(self.geom_col)
            out = out.set_column(gi, self.geom_col,
                                 pa.array(geoms, pa.binary()))
        return out


_OVERLAY_CACHE: dict = {}


def _tasks_map(ds, ref, cls, kwargs):
    """Stateless-tasks execution with a per-worker-process stage cache
    (same pattern as join._cached_pip_joiner): no actor-pool spin-up,
    the bundle index/flags still built once per worker. This is the
    default — overlay bundles are broadcast sides and the per-stage
    pools were measured to oversubscribe multi-leg DAGs (union)."""
    key = (ref if isinstance(ref, str) else ref.hex(), cls.__name__,
           tuple(sorted((k, str(v)) for k, v in kwargs.items())))

    def _task(batch: pa.Table) -> pa.Table:
        st = _OVERLAY_CACHE.get(key)
        if st is None:
            st = cls([ref], **kwargs)
            if len(_OVERLAY_CACHE) >= 8:   # bounded per-worker cache
                _OVERLAY_CACHE.pop(next(iter(_OVERLAY_CACHE)))
            _OVERLAY_CACHE[key] = st
        return st(batch)

    return ds.map_batches(_task, batch_format="pyarrow")


def clip_with_features(ds, overlay: pa.Table, *, geom_col="geom",
                       predicate_only=False, concurrency=None):
    """Keep the parts of each input inside the overlay polygons."""
    ref = put_bundle(overlay)
    if concurrency is None:
        return _tasks_map(ds, ref, OverlayClipper,
                          dict(mode="clip", geom_col=geom_col,
                               predicate_only=predicate_only))
    return ds.map_batches(
        OverlayClipper,
        fn_constructor_kwargs=dict(bundle_ref=[ref], mode="clip",
                                   geom_col=geom_col,
                                   predicate_only=predicate_only),
        batch_format="pyarrow",
        concurrency=concurrency)


def erase_features(ds, overlay: pa.Table, *, geom_col="geom",
                   predicate_only=False, concurrency=None):
    """Difference — keep the parts outside the overlay
    (DifferenceFeatureCollection)."""
    ref = put_bundle(overlay)
    if concurrency is None:
        return _tasks_map(ds, ref, OverlayClipper,
                          dict(mode="erase", geom_col=geom_col,
                               predicate_only=predicate_only))
    return ds.map_batches(
        OverlayClipper,
        fn_constructor_kwargs=dict(bundle_ref=[ref], mode="erase",
                                   geom_col=geom_col,
                                   predicate_only=predicate_only),
        batch_format="pyarrow",
        concurrency=concurrency)


def merge_features(ds_a, ds_b):
    """MergeFeatures — schema-aligned union of two feature tables."""
    sa = ds_a.schema()
    sb = ds_b.schema()
    names = list(dict.fromkeys(list(sa.names) + list(sb.names)))
    types = {}
    for n in names:
        if n in sa.names:
            types[n] = sa.types[sa.names.index(n)]
        else:
            types[n] = sb.types[sb.names.index(n)]

    def _align(batch: pa.Table) -> pa.Table:
        cols = {}
        for n in names:
            if n in batch.column_names:
                cols[n] = batch[n].cast(types[n])
            else:
                cols[n] = pa.nulls(len(batch), types[n])
        return pa.table(cols)

    return ds_a.map_batches(_align, batch_format="pyarrow").union(
        ds_b.map_batches(_align, batch_format="pyarrow"))


def eliminate(polys_ds, *, fid_col: str, min_area: float,
              geom_col: str = "geom", quant: float = 1e-9):
    """EliminateOperation (GT/operations/EliminateOperation.java) —
    merge sliver polygons (area < min_area) into the neighbor sharing
    the LONGEST boundary.

    Exact for tessellating inputs (shared-edge adjacency + edge-length
    accounting + shared-edge-cancellation union); overlapping inputs
    need GEOS. Returns merged polygons (fid of the absorbing feature,
    geom) plus untouched non-sliver features.
    """
    from ..core.geomops import ring_area, union_tessellation
    from ..ops.weights import _quant_key  # quantized vertex keys

    table = pa.concat_tables(
        [b for b in polys_ds.iter_batches(batch_format="pyarrow")])
    fg = _wkb.decode(table[geom_col].to_pylist())
    fids = table[fid_col].to_pylist()
    areas = geomops.areas(fg)
    n = len(fg)
    # shared-edge lengths between features (undirected edge key → owner)
    edge_owner: dict = {}
    shared: dict = {}
    for i in range(n):
        for ring, _ in fg.rings(i):
            if len(ring) < 2:
                continue
            k0 = _quant_key(ring[:-1, 0], ring[:-1, 1], quant)
            k1 = _quant_key(ring[1:, 0], ring[1:, 1], quant)
            seg = np.diff(ring, axis=0)
            lens = np.hypot(seg[:, 0], seg[:, 1])
            with np.errstate(over="ignore"):
                keys = (np.minimum(k0, k1).astype(np.uint64)
                        * np.uint64(0x9E3779B9)
                        + np.maximum(k0, k1).astype(np.uint64))
            for k, L in zip(keys.tolist(), lens.tolist()):
                j = edge_owner.get(k)
                if j is None:
                    edge_owner[k] = i
                elif j != i:
                    key = (min(i, j), max(i, j))
                    shared[key] = shared.get(key, 0.0) + L
    # sliver → absorbing neighbor with max shared length
    target = np.arange(n)
    for i in np.argsort(areas):
        if areas[i] >= min_area:
            continue
        best, best_len = -1, 0.0
        for (a, b), L in shared.items():
            if a == i and areas[b] >= min_area and L > best_len:
                best, best_len = b, L
            elif b == i and areas[a] >= min_area and L > best_len:
                best, best_len = a, L
        if best >= 0:
            target[i] = best
    # union per absorbing group
    groups: dict = {}
    for i in range(n):
        groups.setdefault(int(target[i]), []).append(i)
    out_fid, out_geom = [], []
    for t, members in sorted(groups.items()):
        if len(members) == 1:
            out_fid.append(fids[t])
            out_geom.append(table[geom_col][members[0]].as_py())
            continue
        rings = union_tessellation(fg, members, quant=quant)
        pos = [(r, []) for r in rings if ring_area(r) > 0]
        if pos:
            g = (_wkb.encode_polygon(pos[0][0], pos[0][1]) if len(pos) == 1
                 else _wkb.encode_multipolygon(pos))
        else:
            g = table[geom_col][t].as_py()
        out_fid.append(fids[t])
        out_geom.append(g)
    import ray as _ray

    return _ray.data.from_arrow(pa.table({
        fid_col: pa.array(out_fid),
        geom_col: pa.array(out_geom, pa.binary()),
    }))


def _classify_rings(rings, carry_holes=()):
    """GH output rings → [(shell, holes)] by containment (GH traversal
    does not guarantee orientation): largest-first; a ring whose first
    vertex lies inside an existing shell becomes that shell's hole."""
    from ..core import wkb as _W

    if not rings:
        return []
    order = sorted(range(len(rings)),
                   key=lambda i: -abs(geomops.ring_area(rings[i])))
    out = []
    for i in order:
        r = rings[i]
        if abs(geomops.ring_area(r)) <= 0:
            continue
        ccw = r if geomops.ring_area(r) > 0 else r[::-1]
        placed = False
        for shell, holes in out:
            sfg = _W.decode([_W.encode_polygon(shell)])
            if geomops.points_in_geom(ccw[:1, 0], ccw[:1, 1], sfg, 0)[0]:
                holes.append(ccw[::-1])  # hole: CW
                placed = True
                break
        if not placed:
            out.append((ccw, list(carry_holes)))
    return out


class IntersectEmitter:
    """Actor stage: the reference's Intersect join with GEOMETRY output
    (GT/transformation/IntersectFeatureCollection.java:294-350) — one
    row per (input, overlay) pair whose geometries intersect, carrying
    the intersection geometry mapped to the input dimension and the
    overlay attrs with ``_N`` name dedup."""

    def __init__(self, bundle_ref, *, geom_col="geom", right_cols=None):
        self.bundle = _resolve_bundle(bundle_ref)
        self.index = self.bundle.build_index()
        self.geom_col = geom_col
        self.right_cols = right_cols
        self._convex = self.bundle.convex_flags()
        self._name_map = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.polyclip import polygon_intersection
        from .join import _dedup_names

        fg = _wkb.decode(batch[self.geom_col].to_pylist())
        if self._name_map is None:
            right = self.right_cols or self.bundle.attrs.column_names
            self._name_map = _dedup_names(batch.column_names, right, "suffix")
        bboxes = fg.bboxes()
        take, gidx, geoms = [], [], []
        for i in range(len(fg)):
            cands = self.index.query_bbox(bboxes[i])
            t = fg.types[i]
            for g in cands:
                g = int(g)
                if t == _wkb.POINT:
                    pts = fg.geom_coords(i)
                    inside = geomops.points_in_geom(pts[:, 0], pts[:, 1],
                                                    self.bundle.fg, g)
                    kp = pts[inside]
                    if len(kp):
                        take.append(i)
                        gidx.append(g)
                        geoms.append(
                            _wkb.encode_point(float(kp[0, 0]), float(kp[0, 1]))
                            if len(kp) == 1 else _wkb.encode_multipoint(kp))
                elif t == _wkb.LINESTRING:
                    pieces = []
                    for r, _ in fg.rings(i):
                        pieces.extend(_clip_line_to_poly(r, self.bundle, g,
                                                         True))
                    if pieces:
                        take.append(i)
                        gidx.append(g)
                        geoms.append(_wkb.encode_linestring(pieces[0])
                                     if len(pieces) == 1
                                     else _wkb.encode_multilinestring(pieces))
                else:
                    out_rings = []
                    for clip_ring, cs in self.bundle.fg.rings(g):
                        if not cs:
                            continue
                        for r, sflag in fg.rings(i):
                            if not sflag:
                                continue
                            if self._convex[g]:
                                c = geomops.clip_polygon_convex(r, clip_ring)
                                if len(c) >= 3:
                                    out_rings.append(c)
                            else:
                                for rr in polygon_intersection(r, clip_ring):
                                    if len(rr) >= 4:
                                        out_rings.append(rr)
                    if out_rings:
                        take.append(i)
                        gidx.append(g)
                        geoms.append(_wkb.encode_polygon(out_rings[0])
                                     if len(out_rings) == 1
                                     else _wkb.encode_multipolygon(
                                         [(r, []) for r in out_rings]))
        out = batch.take(pa.array(take)) if take else batch.slice(0, 0)
        cols = dict(zip(out.column_names, out.columns))
        cols[self.geom_col] = pa.array(geoms, pa.binary())
        gi_arr = pa.array(np.asarray(gidx, dtype=np.int64))
        for src, dst in self._name_map:
            cols[dst] = (self.bundle.attrs[src].take(gi_arr)
                         if len(gidx) else self.bundle.attrs[src].slice(0, 0))
        return pa.table(cols)


def intersect_features(ds, overlay: pa.Table, *, geom_col="geom",
                       right_cols=None, concurrency=None):
    """Intersect overlay join with geometry output (1-to-many)."""
    ref = put_bundle(overlay)
    if concurrency is None:
        return _tasks_map(ds, ref, IntersectEmitter,
                          dict(geom_col=geom_col,
                               right_cols=tuple(right_cols)
                               if right_cols else None))
    return ds.map_batches(
        IntersectEmitter,
        fn_constructor_kwargs=dict(bundle_ref=[ref], geom_col=geom_col,
                                   right_cols=right_cols),
        batch_format="pyarrow",
        concurrency=concurrency)


def identity_features(ds, overlay: pa.Table, *, geom_col="geom",
                      right_cols=None):
    """IdentityProcess — intersection pieces (with overlay attrs) plus
    the parts of the input outside the overlay (overlay attrs null)."""
    inter = intersect_features(ds, overlay, geom_col=geom_col,
                               right_cols=right_cols)
    outside = erase_features(ds, overlay, geom_col=geom_col)
    return merge_features(inter, outside)


def symdifference_features(ds_a, overlay_b: pa.Table, a_table: pa.Table,
                           ds_b, *, geom_col="geom"):
    """SymDifference — (A − B) ∪ (B − A)."""
    a_minus = erase_features(ds_a, overlay_b, geom_col=geom_col)
    b_minus = erase_features(ds_b, a_table, geom_col=geom_col)
    return merge_features(a_minus, b_minus)


def union_features(ds_a, overlay_b: pa.Table, a_table: pa.Table, ds_b,
                   *, geom_col="geom", right_cols=None,
                   concurrency: int | None = None):
    """UnionProcess — full overlay union of two polygon layers
    (GT/operations/UnionProcess; the 2-layer Union from the ArcGIS
    overlay family the reference mirrors):

    - A∩B pieces carry BOTH attribute sets (B columns ``_N``-deduped,
      IntersectFeatureCollection.java:131-156);
    - A−B pieces carry A attrs, B attrs null;
    - B−A pieces carry B attrs, A attrs null.

    ``overlay_b``/``a_table`` are the broadcast (driver-side) tables of
    each layer; ``ds_a``/``ds_b`` the streamed sides — same calling
    convention as :func:`symdifference_features`.
    """
    from ..core.util import default_concurrency
    from .join import _dedup_names

    # the three legs default to the cached-tasks execution path — three
    # ACTOR pools in one streaming DAG oversubscribed the cluster
    # (measured 33 s → ~9 s at sf0.1/32 CPUs with a /3 split; tasks
    # avoid the pools entirely)
    inter = intersect_features(ds_a, overlay_b, geom_col=geom_col,
                               right_cols=right_cols,
                               concurrency=concurrency)
    a_only = erase_features(ds_a, overlay_b, geom_col=geom_col,
                            concurrency=concurrency)
    b_only = erase_features(ds_b, a_table, geom_col=geom_col,
                            concurrency=concurrency)
    # rename B's columns exactly as IntersectEmitter does so the three
    # legs align column-wise in merge_features
    a_names = [n for n in (ds_a.schema().names)]
    b_names = [n for n in (right_cols or ds_b.schema().names)
               if n != geom_col]
    name_map = dict(_dedup_names(a_names, b_names, "suffix"))

    def _rename_b(batch: pa.Table) -> pa.Table:
        cols = {}
        for n in batch.column_names:
            cols[name_map.get(n, n)] = batch[n]
        return pa.table(cols)

    b_only = b_only.map_batches(_rename_b, batch_format="pyarrow")
    return merge_features(merge_features(inter, a_only), b_only)


def update_features(ds, overlay: pa.Table, *, geom_col="geom"):
    """UpdateProcess — overlay features replace the overlapping parts
    of the input: (input − overlay) ∪ overlay."""
    import ray as _ray

    outside = erase_features(ds, overlay, geom_col=geom_col)
    return merge_features(outside, _ray.data.from_arrow(overlay))


def clip_with_geometry(ds, geom_wkb: bytes, *, geom_col="geom",
                       predicate_only=False, concurrency=None):
    """ClipWithGeometryProcess — single-geometry convenience over
    :func:`clip_with_features`."""
    tab = pa.table({"geom": pa.array([geom_wkb], pa.binary())})
    return clip_with_features(ds, tab, geom_col=geom_col,
                              predicate_only=predicate_only,
                              concurrency=concurrency)
