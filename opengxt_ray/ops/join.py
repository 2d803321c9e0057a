"""Spatial joins — the engine's core operator family.

Reference semantics:
- nearest join: GT/operations/SpatialJoinOperation.java:75-183
  (STRtree nearestNeighbour per row, optional searchRadius cutoff,
  joinType KeepAllRecord=left / OnlyMatchingRecord=inner).
- intersects join: GT/transformation/IntersectFeatureCollection.java
  :190-350 (1-to-many, overlay columns appended with ``_N`` dedup).
- PIP aggregate: GT/operations/PointsInPolygonOperation.java:59-123.

Ray-Data-first execution (SURVEY.md §7.2-7.3):

1. **Broadcast path** (small polygon/join side): the side is packaged
   once into the object store (``ray.put``) and every `map_batches`
   actor builds its numpy index once in ``__init__`` — the distributed
   analogue of the reference's per-run STRtree build, shared zero-copy
   across the pool.
2. **Co-partition path** (both sides large): both sides are keyed by
   hex cell (polygons replicated to every covering cell via flat_map),
   shuffled with ``groupby(cell)``, and refined per cell with the same
   numpy kernels. Hot cells are salted (north_rule: explicit skew
   splitting): cells whose point count exceeds ``hot_threshold`` get
   their points split over ``nsplit`` salt keys and the polygon side
   replicated per salt.

Wide payload columns (html/text) should be projected out before a
co-partition join and re-attached by key afterwards
(:func:`slim_join_reattach`) — SURVEY.md §7.4 "wide binary rows".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..core import geomops, wkb as _wkb
from ..core.gridindex import BBoxIndex, GridPointIndex
from ..core.util import default_concurrency
from ..index import hexgrid


# ---------------------------------------------------------------------------
# Polygon bundle (broadcast side)
# ---------------------------------------------------------------------------

class PolygonBundle:
    """Picklable packaging of a geometry table for broadcast."""

    def __init__(self, table: pa.Table, geom_col: str = "geom"):
        self.attrs = table.drop_columns([geom_col])
        self.fg = _wkb.decode(table[geom_col].to_pylist())
        self.bboxes = self.fg.bboxes()
        self._stack = False  # lazily computed: ndarray | None

    def build_index(self) -> BBoxIndex:
        return BBoxIndex(self.bboxes)

    def convex_flags(self) -> list:
        """Per-geometry all-shells-convex flags, computed ONCE (driver
        side in put_bundle) and shipped with the bundle — recomputing
        per actor over a large broadcast side costs seconds per actor
        (measured on a 15k-cell overlay bundle)."""
        if getattr(self, "_convex", None) is None:
            from .overlay import _is_convex

            self._convex = [
                all(_is_convex(r) for r, sflag in self.fg.rings(g) if sflag)
                for g in range(len(self.fg))
            ]
        return self._convex

    def ring_stack(self):
        """(G, m, 2) stacked rings when EVERY geometry is a single-ring
        polygon with the same vertex count (rect/hex zone grids — the
        common broadcast case); else None. Enables fully vectorized
        all-pairs PIP refinement."""
        if self._stack is False:
            stack = None
            fg = self.fg
            if len(fg) and (fg.types == _wkb.POLYGON).all():
                nrings = np.diff(fg.part_offsets)
                sizes = np.diff(fg.ring_offsets)
                if (nrings == 1).all() and len(set(sizes.tolist())) == 1:
                    m = int(sizes[0])
                    stack = fg.coords.reshape(len(fg), m, 2)
            self._stack = stack
        return self._stack


def put_bundle(table: pa.Table, geom_col: str = "geom") -> str:
    """Build + broadcast a PolygonBundle once (driver side). Returns a
    restart-safe broadcast TOKEN (plain string) — never a raw
    ObjectRef in actor constructor kwargs (ray#53727: a restarting
    max_restarts>0 pool worker fails if the driver-owned ref went out
    of scope; the holder actor pins it for the job instead)."""
    from ..core.broadcast import put_broadcast

    bundle = PolygonBundle(table, geom_col)
    bundle.convex_flags()   # precompute before the put (see method doc)
    return put_broadcast(bundle)


def _resolve_bundle(bundle_ref) -> PolygonBundle:
    """Accept a broadcast token (preferred), a PolygonBundle, an
    ObjectRef, or a ``[ObjectRef]``/``[token]`` wrapper."""
    from ..core.broadcast import resolve_state

    return resolve_state(bundle_ref)


def _dedup_names(left_names, right_names, mode: str):
    """Column-name collision handling.

    mode='suffix': reference Intersect semantics — append _1, _2, …
    (GT/transformation/IntersectFeatureCollection.java:131-156).
    mode='skip': SpatialJoin semantics — drop duplicate join columns.
    """
    out = []
    taken = set(left_names)
    for name in right_names:
        if name not in taken:
            out.append((name, name))
            taken.add(name)
        elif mode == "skip":
            continue
        else:
            i = 1
            while f"{name}_{i}" in taken:
                i += 1
            out.append((name, f"{name}_{i}"))
            taken.add(f"{name}_{i}")
    return out


def _point_coords(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Extract x/y for the point side: prefer lon/lat columns (zero
    decode), else decode/centroid the geom column."""
    if "lon" in batch.column_names and "lat" in batch.column_names:
        return batch["lon"].to_numpy(), batch["lat"].to_numpy()
    return _wkb.decode_points(batch["geom"].to_pylist())


def _pairs_in_rings_stacked(px, py, stack, pi, gi) -> np.ndarray:
    """Vectorized PIP for candidate pairs against stacked uniform rings
    (P pairs × (m−1) edges, one shot) — same crossing+boundary
    semantics as geomops.points_in_ring."""
    r = stack[gi]                       # (P, m, 2)
    x0, y0 = r[:, :-1, 0], r[:, :-1, 1]
    x1, y1 = r[:, 1:, 0], r[:, 1:, 1]
    X = px[pi][:, None]
    Y = py[pi][:, None]
    cond = (y0 > Y) != (y1 > Y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (Y - y0) * (x1 - x0) / (y1 - y0)
    inside = (np.sum(cond & (X < xint), axis=1) % 2) == 1
    dx, dy = x1 - x0, y1 - y0
    cross = (X - x0) * dy - (Y - y0) * dx
    wx = (X >= np.minimum(x0, x1)) & (X <= np.maximum(x0, x1))
    wy = (Y >= np.minimum(y0, y1)) & (Y <= np.maximum(y0, y1))
    on_edge = np.any((np.abs(cross) < 1e-12) & wx & wy, axis=1)
    return inside | on_edge


def _refine_pairs(px, py, bundle: PolygonBundle, index: BBoxIndex,
                  predicate: str) -> tuple[np.ndarray, np.ndarray]:
    """Candidate bbox pairs → exact predicate pairs (pi, gi)."""
    pi, gi = index.query_points(px, py)
    if len(pi) == 0:
        return pi, gi
    if predicate in ("intersects", "contains", "within"):
        stack = bundle.ring_stack() if hasattr(bundle, "ring_stack") else None
        if stack is not None:
            m = _pairs_in_rings_stacked(px, py, stack, pi, gi)
            return pi[m], gi[m]
    keep = np.zeros(len(pi), dtype=bool)
    order = np.argsort(gi, kind="stable")
    gs, ps = gi[order], pi[order]
    start = 0
    for i in range(1, len(order) + 1):
        if i == len(order) or gs[i] != gs[start]:
            g = int(gs[start])
            pts = ps[start:i]
            if predicate in ("intersects", "contains", "within"):
                m = geomops.points_in_geom(px[pts], py[pts], bundle.fg, g)
            else:
                raise ValueError(f"unknown predicate {predicate}")
            keep[order[start:i]] = m
            start = i
    return pi[keep], gi[keep]


class PipJoiner:
    """Actor-pool stage: point-in-polygon / intersects join vs broadcast
    polygons. Index built once per actor in __init__ (SURVEY.md §7.2)."""

    def __init__(self, bundle_ref, *, predicate="intersects", how="inner",
                 dedup="suffix", right_cols=None):
        self.bundle: PolygonBundle = _resolve_bundle(bundle_ref)
        self.index = self.bundle.build_index()
        self.predicate = predicate
        self.how = how
        self.right_cols = right_cols
        self.dedup = dedup
        self._name_map = None

    def _names(self, batch):
        if self._name_map is None:
            right = self.right_cols or self.bundle.attrs.column_names
            self._name_map = _dedup_names(batch.column_names, right, self.dedup)
        return self._name_map

    def __call__(self, batch: pa.Table) -> pa.Table:
        px, py = _point_coords(batch)
        pi, gi = _refine_pairs(px, py, self.bundle, self.index, self.predicate)
        names = self._names(batch)
        if self.how == "left":
            matched = np.zeros(len(batch), dtype=bool)
            matched[pi] = True
            miss = np.nonzero(~matched)[0]
            all_pi = np.concatenate([pi, miss])
            all_gi = np.concatenate([gi, np.full(len(miss), -1, dtype=np.int64)])
        else:
            all_pi, all_gi = pi, gi
        order = np.argsort(all_pi, kind="stable")
        all_pi, all_gi = all_pi[order], all_gi[order]
        left = batch.take(pa.array(all_pi))
        cols = dict(zip(left.column_names, left.columns))
        attrs = self.bundle.attrs
        gi_arr = pa.array(np.where(all_gi < 0, 0, all_gi))
        null_mask = all_gi < 0
        for src, dst in names:
            col = attrs[src].take(gi_arr)
            if null_mask.any():
                col = pc.if_else(pa.array(~null_mask), col.combine_chunks()
                                 if isinstance(col, pa.ChunkedArray) else col, None)
            cols[dst] = col
        return pa.table(cols)


# per-worker-process cache: ObjectRef hex → built joiner. Ray reuses
# worker processes across tasks, so a task-based stage gets its index
# built once per worker — the actor-pool benefit without pool startup.
_JOINER_CACHE: dict = {}


def _cached_pip_joiner(ref_hex: str, ref, predicate, how, dedup,
                       right_cols) -> "PipJoiner":
    key = (ref_hex, predicate, how, dedup,
           tuple(right_cols) if right_cols else None)
    j = _JOINER_CACHE.get(key)
    if j is None:
        j = PipJoiner([ref], predicate=predicate, how=how, dedup=dedup,
                      right_cols=right_cols)
        _JOINER_CACHE[key] = j
    return j


def broadcast_spatial_join(points_ds, poly_table: pa.Table, *,
                           predicate="intersects", how="inner",
                           dedup="suffix", right_cols=None,
                           concurrency=None, batch_size: int = 8192,
                           compute: str = "auto"):
    """Points × broadcast polygons join.

    compute: "tasks" (default for small bundles) runs as stateless
    map_batches tasks with a per-worker-process joiner cache — no
    actor-pool spin-up, index still built once per worker; "actors"
    pins a fixed actor pool (preferred for very large indexes where
    placement stability matters); "auto" picks by bundle size.
    """
    bundle = PolygonBundle(poly_table)
    ref = ray.put(bundle)
    if compute == "auto":
        compute = "tasks" if len(bundle.fg) <= 100_000 else "actors"
    if compute == "actors":
        return points_ds.map_batches(
            PipJoiner,
            fn_constructor_kwargs=dict(
                bundle_ref=[ref], predicate=predicate, how=how,
                dedup=dedup, right_cols=right_cols,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or default_concurrency(),
        )
    # put_bundle returns a plain-string token (round 5); older callers
    # may still hold ObjectRefs
    ref_hex = ref if isinstance(ref, str) else ref.hex()

    def _join_task(batch: pa.Table) -> pa.Table:
        j = _cached_pip_joiner(ref_hex, ref, predicate, how, dedup, right_cols)
        return j(batch)

    return points_ds.map_batches(_join_task, batch_format="pyarrow",
                                 batch_size=batch_size)


# ---------------------------------------------------------------------------
# Nearest join (SpatialJoinOperation semantics)
# ---------------------------------------------------------------------------

class NearestJoiner:
    """Nearest-feature join vs a broadcast side.

    GT/operations/SpatialJoinOperation.java:125-175: per input row,
    nearest join feature; if searchRadius > 0 and distance > radius the
    row is emitted without join attrs (KeepAllRecord) or skipped
    (OnlyMatchingRecord). Adds no distance column (use ops.near for
    that). Distances are planar in CRS units unless geodesic=True
    (haversine meters, standing in for GeodeticCalculator).
    """

    BRUTE_MAX = 8192      # join sides up to this size use the BLAS path
    CHUNK = 512           # row chunk bounding the (chunk × m) temporaries

    def __init__(self, bundle_ref, *, radius=0.0, how="left",
                 dedup="skip", right_cols=None, geodesic=False,
                 emit_dist: str | None = None):
        self.bundle: PolygonBundle = _resolve_bundle(bundle_ref)
        cx, cy = geomops.flat_centroids(self.bundle.fg)
        self._cx, self._cy = cx, cy
        self.index = GridPointIndex(cx, cy)
        self._point_only = bool((self.bundle.fg.types == _wkb.POINT).all())
        m = len(cx)
        self._brute = m <= self.BRUTE_MAX
        if self._brute and m:
            self._S = np.ascontiguousarray(np.column_stack([cx, cy]).T)
            self._n2 = cx * cx + cy * cy
        if not self._point_only:
            # per-geometry envelope radius around the centroid — the
            # exactness bound for phase-2 candidate expansion (a geometry
            # can only beat distance d if its centroid is within d + rg)
            rg = np.zeros(m)
            for gi in range(m):
                pts = self.bundle.fg.geom_coords(gi)
                if len(pts):
                    rg[gi] = float(np.max(np.hypot(pts[:, 0] - cx[gi],
                                                   pts[:, 1] - cy[gi])))
            self._rg = rg
            self._rg_max = float(rg.max()) if m else 0.0
        self.radius = float(radius)
        self.how = how
        self.dedup = dedup
        self.right_cols = right_cols
        self.geodesic = geodesic
        self.emit_dist = emit_dist
        self._name_map = None

    def _geom_dists_flat(self, px, py, rws, gms):
        """Exact point→geometry boundary distances for flat (row, geom)
        candidate pairs — vectorized over points per geometry."""
        d = np.empty(len(rws))
        for g in np.unique(gms):
            msk = gms == g
            d[msk] = geomops.points_to_geom_dist(
                px[rws[msk]], py[rws[msk]], self.bundle.fg, int(g))
        return d

    def _nearest_brute(self, px, py):
        """Vectorized nearest for broadcast sides ≤ BRUTE_MAX: BLAS
        centroid matmul for candidates, exact refine, and for non-point
        geometries a phase-2 expansion over every geometry whose
        centroid is within best + rg — EXACT (ADVICE round-1 #3: the
        truly nearest large/elongated geometry may not be among the 6
        nearest centroids)."""
        c = len(px)
        m = len(self._cx)
        P = np.column_stack([px, py])
        d2a = (px * px + py * py)[:, None] + self._n2[None, :] \
            - 2.0 * (P @ self._S)
        head = min(m, 8)
        if head < m:
            part = np.sort(np.argpartition(d2a, head - 1, axis=1)[:, :head],
                           axis=1)
        else:
            part = np.broadcast_to(np.arange(m), (c, m)).copy()
        rows = np.arange(c)
        if self._point_only:
            # exact d² on candidates; part is index-ascending so the
            # first min breaks ties by smallest geometry index
            dx = px[:, None] - self._cx[part]
            dy = py[:, None] - self._cy[part]
            sub = dx * dx + dy * dy
            bi = np.argmin(sub, axis=1)
            return part[rows, bi].astype(np.int64), np.sqrt(sub[rows, bi])
        # phase 1: exact boundary distance on the head candidates
        flat_r = np.repeat(rows, head)
        flat_g = part.ravel()
        d1 = self._geom_dists_flat(px, py, flat_r, flat_g).reshape(c, head)
        bi = np.argmin(d1, axis=1)
        best = part[rows, bi].astype(np.int64)
        dbest = d1[rows, bi]
        # phase 2: every geometry whose centroid could still beat dbest
        thr = (dbest[:, None] + self._rg[None, :]) * (1.0 + 1e-9) + 1e-12
        mask = d2a <= thr * thr
        mask[rows, best] = False
        rws, gms = np.nonzero(mask)
        all_r = np.concatenate([rows, rws])
        all_g = np.concatenate([best, gms.astype(np.int64)])
        all_d = np.concatenate(
            [dbest, self._geom_dists_flat(px, py, rws, gms)]) \
            if len(rws) else np.concatenate([dbest, np.empty(0)])
        # per row: min by (distance, geometry index)
        order = np.lexsort((all_g, all_d, all_r))
        first = np.unique(all_r[order], return_index=True)[1]
        sel = order[first]
        out = np.full(c, -1, dtype=np.int64)
        dist = np.full(c, np.inf)
        out[all_r[sel]] = all_g[sel]
        dist[all_r[sel]] = all_d[sel]
        return out, dist

    def _nearest_grid(self, px, py):
        """Fallback for very large broadcast sides: per-row grid ring
        search (phase 1) + exact radius re-query (phase 2)."""
        n = len(px)
        out = np.full(n, -1, dtype=np.int64)
        dist = np.full(n, np.inf)
        for i in range(n):
            ii, dd = self.index.query_knn(float(px[i]), float(py[i]),
                                          k=1 if self._point_only else 6)
            if len(ii) == 0:
                continue
            if self._point_only:
                dxc = px[i] - self._cx[ii]
                dyc = py[i] - self._cy[ii]
                d2c = dxc * dxc + dyc * dyc
                j = int(ii[np.lexsort((ii, d2c))[0]])
                out[i] = j
                dist[i] = float(np.sqrt(d2c.min()))
                continue
            dmin, bestg = np.inf, -1
            for j in sorted(int(v) for v in ii):
                d = float(geomops.points_to_geom_dist(
                    px[i : i + 1], py[i : i + 1], self.bundle.fg, j)[0])
                if d < dmin:
                    dmin, bestg = d, j
            # exact phase 2: all geometries whose centroid is within
            # dmin + rg_max can still beat the candidate
            cand = self.index.query_radius(float(px[i]), float(py[i]),
                                           dmin + self._rg_max + 1e-12)
            for j in sorted(int(v) for v in cand):
                if j == bestg:
                    continue
                if np.hypot(px[i] - self._cx[j], py[i] - self._cy[j]) \
                        > dmin + self._rg[j] + 1e-12:
                    continue
                d = float(geomops.points_to_geom_dist(
                    px[i : i + 1], py[i : i + 1], self.bundle.fg, j)[0])
                if d < dmin or (d == dmin and j < bestg):
                    dmin, bestg = d, j
            out[i], dist[i] = bestg, dmin
        return out, dist

    def _nearest(self, px, py):
        n = len(px)
        out = np.full(n, -1, dtype=np.int64)
        dist = np.full(n, np.inf)
        if n == 0 or len(self._cx) == 0:
            return out, dist
        if self._brute:
            for s in range(0, n, self.CHUNK):
                e = min(n, s + self.CHUNK)
                o, d = self._nearest_brute(px[s:e], py[s:e])
                out[s:e] = o
                dist[s:e] = d
        else:
            out, dist = self._nearest_grid(px, py)
        if self.geodesic:
            ok = out >= 0
            dist[ok] = geomops.haversine(px[ok], py[ok],
                                         self._cx[out[ok]], self._cy[out[ok]])
        return out, dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        px, py = _point_coords(batch)
        gi, dist = self._nearest(px, py)
        if self.radius > 0:
            gi = np.where(dist <= self.radius, gi, -1)
        if self.how == "inner":
            keep = gi >= 0
            batch = batch.take(pa.array(np.nonzero(keep)[0]))
            gi, dist = gi[keep], dist[keep]
        if self._name_map is None:
            right = self.right_cols or self.bundle.attrs.column_names
            self._name_map = _dedup_names(batch.column_names, right, self.dedup)
        cols = dict(zip(batch.column_names, batch.columns))
        null_mask = gi < 0
        take_idx = pa.array(np.where(gi < 0, 0, gi))
        for src, dst in self._name_map:
            col = self.bundle.attrs[src].take(take_idx)
            if null_mask.any():
                col = pc.if_else(pa.array(~null_mask), col.combine_chunks()
                                 if isinstance(col, pa.ChunkedArray) else col, None)
            cols[dst] = col
        if self.emit_dist:
            cols[self.emit_dist] = pa.array(
                np.where(gi < 0, np.nan, dist), pa.float64())
        return pa.table(cols)


def nearest_join(points_ds, join_table: pa.Table, *, radius=0.0,
                 how="left", dedup="skip", right_cols=None,
                 geodesic=False, emit_dist=None,
                 concurrency=None, batch_size: int = 4096):
    ref = put_bundle(join_table)
    return points_ds.map_batches(
        NearestJoiner,
        fn_constructor_kwargs=dict(
            bundle_ref=[ref], radius=radius, how=how, dedup=dedup,
            right_cols=right_cols, geodesic=geodesic, emit_dist=emit_dist,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


# ---------------------------------------------------------------------------
# Co-partitioned cell join (both sides large) with hot-cell salting
# ---------------------------------------------------------------------------

_POLY_GEOM_COL = "__poly_wkb"
_SALT_COL = "__salt"
_RCOL_PREFIX = "__r_"


def _polys_to_cell_rows(batch: pa.Table, *, res: int, nsplit: int,
                        right_cols: list[str], geom_col: str = "geom",
                        salt_map: dict | None = None) -> pa.Table:
    """flat_map: each polygon → one row per covering cell × salt.

    Typed Arrow columns only (WKB geometry + ``__r_`` attr columns) —
    no Python pickling in the shuffle. With a ``salt_map``
    ({cell: nsplit}), only HOT cells replicate the polygon per salt;
    cold cells get a single copy (targeted skew splitting, north_rule).
    """
    fg = _wkb.decode(batch[geom_col].to_pylist())
    take_idx, cells_out, salts = [], [], []
    for i in range(len(fg)):
        cells = hexgrid.cover_geom(fg, i, res)
        for c in cells:
            ns = salt_map.get(int(c), 1) if salt_map is not None else nsplit
            for sl in range(ns):
                take_idx.append(i)
                cells_out.append(c)
                salts.append(sl)
    idx = pa.array(np.asarray(take_idx, dtype=np.int64))
    cols = {
        "cell": pa.array(np.asarray(cells_out, dtype=np.uint64), pa.uint64()),
        _SALT_COL: pa.array(salts, pa.int32()),
        _POLY_GEOM_COL: batch[geom_col].take(idx),
    }
    for rc in right_cols:
        cols[_RCOL_PREFIX + rc] = batch[rc].take(idx)
    return pa.table(cols)


def cell_copartition_join(points_ds, polys_ds, *, res: int = 5,
                          predicate: str = "intersects",
                          nsplit: int = 1,
                          salt_map: dict | None = None,
                          point_cols: list[str] | None = None,
                          right_cols: list[str] | None = None,
                          num_partitions: int | None = None):
    """Large × large PIP/intersects join via groupby-on-cell co-shuffle.

    Returns an inner-join Dataset of point_cols + polygon attr cols.
    Skew handling (north_rule "explicit skew splitting of hot cells"):
    pass ``salt_map`` from :func:`hot_cell_salts` — points in a hot
    cell spread over its salt keys (deterministic hash of the point
    fid/row), the polygon side is replicated once per salt ONLY for hot
    cells. ``nsplit`` > 1 without a map salts every cell uniformly.

    Points must already carry lon/lat + ``cell`` (geocode stage).
    Everything in the shuffle is typed Arrow (WKB binary + native attr
    columns) — zero Python-object serialization.
    """
    point_cols = point_cols or [c for c in points_ds.schema().names
                                if c not in ("html", "text")]
    pschema_in = points_ds.schema()
    rschema_in = polys_ds.schema()
    rnames = right_cols or [n for n in rschema_in.names if n != "geom"]
    # deterministic output schema so empty groups emit typed empties
    out_fields = [(c, pschema_in.types[pschema_in.names.index(c)])
                  for c in point_cols]
    name_map = _dedup_names(point_cols, rnames, "suffix")
    for src, dst in name_map:
        out_fields.append((dst, rschema_in.types[rschema_in.names.index(src)]))
    out_schema = pa.schema(out_fields)
    polys_cells = polys_ds.map_batches(
        lambda b: _polys_to_cell_rows(b, res=res, nsplit=nsplit,
                                      right_cols=rnames, salt_map=salt_map),
        batch_format="pyarrow",
    )

    def _points_prep(batch: pa.Table) -> pa.Table:
        from ..core.fid import hash_ints, hash_strings

        cols = {c: batch[c] for c in point_cols}
        h = np.asarray(batch["cell"].to_numpy(), dtype=np.uint64)
        # deterministic per-ROW salt (content hash, not arrival order)
        if "fid" in batch.column_names:
            rh = hash_strings(batch["fid"])
        else:
            rh = hash_ints(h + np.arange(len(h), dtype=np.uint64))
        if salt_map is not None:
            ns = np.asarray([salt_map.get(int(c), 1) for c in h],
                            dtype=np.uint64)
            salt = (rh % np.maximum(ns, 1)).astype(np.int32)
        elif nsplit > 1:
            salt = (rh % np.uint64(nsplit)).astype(np.int32)
        else:
            salt = np.zeros(len(h), dtype=np.int32)
        cols[_SALT_COL] = pa.array(salt, pa.int32())
        cols[_POLY_GEOM_COL] = pa.array([None] * len(batch), pa.binary())
        for src, _ in name_map:
            cols[_RCOL_PREFIX + src] = pa.nulls(
                len(batch), rschema_in.types[rschema_in.names.index(src)])
        return pa.table(cols)

    points_prep = points_ds.map_batches(_points_prep, batch_format="pyarrow")

    # align schemas for union: polygon rows get nulls for point cols
    pschema = points_prep.schema()

    def _polys_align(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in zip(pschema.names, pschema.types):
            if name in batch.column_names:
                cols[name] = batch[name].cast(typ)
            else:
                cols[name] = pa.nulls(len(batch), typ)
        return pa.table(cols)

    polys_aligned = polys_cells.map_batches(_polys_align, batch_format="pyarrow")
    both = points_prep.union(polys_aligned)

    empty = pa.Table.from_arrays(
        [pa.array([], type=t) for t in out_schema.types], schema=out_schema)

    def _join_group(group: pa.Table) -> pa.Table:
        geom_col_arr = group[_POLY_GEOM_COL]
        is_poly = np.asarray(pc.is_valid(geom_col_arr).to_numpy(
            zero_copy_only=False))
        if not is_poly.any() or is_poly.all():
            return empty
        poly_rows = group.filter(pa.array(is_poly))
        pt_rows = group.filter(pa.array(~is_poly))
        fg = _wkb.decode(poly_rows[_POLY_GEOM_COL].to_pylist())
        bundle = PolygonBundle.__new__(PolygonBundle)
        bundle.fg = fg
        bundle.bboxes = fg.bboxes()
        bundle._stack = False
        index = BBoxIndex(bundle.bboxes)
        px, py = pt_rows["lon"].to_numpy(), pt_rows["lat"].to_numpy()
        pi, gi = _refine_pairs(px, py, bundle, index, predicate)
        if len(pi) == 0:
            return empty
        # pairs are naturally unique: each point lives in exactly one
        # (cell, salt) group; the polygon is replicated to all of them.
        left = pt_rows.select(point_cols).take(pa.array(pi))
        arrays = [left[c].cast(out_schema.field(c).type) for c in point_cols]
        gi_arr = pa.array(gi)
        for src, dst in name_map:
            arrays.append(poly_rows[_RCOL_PREFIX + src].take(gi_arr)
                          .cast(out_schema.field(dst).type).combine_chunks())
        return pa.Table.from_arrays(arrays, schema=out_schema)

    grouped = both.groupby(["cell", _SALT_COL], num_partitions=num_partitions)
    return grouped.map_groups(_join_group, batch_format="pyarrow")


def hot_cell_salts(points_ds, *, hot_threshold: int = 200_000,
                   nsplit: int | None = None,
                   target_group_rows: int | None = None) -> dict[int, int]:
    """Pre-pass: per-cell counts on the slim cell projection → salt map
    for cells exceeding hot_threshold (north_rule skew splitting).

    nsplit fixed, or derived per cell as ceil(count/target_group_rows).

    The > threshold filter runs INSIDE the Dataset (map_batches over the
    count blocks), so the driver materializes only the handful of hot
    cells — at planetary res-7 scale the full per-cell count table is
    ~10⁸ rows and must never cross the driver boundary (round-3 verdict
    nit #3).
    """
    hot = _hot_cells_ds(points_ds, hot_threshold)
    out: dict[int, int] = {}
    for row in hot.iter_rows():
        c = row["count()"]
        if target_group_rows:
            out[int(row["cell"])] = int(np.ceil(c / target_group_rows))
        else:
            out[int(row["cell"])] = nsplit or 8
    return out


def _hot_cells_ds(points_ds, hot_threshold: int):
    """Per-cell counts filtered to count > hot_threshold — distributed;
    only hot rows survive to the driver."""
    import pyarrow.compute as pc

    counts = points_ds.select_columns(["cell"]).groupby("cell").count()

    def _hot(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["count()"],
                                       pa.scalar(hot_threshold)))

    return counts.map_batches(_hot, batch_format="pyarrow")


def slim_join_reattach(result_ds, payload_ds, *, key: str = "fid",
                       num_partitions: int | None = None,
                       payload_cols: list[str] | None = None):
    """Re-attach wide payload columns (html/text) to a slim join result
    by key — hash join, payload never entered the shuffle."""
    from ..core.util import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()
    if payload_cols:
        payload_ds = payload_ds.select_columns([key] + payload_cols)
    return result_ds.join(payload_ds, join_type="inner",
                          num_partitions=num_partitions, on=(key,))
