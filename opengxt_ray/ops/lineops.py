"""Line-based operators: hub lines, snapping, line intersections,
per-polygon line-length sums, split-by-distance, extend/trim.

Reference (SURVEY.md §2.3):
- HubLinesByDistance/ByID: GT/operations/HubLines*Operation.java —
  link each spoke to its nearest (or keyed) hub as a LineString.
- SnapPointsToLines: GT/operations/SnapPointsToLinesOperation.java —
  move each point to the closest location on the nearest line.
- IntersectionPoints: GT/operations/IntersectionPointsOperation.java —
  crossing points of two line layers.
- SumLineLength: GT/operations/CalculateSumLineLengthOperation.java —
  per polygon, total clipped length of lines inside.
- SplitLineByDistance / ExtendLine / TrimLine.

Execution: broadcast line/hub side in actor pools (lines are typically
the small side); the polygon×line length sum uses the broadcast PIP
machinery with segment clipping.
"""

from __future__ import annotations

from ..core.util import default_join_partitions

import numpy as np
import pyarrow as pa

import ray

from ..core import geomops, wkb as _wkb
from ..core.util import default_concurrency
from ..ops.join import PolygonBundle, _resolve_bundle, put_bundle


class _LineBundle:
    """Broadcastable flat segment soup of a line table."""

    def __init__(self, table: pa.Table, geom_col: str = "geom",
                 id_col: str | None = None):
        fg = _wkb.decode(table[geom_col].to_pylist())
        segs_a, segs_b, owner = [], [], []
        for i in range(len(fg)):
            for r, _ in fg.rings(i):
                if len(r) < 2:
                    continue
                segs_a.append(r[:-1])
                segs_b.append(r[1:])
                owner.append(np.full(len(r) - 1, i, dtype=np.int64))
        self.a = np.concatenate(segs_a) if segs_a else np.empty((0, 2))
        self.b = np.concatenate(segs_b) if segs_b else np.empty((0, 2))
        self.owner = np.concatenate(owner) if owner else np.empty(0, np.int64)
        self.ids = (table[id_col].to_numpy(zero_copy_only=False)
                    if id_col else np.arange(len(fg)))


def snap_points_to_lines(points_ds, lines_table: pa.Table, *,
                         geom_col: str = "geom", line_id_col=None,
                         max_distance: float = np.inf,
                         concurrency=None):
    """Move each point to the nearest location on the nearest line.
    Appends snapped coords + distance + line id."""
    from ..core.broadcast import put_broadcast

    # restart-safe broadcast token (ray#53727 — see core/broadcast.py)
    tok = put_broadcast(_LineBundle(lines_table, geom_col, line_id_col))

    class Snapper:
        def __init__(self, ref):
            from ..core.broadcast import resolve_state

            self.lb: _LineBundle = resolve_state(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lb = self.lb
            x = batch["lon"].to_numpy()
            y = batch["lat"].to_numpy()
            n = len(x)
            sx = np.empty(n)
            sy = np.empty(n)
            sd = np.empty(n)
            sid = np.empty(n, dtype=np.int64)
            ax, ay = lb.a[:, 0], lb.a[:, 1]
            bx, by = lb.b[:, 0], lb.b[:, 1]
            dx, dy = bx - ax, by - ay
            seg2 = dx * dx + dy * dy
            CH = 1024
            for c0 in range(0, n, CH):
                px = x[c0 : c0 + CH, None]
                py = y[c0 : c0 + CH, None]
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = ((px - ax) * dx + (py - ay) * dy) / seg2
                t = np.where(seg2 == 0, 0.0, np.clip(t, 0, 1))
                cx = ax + t * dx
                cy = ay + t * dy
                d = np.hypot(px - cx, py - cy)
                j = np.argmin(d, axis=1)
                rows = np.arange(len(j))
                sx[c0 : c0 + CH] = cx[rows, j]
                sy[c0 : c0 + CH] = cy[rows, j]
                sd[c0 : c0 + CH] = d[rows, j]
                sid[c0 : c0 + CH] = lb.ids[lb.owner[j]]
            ok = sd <= max_distance
            out = batch.append_column("snap_x", pa.array(np.where(ok, sx, x)))
            out = out.append_column("snap_y", pa.array(np.where(ok, sy, y)))
            out = out.append_column("snap_dist", pa.array(sd))
            return out.append_column("line_id", pa.array(sid))

    return points_ds.map_batches(
        Snapper, fn_constructor_args=(tok,), batch_format="pyarrow",
        concurrency=concurrency or default_concurrency())


def hub_lines(points_ds, hubs_table: pa.Table, *, hub_id_col: str,
              hub_xy=("lon", "lat"), by: str = "distance",
              key_col: str | None = None, concurrency=None):
    """HubLinesByDistance (nearest hub) / ByID (key match) — emits link
    LineStrings + length."""
    hx = hubs_table[hub_xy[0]].to_numpy()
    hy = hubs_table[hub_xy[1]].to_numpy()
    hid = hubs_table[hub_id_col].to_numpy(zero_copy_only=False)
    if by == "id":
        lookup = {k: i for i, k in enumerate(hid)}
    ref = ray.put((hid, hx, hy))

    def _link(batch: pa.Table) -> pa.Table:
        ids, xs, ys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        x = batch["lon"].to_numpy()
        y = batch["lat"].to_numpy()
        if by == "distance":
            d2 = (x[:, None] - xs[None, :]) ** 2 + (y[:, None] - ys[None, :]) ** 2
            j = np.argmin(d2, axis=1)
        else:
            keys = batch[key_col].to_numpy(zero_copy_only=False)
            j = np.asarray([lookup.get(k, -1) for k in keys])
        ok = j >= 0
        jj = np.where(ok, j, 0)
        geoms = [
            _wkb.encode_linestring(np.array([[x[i], y[i]], [xs[jj[i]], ys[jj[i]]]]))
            if ok[i] else None
            for i in range(len(x))
        ]
        out = batch.append_column("hub_id", pa.array(
            np.where(ok, ids[jj], None)))
        out = out.append_column("link_geom", pa.array(geoms, pa.binary()))
        return out.append_column("link_len", pa.array(
            np.where(ok, np.hypot(x - xs[jj], y - ys[jj]), np.nan)))

    return points_ds.map_batches(_link, batch_format="pyarrow")


def intersection_points(lines_a: pa.Table, lines_b_ds, *,
                        geom_col: str = "geom", concurrency=None):
    """Crossing points of broadcast line layer A × streamed layer B."""
    ref = ray.put(_LineBundle(lines_a, geom_col))

    def _cross(batch: pa.Table) -> pa.Table:
        lb: _LineBundle = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        fg = _wkb.decode(batch[geom_col].to_pylist())
        xs_out, ys_out, ia_out, ib_out = [], [], [], []
        for i in range(len(fg)):
            for r, _ in fg.rings(i):
                if len(r) < 2:
                    continue
                xs, ys, ia, _ = geomops.segment_intersections(
                    lb.a, lb.b, r[:-1], r[1:])
                xs_out.append(xs)
                ys_out.append(ys)
                ia_out.append(lb.ids[lb.owner[ia]])
                ib_out.append(np.full(len(xs), i, dtype=np.int64))
        if not xs_out:
            return pa.table({"x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "line_a": pa.array([], pa.int64()),
                             "line_b": pa.array([], pa.int64())})
        return pa.table({
            "x": pa.array(np.concatenate(xs_out)),
            "y": pa.array(np.concatenate(ys_out)),
            "line_a": pa.array(np.concatenate(ia_out)),
            "line_b": pa.array(np.concatenate(ib_out)),
        })

    return lines_b_ds.map_batches(_cross, batch_format="pyarrow",
                                  concurrency=concurrency or default_concurrency())


def _clip_segments_to_polygon(a: np.ndarray, b: np.ndarray,
                              bundle: PolygonBundle, gi: int) -> float:
    """Total length of segments (a→b) inside polygon gi (sampling the
    crossing parameters exactly via segment×edge intersection)."""
    total = 0.0
    for k in range(len(a)):
        p, q = a[k], b[k]
        seglen = float(np.hypot(*(q - p)))
        if seglen == 0:
            continue
        # crossing parameters along the segment
        ts = [0.0, 1.0]
        for ring, _ in bundle.fg.rings(gi):
            if len(ring) < 2:
                continue
            xs, ys, ia, ib = geomops.segment_intersections(
                p[None, :], q[None, :], ring[:-1], ring[1:])
            if len(xs):
                # crossing parameter via projection (exact for on-segment pts)
                t = ((xs - p[0]) * (q[0] - p[0]) + (ys - p[1]) * (q[1] - p[1])) \
                    / (seglen * seglen)
                ts.extend(np.atleast_1d(t).tolist())
        ts = np.clip(sorted(set(ts)), 0, 1)
        mids_t = (np.asarray(ts[:-1]) + np.asarray(ts[1:])) / 2
        mx = p[0] + mids_t * (q[0] - p[0])
        my = p[1] + mids_t * (q[1] - p[1])
        inside = geomops.points_in_geom(mx, my, bundle.fg, gi)
        dt = np.diff(ts)
        total += float(np.sum(dt[inside]) * seglen)
    return total


def sum_line_length(lines_ds, polys_table: pa.Table, *, poly_key: str,
                    geom_col: str = "geom", concurrency=None):
    """Per-polygon sum of clipped line lengths
    (CalculateSumLineLengthOperation). Output: polygon attrs + length."""
    ref = put_bundle(polys_table)

    class Clipper:
        def __init__(self, bref):
            self.bundle = _resolve_bundle(bref)
            self.index = self.bundle.build_index()

        def __call__(self, batch: pa.Table) -> pa.Table:
            fg = _wkb.decode(batch[geom_col].to_pylist())
            keys, lens = [], []
            for i in range(len(fg)):
                pts = fg.geom_coords(i)
                if len(pts) < 2:
                    continue
                bbox = np.array([pts[:, 0].min(), pts[:, 1].min(),
                                 pts[:, 0].max(), pts[:, 1].max()])
                cands = self.index.query_bbox(bbox)
                for g in cands:
                    seg_total = 0.0
                    for r, _ in fg.rings(i):
                        if len(r) < 2:
                            continue
                        seg_total += _clip_segments_to_polygon(
                            r[:-1], r[1:], self.bundle, int(g))
                    if seg_total > 0:
                        keys.append(self.bundle.attrs[poly_key][int(g)].as_py())
                        lens.append(seg_total)
            return pa.table({poly_key: pa.array(keys),
                             "__len": pa.array(lens, pa.float64())})

    partial = lines_ds.map_batches(
        Clipper, fn_constructor_args=([ref],), batch_format="pyarrow",
        concurrency=concurrency or default_concurrency())
    agg = partial.groupby(poly_key).aggregate(ray.data.aggregate.Sum("__len"))
    key_type = polys_table.schema.field(poly_key).type
    agg = agg.map_batches(
        lambda b: pa.table({poly_key: b[poly_key].cast(key_type),
                            "sum_length": b["sum(__len)"]}),
        batch_format="pyarrow")
    polys = ray.data.from_arrow(polys_table.drop_columns([geom_col]))
    out = polys.join(agg, join_type="left_outer", num_partitions=default_join_partitions(),
                     on=(poly_key,))
    import pyarrow.compute as pc

    return out.map_batches(
        lambda b: b.set_column(b.column_names.index("sum_length"),
                               "sum_length",
                               pc.coalesce(b["sum_length"].combine_chunks(),
                                           pa.scalar(0.0))),
        batch_format="pyarrow")


def split_line_by_distance(batch: pa.Table, *, distance: float,
                           geom_col: str = "geom") -> pa.Table:
    """SplitLineByDistance — cut each line into pieces of length
    `distance` (1→N, ``piece_idx``)."""
    fg = _wkb.decode(batch[geom_col].to_pylist())
    take, geoms, pidx = [], [], []
    for i in range(len(fg)):
        for r, _ in fg.rings(i):
            if len(r) < 2:
                continue
            seg = np.diff(r, axis=0)
            cum = np.concatenate([[0.0], np.cumsum(np.hypot(seg[:, 0], seg[:, 1]))])
            total = cum[-1]
            if total == 0:
                continue
            cuts = np.arange(0.0, total, distance)
            allpos = np.unique(np.concatenate([cum, cuts, [total]]))
            # exact interpolation of coordinates at every position
            px = np.interp(allpos, cum, r[:, 0])
            py = np.interp(allpos, cum, r[:, 1])
            n_pieces = max(1, int(np.ceil(total / distance)))
            for pi in range(n_pieces):
                d0, d1 = pi * distance, min((pi + 1) * distance, total)
                m = (allpos >= d0 - 1e-12) & (allpos <= d1 + 1e-12)
                piece = np.column_stack([px[m], py[m]])
                if len(piece) >= 2:
                    take.append(i)
                    pidx.append(pi)
                    geoms.append(_wkb.encode_linestring(piece))
    out = batch.take(pa.array(take))
    gi = out.column_names.index(geom_col)
    out = out.set_column(gi, geom_col, pa.array(geoms, pa.binary()))
    return out.append_column("piece_idx", pa.array(pidx, pa.int32()))


def extend_line(batch: pa.Table, *, length: float,
                geom_col: str = "geom") -> pa.Table:
    """ExtendLine — extend both ends along the end-segment directions."""
    fg = _wkb.decode(batch[geom_col].to_pylist())
    geoms = []
    for i in range(len(fg)):
        rings = []
        for r, _ in fg.rings(i):
            if len(r) < 2:
                rings.append(r)
                continue
            d0 = r[0] - r[1]
            d1 = r[-1] - r[-2]
            n0 = np.linalg.norm(d0)
            n1 = np.linalg.norm(d1)
            first = r[0] + (d0 / n0 * length if n0 > 0 else 0)
            last = r[-1] + (d1 / n1 * length if n1 > 0 else 0)
            rings.append(np.vstack([first, r, last]))
        geoms.append(_wkb.encode_linestring(rings[0]) if len(rings) == 1
                     else _wkb.encode_multilinestring(rings))
    gi = batch.column_names.index(geom_col)
    return batch.set_column(gi, geom_col, pa.array(geoms, pa.binary()))


def trim_line(batch: pa.Table, *, length: float,
              geom_col: str = "geom") -> pa.Table:
    """TrimLine — remove `length` from both ends."""
    fg = _wkb.decode(batch[geom_col].to_pylist())
    geoms = []
    for i in range(len(fg)):
        rings = []
        for r, _ in fg.rings(i):
            if len(r) < 2:
                rings.append(r)
                continue
            seg = np.diff(r, axis=0)
            cum = np.concatenate([[0.0], np.cumsum(np.hypot(seg[:, 0], seg[:, 1]))])
            total = cum[-1]
            if total <= 2 * length:
                rings.append(r[:1])
                continue
            allpos = np.unique(np.concatenate(
                [cum[(cum > length) & (cum < total - length)],
                 [length, total - length]]))
            px = np.interp(allpos, cum, r[:, 0])
            py = np.interp(allpos, cum, r[:, 1])
            piece = np.column_stack([px, py])
            rings.append(piece if len(piece) >= 2 else r[:1])
        rings = [r for r in rings if len(r) >= 2]
        geoms.append(_wkb.encode_linestring(rings[0]) if len(rings) == 1
                     else (_wkb.encode_multilinestring(rings) if rings else None))
    mask = [g is not None for g in geoms]
    out = batch.filter(pa.array(mask))
    gi = out.column_names.index(geom_col)
    return out.set_column(gi, geom_col,
                          pa.array([g for g in geoms if g is not None],
                                   pa.binary()))


# ---------------------------------------------------------------------------
# PointsToLine
# ---------------------------------------------------------------------------

def _quadratic_bezier_chain(coords: np.ndarray, *, quality: int = 24,
                            offset_degree: float = 25.0,
                            fraction: float = 0.75) -> np.ndarray:
    """Segment-wise quadratic Bezier smoothing of a vertex chain.

    Mirrors GT/util/BezierCurve.java:98-117 (useSegment=true): each
    segment p0→p1 gets a control point at angle(p0,p1)+offset_degree,
    radius len*fraction from p0, and is replaced by `quality` samples at
    t = 0, 1/q, …, (q-1)/q (the reference's loop excludes t=1, so the
    curve ends at the last sample of the final segment, not at p1).
    """
    if len(coords) < 2:
        return coords
    p0 = coords[:-1]
    p1 = coords[1:]
    d = p1 - p0
    seg_len = np.hypot(d[:, 0], d[:, 1])
    ang = np.arctan2(d[:, 1], d[:, 0]) + np.deg2rad(offset_degree)
    cx = p0[:, 0] + np.cos(ang) * seg_len * fraction
    cy = p0[:, 1] + np.sin(ang) * seg_len * fraction
    t = (np.arange(quality, dtype=np.float64) / quality)[None, :]  # (1, q)
    # (nseg, q) sample grids, quadratic Bezier basis
    bx = ((1 - t) ** 2 * p0[:, 0:1] + (2 - 2 * t) * t * cx[:, None]
          + t * t * p1[:, 0:1])
    by = ((1 - t) ** 2 * p0[:, 1:2] + (2 - 2 * t) * t * cy[:, None]
          + t * t * p1[:, 1:2])
    out = np.column_stack([bx.ravel(), by.ravel()])
    keep = np.ones(len(out), dtype=bool)
    keep[1:] = np.any(out[1:] != out[:-1], axis=1)
    return out[keep]


def _geodesic_chain(coords: np.ndarray, *, num_points: int = 100) -> np.ndarray:
    """Replace each lon/lat segment with a great-circle path.

    Reference: GT/util/GeodeticBuilder.java:146-186 (getGeodeticPath,
    numPoints=100 default) — the reference walks the ellipsoid with
    GeodeticCalculator; this is the spherical great-circle equivalent
    (slerp between unit vectors), endpoints exact.
    """
    if len(coords) < 2:
        return coords
    pieces = []
    lam = np.deg2rad(coords[:, 0])
    phi = np.deg2rad(coords[:, 1])
    v = np.column_stack([np.cos(phi) * np.cos(lam),
                         np.cos(phi) * np.sin(lam),
                         np.sin(phi)])
    for i in range(len(coords) - 1):
        a, b = v[i], v[i + 1]
        omega = np.arccos(np.clip(np.dot(a, b), -1.0, 1.0))
        if omega < 1e-12:
            pieces.append(coords[i:i + 1])
            continue
        t = np.linspace(0.0, 1.0, num_points + 2)[:-1, None]  # drop dup end
        p = (np.sin((1 - t) * omega) * a + np.sin(t * omega) * b) / np.sin(omega)
        lon = np.rad2deg(np.arctan2(p[:, 1], p[:, 0]))
        lat = np.rad2deg(np.arcsin(np.clip(p[:, 2] / np.linalg.norm(p, axis=1),
                                           -1.0, 1.0)))
        seg = np.column_stack([lon, lat])
        seg[0] = coords[i]  # endpoints exact
        pieces.append(seg)
    pieces.append(coords[-1:])
    out = np.concatenate(pieces)
    keep = np.ones(len(out), dtype=bool)
    keep[1:] = np.any(out[1:] != out[:-1], axis=1)
    return out[keep]


def points_to_line(ds, *, line_field: str | None = None,
                   sort_field: str | None = None, close_line: bool = False,
                   use_bezier: bool = False, geodesic: bool = False,
                   geom_col: str = "geom", bezier_quality: int = 24,
                   bezier_offset_degree: float = 25.0,
                   bezier_fraction: float = 0.75,
                   geodesic_num_points: int = 100):
    """PointsToLine — connect point features into one line per group.

    Reference: GT/operations/PointsToLineOperation.java:92-233 +
    GT/PointsToLineProcess.java. Semantics replicated:

    - group by ``line_field`` (features with a NULL group value are
      skipped, :92-160 getUniqueValues); no line_field → single line;
    - within a group, ascending sort by ``sort_field`` (stable);
    - each feature contributes its FIRST coordinate
      (``geometry.getCoordinate()``, :188); empty geometries skipped;
    - consecutive duplicate coordinates collapsed
      (``CoordinateList.add(c, false)``, :188);
    - groups with ≤1 coords — or <3 when ``close_line`` — emit nothing
      (:194);
    - ``close_line`` appends the first coordinate when the chain is open
      and emits a Polygon (:200-223); otherwise a LineString;
    - optional segment-wise quadratic Bezier smoothing (ignored when
      ``geodesic``, :207) and great-circle densification (:212);
    - output schema: geom + line_field + ``length`` (geometry length —
      ring perimeter for the closed case, :230).

    Ray shape: hash-shuffle ``groupby(line_field).map_groups`` — each
    group is one output row, so the shuffle moves only (group key, sort
    key, first-coord) triples' worth of payload per point. Scale note:
    a single group's points must fit in one map_groups task (a GPS
    track, not the whole corpus).
    """
    import pyarrow.compute as pc

    from ..core.util import default_shuffle_partitions

    if line_field is not None:
        ds = ds.map_batches(
            lambda b: b.filter(pc.is_valid(b[line_field])),
            batch_format="pyarrow")

    def _empty(group: pa.Table) -> pa.Table:
        arrs = [pa.array([], pa.binary())]
        names = [geom_col]
        if line_field is not None:
            arrs.append(group[line_field].slice(0, 0).combine_chunks())
            names.append(line_field)
        arrs.append(pa.array([], pa.float64()))
        names.append("length")
        return pa.table(arrs, names=names)

    def _build(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty(group)
        if sort_field is not None:
            order = np.argsort(
                group[sort_field].to_numpy(zero_copy_only=False),
                kind="stable")
            group = group.take(pa.array(order))
        fg = _wkb.decode(group[geom_col].to_pylist())
        po, ro = fg.part_offsets, fg.ring_offsets
        start = ro[po[:-1]]
        end = ro[po[1:]]
        valid = end > start
        coords = fg.coords[start[valid]]
        if len(coords):
            keep = np.ones(len(coords), dtype=bool)
            keep[1:] = np.any(coords[1:] != coords[:-1], axis=1)
            coords = coords[keep]
        if len(coords) <= 1 or (close_line and len(coords) < 3):
            return _empty(group)
        if close_line and np.any(coords[0] != coords[-1]):
            coords = np.vstack([coords, coords[:1]])
        if use_bezier and not geodesic:
            coords = _quadratic_bezier_chain(
                coords, quality=bezier_quality,
                offset_degree=bezier_offset_degree,
                fraction=bezier_fraction)
        if geodesic:
            coords = _geodesic_chain(coords, num_points=geodesic_num_points)
        dx = np.diff(coords[:, 0])
        dy = np.diff(coords[:, 1])
        # JTS getLength accumulates sqrt(dx*dx+dy*dy) (not hypot)
        length = float(np.sum(np.sqrt(dx * dx + dy * dy)))
        if close_line:
            ring = coords if np.all(coords[0] == coords[-1]) \
                else np.vstack([coords, coords[:1]])
            geom = _wkb.encode_polygon(ring)
        else:
            geom = _wkb.encode_linestring(coords)
        arrs = [pa.array([geom], pa.binary())]
        names = [geom_col]
        if line_field is not None:
            arrs.append(group[line_field].slice(0, 1).combine_chunks())
            names.append(line_field)
        arrs.append(pa.array([length], pa.float64()))
        names.append("length")
        return pa.table(arrs, names=names)

    if line_field is None:
        ds = ds.map_batches(
            lambda b: b.append_column("__ptl_k", pa.array(
                np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow")
        grouped = ds.groupby("__ptl_k")
        return grouped.map_groups(
            lambda g: _build(g.drop_columns(["__ptl_k"])),
            batch_format="pyarrow")
    return ds.groupby(line_field,
                      num_partitions=default_shuffle_partitions()) \
        .map_groups(_build, batch_format="pyarrow")
