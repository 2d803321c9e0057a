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
    ref = ray.put(_LineBundle(lines_table, geom_col, line_id_col))

    class Snapper:
        def __init__(self, ref):
            if isinstance(ref, list):
                ref = ref[0]
            self.lb: _LineBundle = ray.get(ref) if isinstance(
                ref, ray.ObjectRef) else ref

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
        Snapper, fn_constructor_args=([ref],), batch_format="pyarrow",
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
