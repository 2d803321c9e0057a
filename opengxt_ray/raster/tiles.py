"""Tile-table raster model: metadata, rasterize, vectorize, stats.

Reference semantics:
- PointsToRaster: GT/gridcoverage/RasterPointsToRasterOperation.java
  (PointAssignmentType Count/Sum/Mean/MostFrequent…)
- CoverageToPoint: GT/transformation/CoverageToPointFeatureCollection
  .java:58-90 (one point per cell, retainNoData flag)
- StatisticsGridCoverage: GLOBAL stats over cells.

Execution: per-batch partial tile accumulation (np.add.at into dense
tile arrays) → ``groupby(tile_key)`` sum of partials — the scatter is
additive ⇒ associative, so partials combine exactly (SURVEY.md §2.7
"additive ⇒ associative partial sums").
"""

from __future__ import annotations

from ..core.util import default_join_partitions

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray


@dataclass(frozen=True)
class RasterMeta:
    origin_x: float          # left edge
    origin_y: float          # TOP edge
    cell_size: float
    width: int               # columns
    height: int              # rows
    tile_size: int = 256
    nodata: float = float("nan")

    @property
    def tiles_x(self) -> int:
        return (self.width + self.tile_size - 1) // self.tile_size

    @property
    def tiles_y(self) -> int:
        return (self.height + self.tile_size - 1) // self.tile_size

    def world_to_cell(self, x: np.ndarray, y: np.ndarray):
        col = np.floor((x - self.origin_x) / self.cell_size).astype(np.int64)
        row = np.floor((self.origin_y - y) / self.cell_size).astype(np.int64)
        return col, row

    def cell_center(self, col: np.ndarray, row: np.ndarray):
        x = self.origin_x + (col + 0.5) * self.cell_size
        y = self.origin_y - (row + 0.5) * self.cell_size
        return x, y

    def tile_shape(self, tx: int, ty: int) -> tuple[int, int]:
        h = min(self.tile_size, self.height - ty * self.tile_size)
        w = min(self.tile_size, self.width - tx * self.tile_size)
        return h, w

    @staticmethod
    def from_extent(extent, cell_size: float, tile_size: int = 256,
                    nodata: float = float("nan")) -> "RasterMeta":
        minx, miny, maxx, maxy = extent
        width = int(np.ceil((maxx - minx) / cell_size))
        height = int(np.ceil((maxy - miny) / cell_size))
        return RasterMeta(minx, maxy, cell_size, width, height, tile_size,
                          nodata)


def _tile_key(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    return tx.astype(np.int64) * np.int64(1 << 32) + ty.astype(np.int64)


def _unkey(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    tx = key >> np.int64(32)
    ty = key & np.int64((1 << 32) - 1)
    return tx, ty


def partials_from_coo(meta: RasterMeta, rows: np.ndarray, cols: np.ndarray,
                      vals: np.ndarray) -> pa.Table:
    """Scatter COO triplets into per-tile dense partial arrays → tile
    rows. In-bounds filtering included."""
    ts = meta.tile_size
    ok = (cols >= 0) & (cols < meta.width) & (rows >= 0) & (rows < meta.height)
    rows, cols, vals = rows[ok], cols[ok], vals[ok]
    if len(rows) == 0:
        return pa.table({"tkey": pa.array([], pa.int64()),
                         "data": pa.array([], pa.binary())})
    tx = cols // ts
    ty = rows // ts
    key = _tile_key(tx, ty)
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    bounds = np.nonzero(np.diff(key_s))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(key_s)]])
    out_keys, out_blobs = [], []
    for s, e in zip(starts, ends):
        sel = order[s:e]
        k = int(key_s[s])
        txi, tyi = k >> 32, k & 0xFFFFFFFF
        h, w = meta.tile_shape(txi, tyi)
        tile = np.zeros((h, w), dtype=np.float64)
        lr = rows[sel] - tyi * ts
        lc = cols[sel] - txi * ts
        np.add.at(tile, (lr, lc), vals[sel])
        out_keys.append(k)
        out_blobs.append(tile.tobytes())
    return pa.table({"tkey": pa.array(out_keys, pa.int64()),
                     "data": pa.array(out_blobs, pa.binary())})


def reduce_tiles(partials, meta: "RasterMeta | None" = None):
    """groupby(tile) sum of partial tiles → final tile Dataset
    (tx, ty, data). Pass ``meta`` so the pre-groupby coalesce can size
    reduce partitions to the known tile count (no schema-less empty
    sort partitions at toy scale)."""

    def _merge(group: pa.Table) -> pa.Table:
        k = int(group["tkey"][0].as_py())
        acc = None
        for blob in group["data"]:
            arr = np.frombuffer(blob.as_py(), dtype=np.float64)
            acc = arr.copy() if acc is None else acc + arr
        return pa.table({
            "tx": pa.array([k >> 32], pa.int32()),
            "ty": pa.array([k & 0xFFFFFFFF], pa.int32()),
            "data": pa.array([acc.tobytes()], pa.binary()),
        })

    from ..core.util import coalesce_for_groupby, default_shuffle_partitions

    nkeys = meta.tiles_x * meta.tiles_y if meta is not None else None
    partials = coalesce_for_groupby(partials, nkeys)
    return partials.groupby(
        "tkey", num_partitions=default_shuffle_partitions()).map_groups(
        _merge, batch_format="pyarrow")


def points_to_raster(ds, meta: RasterMeta, *, assign: str = "count",
                     value_col: str | None = None,
                     xcol: str = "lon", ycol: str = "lat"):
    """Rasterize points → tile Dataset. assign ∈ {count, sum, mean}.

    mean = sum tiles / count tiles (two accumulators in one pass).
    """

    def _scatter(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        col, row = meta.world_to_cell(x, y)
        if assign == "count" or value_col is None:
            v = np.ones(len(x))
        else:
            v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return partials_from_coo(meta, row, col, v)

    partials = ds.map_batches(_scatter, batch_format="pyarrow")
    tiles = reduce_tiles(partials, meta)
    if assign != "mean":
        return tiles

    def _cnt(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        col, row = meta.world_to_cell(x, y)
        return partials_from_coo(meta, row, col, np.ones(len(x)))

    counts = reduce_tiles(ds.map_batches(_cnt, batch_format="pyarrow"),
                           meta)
    joined = tiles.join(
        counts.map_batches(lambda b: pa.table(
            {"tx": b["tx"], "ty": b["ty"], "cdata": b["data"]}),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=default_join_partitions(), on=("tx", "ty"))

    def _div(batch: pa.Table) -> pa.Table:
        out = []
        for s, c in zip(batch["data"], batch["cdata"]):
            sv = np.frombuffer(s.as_py(), dtype=np.float64)
            cv = np.frombuffer(c.as_py(), dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                out.append(np.where(cv > 0, sv / cv, meta.nodata).tobytes())
        return pa.table({"tx": batch["tx"], "ty": batch["ty"],
                         "data": pa.array(out, pa.binary())})

    return joined.map_batches(_div, batch_format="pyarrow")


def raster_to_points(tiles, meta: RasterMeta, *, drop_nodata: bool = True,
                     drop_zero: bool = False):
    """CoverageToPoint — one row per cell (col, row, x, y, val)."""

    def _explode(batch: pa.Table) -> pa.Table:
        cols_out = {"col": [], "row": [], "x": [], "y": [], "val": []}
        for tx, ty, blob in zip(batch["tx"].to_numpy(), batch["ty"].to_numpy(),
                                batch["data"]):
            h, w = meta.tile_shape(int(tx), int(ty))
            arr = np.frombuffer(blob.as_py(), dtype=np.float64).reshape(h, w)
            lr, lc = np.nonzero(np.ones_like(arr, dtype=bool))
            v = arr[lr, lc]
            keep = np.ones(len(v), dtype=bool)
            if drop_nodata:
                keep &= ~np.isnan(v)
            if drop_zero:
                keep &= v != 0
            lr, lc, v = lr[keep], lc[keep], v[keep]
            gc = lc + tx * meta.tile_size
            gr = lr + ty * meta.tile_size
            x, y = meta.cell_center(gc, gr)
            cols_out["col"].append(gc)
            cols_out["row"].append(gr)
            cols_out["x"].append(x)
            cols_out["y"].append(y)
            cols_out["val"].append(v)
        return pa.table({
            "col": pa.array(np.concatenate(cols_out["col"]) if cols_out["col"] else np.array([], np.int64)),
            "row": pa.array(np.concatenate(cols_out["row"]) if cols_out["row"] else np.array([], np.int64)),
            "x": pa.array(np.concatenate(cols_out["x"]) if cols_out["x"] else np.array([])),
            "y": pa.array(np.concatenate(cols_out["y"]) if cols_out["y"] else np.array([])),
            "val": pa.array(np.concatenate(cols_out["val"]) if cols_out["val"] else np.array([])),
        })

    return tiles.map_batches(_explode, batch_format="pyarrow")


def raster_statistics(tiles, meta: RasterMeta) -> dict:
    """GLOBAL descriptive stats over cells (nodata-aware)."""

    def _partial(batch: pa.Table) -> pa.Table:
        n = s = s2 = 0.0
        mn, mx = np.inf, -np.inf
        for blob in batch["data"]:
            arr = np.frombuffer(blob.as_py(), dtype=np.float64)
            v = arr[~np.isnan(arr)]
            if len(v):
                n += len(v)
                s += float(v.sum())
                s2 += float((v * v).sum())
                mn = min(mn, float(v.min()))
                mx = max(mx, float(v.max()))
        return pa.table({"n": [n], "s": [s], "s2": [s2], "mn": [mn], "mx": [mx]})

    parts = tiles.map_batches(_partial, batch_format="pyarrow")
    import ray.data.aggregate as A

    agg = parts.aggregate(A.Sum("n"), A.Sum("s"), A.Sum("s2"),
                          A.Min("mn"), A.Max("mx"))
    n = agg["sum(n)"]
    mean = agg["sum(s)"] / n if n else 0.0
    var = agg["sum(s2)"] / n - mean ** 2 if n else 0.0
    return {"count": int(n), "sum": agg["sum(s)"], "mean": mean,
            "min": agg["min(mn)"], "max": agg["max(mx)"],
            "std": float(np.sqrt(max(var, 0.0))), "variance": var}


class _TileSampler:
    """Actor stage: broadcast tile dict built once per actor."""

    def __init__(self, tiles_ref, meta: RasterMeta, out_col: str,
                 xcol: str, ycol: str):
        from ..core.broadcast import resolve_state

        self.tiles: dict = resolve_state(tiles_ref)
        self.meta = meta
        self.out_col = out_col
        self.xcol = xcol
        self.ycol = ycol

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = self.meta
        x = batch[self.xcol].to_numpy()
        y = batch[self.ycol].to_numpy()
        col, row = meta.world_to_cell(x, y)
        ts = meta.tile_size
        vals = np.full(len(x), meta.nodata, dtype=np.float64)
        inb = (col >= 0) & (col < meta.width) & (row >= 0) & (row < meta.height)
        tx = col // ts
        ty = row // ts
        key = tx * np.int64(1 << 32) + ty
        order = np.argsort(key, kind="stable")
        start = 0
        ko = key[order]
        for i in range(1, len(order) + 1):
            if i == len(order) or ko[i] != ko[start]:
                sel = order[start:i]
                sel = sel[inb[sel]]
                if len(sel):
                    k = (int(tx[sel[0]]), int(ty[sel[0]]))
                    tile = self.tiles.get(k)
                    if tile is not None:
                        lr = row[sel] - k[1] * ts
                        lc = col[sel] - k[0] * ts
                        vals[sel] = tile[lr, lc]
                start = i
        return batch.append_column(self.out_col, pa.array(vals))


def extract_values_to_points(points_ds, tiles, meta: RasterMeta, *,
                             out_col: str = "raster_val",
                             xcol: str = "lon", ycol: str = "lat",
                             concurrency=None, id_col: str | None = None,
                             max_broadcast_cells: int = 128_000_000):
    """ExtractValuesToPoints (GT/gridcoverage/
    RasterExtractValuesToPointsOperation.java:54-78) — sample the
    raster value under each point.

    Two execution paths chosen by raster size:

    - raster ≤ ``max_broadcast_cells`` (~1 GiB of float64): tiles
      gathered in one bulk ``take_all`` (not a per-row driver loop) and
      broadcast once (``ray.put``); per-batch lookup vectorized per
      touched tile.
    - bigger: co-shuffle — points keyed by (tx, ty) are grouped WITH
      their tile (union + groupby, no per-point tile duplication), each
      group samples locally, and the (id, value) pairs are hash-joined
      back onto the point table. Nothing is ever gathered. This path
      needs a unique ``id_col`` on the point table (the documented
      partitioning assumption — only slim (id, key) rows shuffle).
    """
    import ray

    from ..core.util import default_concurrency

    if meta.width * meta.height > max_broadcast_cells:
        if id_col is None:
            raise ValueError(
                "extract_values_to_points: raster exceeds "
                f"max_broadcast_cells={max_broadcast_cells}; the "
                "co-shuffle scale path needs a unique id_col on the "
                "point table (pass id_col=...)")
        return _extract_values_coshuffle(points_ds, tiles, meta,
                                         out_col=out_col, xcol=xcol,
                                         ycol=ycol, id_col=id_col)
    tile_map: dict = {}
    for r in tiles.take_all():
        h, w = meta.tile_shape(r["tx"], r["ty"])
        tile_map[(r["tx"], r["ty"])] = np.frombuffer(
            r["data"], dtype=np.float64).reshape(h, w)
    from ..core.broadcast import put_broadcast

    ref = put_broadcast(tile_map)
    return points_ds.map_batches(
        _TileSampler,
        fn_constructor_args=([ref], meta, out_col, xcol, ycol),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency())


def _extract_values_coshuffle(points_ds, tiles, meta: RasterMeta, *,
                              out_col: str, xcol: str, ycol: str,
                              id_col: str):
    """Scale path: union(point-keys, tiles) → groupby(tile) sample →
    hash-join values back by ``id_col``. The wide point payload never
    enters the shuffle (slim (id, tile-key, cell) rows only); a tile is
    never duplicated per point (one tile row joins its point group)."""
    from ..core.util import default_join_partitions, \
        default_shuffle_partitions

    def _keys(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        col, row = meta.world_to_cell(x, y)
        inb = ((col >= 0) & (col < meta.width)
               & (row >= 0) & (row < meta.height))
        ts = meta.tile_size
        return pa.table({
            "tx": pa.array(np.where(inb, col // ts, -1).astype(np.int64)),
            "ty": pa.array(np.where(inb, row // ts, -1).astype(np.int64)),
            "col": pa.array(col.astype(np.int64)),
            "row": pa.array(row.astype(np.int64)),
            "__evp_id": batch[id_col].cast(pa.int64()),
            "__evp_tile": pa.array(np.zeros(batch.num_rows, np.int8)),
            "data": pa.array([None] * batch.num_rows, pa.binary()),
        })

    keys = points_ds.map_batches(_keys, batch_format="pyarrow")
    tiles_u = tiles.map_batches(
        lambda b: pa.table({
            "tx": b["tx"].cast(pa.int64()), "ty": b["ty"].cast(pa.int64()),
            "col": pa.array(np.full(b.num_rows, -1, np.int64)),
            "row": pa.array(np.full(b.num_rows, -1, np.int64)),
            "__evp_id": pa.array(np.full(b.num_rows, -1, np.int64)),
            "__evp_tile": pa.array(np.ones(b.num_rows, np.int8)),
            "data": b["data"],
        }), batch_format="pyarrow")

    def _sample(group: pa.Table) -> pa.Table:
        is_tile = group["__evp_tile"].to_numpy(zero_copy_only=False) == 1
        is_pt = ~is_tile
        if not is_pt.any():
            return pa.table({"__evp_id": pa.array([], pa.int64()),
                             out_col: pa.array([], pa.float64())})
        ids = group["__evp_id"].to_numpy(zero_copy_only=False)[is_pt]
        vals = np.full(int(is_pt.sum()), meta.nodata, dtype=np.float64)
        tile_rows = np.nonzero(is_tile)[0]
        tx = int(group["tx"][0].as_py())
        ty = int(group["ty"][0].as_py())
        if len(tile_rows) and tx >= 0:
            h, w = meta.tile_shape(tx, ty)
            arr = np.frombuffer(group["data"][int(tile_rows[0])].as_py(),
                                np.float64).reshape(h, w)
            ts = meta.tile_size
            lr = group["row"].to_numpy(zero_copy_only=False)[is_pt] - ty * ts
            lc = group["col"].to_numpy(zero_copy_only=False)[is_pt] - tx * ts
            vals = arr[lr, lc]
        return pa.table({"__evp_id": pa.array(ids),
                         out_col: pa.array(vals, pa.float64())})

    sampled = keys.union(tiles_u).groupby(
        ["tx", "ty"], num_partitions=default_shuffle_partitions()) \
        .map_groups(_sample, batch_format="pyarrow")
    id_type = points_ds.schema().base_schema.field(id_col).type
    sampled = sampled.map_batches(
        lambda b: pa.table({id_col: b["__evp_id"].cast(id_type),
                            out_col: b[out_col]}),
        batch_format="pyarrow")
    return points_ds.join(sampled, join_type="inner",
                          num_partitions=default_join_partitions(),
                          on=(id_col,))


def raster_profile(tiles, meta: RasterMeta, line_wkb: bytes, *,
                   distance: float, concurrency=None):
    """RasterProfile — sample the surface every `distance` along a line
    (points-along-line + extract-values compose)."""
    import ray

    from ..core import wkb as _wkbmod
    from ..stages.transforms import calculate_xy  # noqa: F401 (doc link)
    from ..ops.lineops import split_line_by_distance  # noqa: F401

    fg = _wkbmod.decode([line_wkb])
    r = fg.geom_coords(0)
    seg = np.diff(r, axis=0)
    cum = np.concatenate([[0.0], np.cumsum(np.hypot(seg[:, 0], seg[:, 1]))])
    total = cum[-1]
    pos = np.arange(0.0, total + 1e-9, distance)
    px = np.interp(pos, cum, r[:, 0])
    py = np.interp(pos, cum, r[:, 1])
    pts = ray.data.from_arrow(pa.table({
        "station": pa.array(pos), "lon": pa.array(px), "lat": pa.array(py)}))
    return extract_values_to_points(pts, tiles, meta, concurrency=concurrency)
