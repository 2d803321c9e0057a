"""Vector → raster bridges.

Reference semantics:
- FeaturesToRaster: GT/gridcoverage/RasterFeaturesToRasterOperation.java
  (~481 LoC) — burn a feature attribute into the grid; cell coverage by
  CELL-CENTER containment for polygons, traversal for lines, direct
  assignment for points.
- GeometryToRaster: GT/gridcoverage/GeometryToRasterOperation.java
  (~317 LoC) — single-geometry convenience with a constant value.

Ray-Data-first execution: per-batch COO scatter into NaN-initialized
per-tile partials (NaN = untouched), ``groupby(tile)`` NaN-aware
reduce. Overlap resolution must be ASSOCIATIVE to distribute, so the
supported assigns are {max, min, sum, count} (the reference's
last-feature-wins is order-dependent and unreproducible under parallel
block execution — same determinism argument as core/fid.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import geomops, wkb as _wkb
from .tiles import RasterMeta, _tile_key


_ASSIGNS = ("max", "min", "sum", "count")


def _scatter_tiles(meta: RasterMeta, rows, cols, vals, assign: str) -> pa.Table:
    """COO → per-tile dense partials. Untouched cells are NaN."""
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
        tile = np.full((h, w), np.nan)
        lr = rows[sel] - tyi * ts
        lc = cols[sel] - txi * ts
        if assign in ("sum", "count"):
            touched = np.zeros((h, w), dtype=bool)
            touched[lr, lc] = True
            tile[touched] = 0.0
            np.add.at(tile, (lr, lc), vals[sel])
        elif assign == "max":
            np.fmax.at(tile, (lr, lc), vals[sel])
        else:
            np.fmin.at(tile, (lr, lc), vals[sel])
        out_keys.append(k)
        out_blobs.append(tile.tobytes())
    return pa.table({"tkey": pa.array(out_keys, pa.int64()),
                     "data": pa.array(out_blobs, pa.binary())})


def _reduce_tiles_nan(partials, meta: RasterMeta, assign: str):
    """groupby(tile) NaN-aware reduce → (tx, ty, data)."""

    def _merge(group: pa.Table) -> pa.Table:
        k = int(group["tkey"][0].as_py())
        acc = None
        for blob in group["data"]:
            arr = np.frombuffer(blob.as_py(), dtype=np.float64)
            if acc is None:
                acc = arr.copy()
            elif assign == "max":
                acc = np.fmax(acc, arr)
            elif assign == "min":
                acc = np.fmin(acc, arr)
            else:
                acc = np.where(np.isnan(acc), arr,
                               np.where(np.isnan(arr), acc, acc + arr))
        if not np.isnan(meta.nodata):
            acc = np.where(np.isnan(acc), meta.nodata, acc)
        return pa.table({
            "tx": pa.array([k >> 32], pa.int32()),
            "ty": pa.array([k & 0xFFFFFFFF], pa.int32()),
            "data": pa.array([acc.tobytes()], pa.binary()),
        })

    from ..core.util import default_shuffle_partitions

    return partials.groupby(
        "tkey", num_partitions=default_shuffle_partitions()).map_groups(
        _merge, batch_format="pyarrow")


def _covered_cells(fg, gi: int, meta: RasterMeta, bboxes) -> tuple:
    """(rows, cols) covered by geometry gi.

    Polygons: cell-center containment over the bbox window (vectorized
    points_in_geom per feature). Lines: segments sampled at cell/2
    steps, cells deduped. Points: direct assignment.
    """
    t = fg.types[gi]
    cs = meta.cell_size
    if t == _wkb.POINT:
        pts = fg.geom_coords(gi)
        col, row = meta.world_to_cell(pts[:, 0], pts[:, 1])
        return row, col
    if t == _wkb.LINESTRING:
        cells = []
        for r, _ in fg.rings(gi):
            seg = geomops.densify(r, cs * 0.5)
            col, row = meta.world_to_cell(seg[:, 0], seg[:, 1])
            # in-extent filter BEFORE packing: off-grid negative rows/
            # cols would alias under the shift (offset-before-shift rule)
            ok = (col >= 0) & (col < meta.width) & \
                 (row >= 0) & (row < meta.height)
            cells.append(row[ok] * np.int64(1 << 31) + col[ok])
        u = np.unique(np.concatenate(cells)) if cells else np.empty(0, np.int64)
        return u >> np.int64(31), u & np.int64((1 << 31) - 1)
    # polygon: candidate window from bbox, refine by center containment
    minx, miny, maxx, maxy = bboxes[gi]
    c0 = max(int(np.floor((minx - meta.origin_x) / cs)), 0)
    c1 = min(int(np.floor((maxx - meta.origin_x) / cs)), meta.width - 1)
    r0 = max(int(np.floor((meta.origin_y - maxy) / cs)), 0)
    r1 = min(int(np.floor((meta.origin_y - miny) / cs)), meta.height - 1)
    if c1 < c0 or r1 < r0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cc, rr = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
    cc = cc.ravel()
    rr = rr.ravel()
    px, py = meta.cell_center(cc, rr)
    inside = geomops.points_in_geom(px, py, fg, gi)
    return rr[inside], cc[inside]


def rasterize_features(ds, meta: RasterMeta, *, value_col: str | None = None,
                       assign: str = "max", geom_col: str = "geom",
                       default_value: float = 1.0):
    """FeaturesToRaster — burn features into a tile Dataset
    (tx, ty, data); uncovered cells are nodata."""
    if assign not in _ASSIGNS:
        raise ValueError(f"assign must be one of {_ASSIGNS}")

    def _burn(batch: pa.Table) -> pa.Table:
        fg = _wkb.decode(batch[geom_col].to_pylist())
        bboxes = fg.bboxes()
        if assign == "count" or value_col is None:
            vals = np.full(len(fg), default_value)
        else:
            vals = batch[value_col].to_numpy(
                zero_copy_only=False).astype(np.float64)
        rows_l, cols_l, vals_l = [], [], []
        for i in range(len(fg)):
            r, c = _covered_cells(fg, i, meta, bboxes)
            if len(r):
                rows_l.append(r.astype(np.int64))
                cols_l.append(c.astype(np.int64))
                vals_l.append(np.full(len(r),
                                      1.0 if assign == "count" else vals[i]))
        if not rows_l:
            return pa.table({"tkey": pa.array([], pa.int64()),
                             "data": pa.array([], pa.binary())})
        return _scatter_tiles(meta, np.concatenate(rows_l),
                              np.concatenate(cols_l),
                              np.concatenate(vals_l), assign)

    partials = ds.map_batches(_burn, batch_format="pyarrow")
    return _reduce_tiles_nan(partials, meta, assign)


def geometry_to_raster(geom_wkb: bytes, meta: RasterMeta, *,
                       value: float = 1.0):
    """GeometryToRaster — rasterize ONE geometry with a constant value;
    returns a tile Dataset. Driver-side convenience over
    :func:`rasterize_features`."""
    import ray

    tab = pa.table({"geom": pa.array([geom_wkb], pa.binary()),
                    "v": pa.array([float(value)])})
    return rasterize_features(ray.data.from_arrow(tab), meta,
                              value_col="v", assign="max")
