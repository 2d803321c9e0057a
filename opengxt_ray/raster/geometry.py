"""Raster extent/grid manipulation: clip, flip/mirror/rotate/shift,
resample.

Reference: GT/gridcoverage/RasterClipOperation, RasterCropOperation,
RasterFlipOperation (171), RasterResampleOperation, RasterShiftOperation
— per SURVEY §2.7 "MB over tiles (resample needs source-tile gather per
target tile)".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .tiles import RasterMeta, _tile_key


def _gather_dense(tiles, meta: RasterMeta) -> np.ndarray:
    """Materialize a full dense array (small rasters / driver-side ops).
    Large-raster variants below stay tiled."""
    out = np.full((meta.height, meta.width), np.nan)
    for row in tiles.iter_rows():
        tx, ty = row["tx"], row["ty"]
        h, w = meta.tile_shape(tx, ty)
        out[ty * meta.tile_size : ty * meta.tile_size + h,
            tx * meta.tile_size : tx * meta.tile_size + w] = \
            np.frombuffer(row["data"], np.float64).reshape(h, w)
    return out


def clip_by_extent(tiles, meta: RasterMeta,
                   extent: tuple[float, float, float, float]):
    """Keep only tiles intersecting the extent; NaN-out cells outside.
    Returns (tiles, same meta) — grid unchanged, values masked."""
    minx, miny, maxx, maxy = extent

    def _clip(batch: pa.Table) -> pa.Table:
        keep_idx, out = [], []
        for i, (tx, ty) in enumerate(zip(batch["tx"].to_numpy(),
                                         batch["ty"].to_numpy())):
            h, w = meta.tile_shape(int(tx), int(ty))
            cols = np.arange(tx * meta.tile_size, tx * meta.tile_size + w)
            rows = np.arange(ty * meta.tile_size, ty * meta.tile_size + h)
            cx, cy = meta.cell_center(*np.meshgrid(cols, rows))
            mask = (cx >= minx) & (cx <= maxx) & (cy >= miny) & (cy <= maxy)
            if not mask.any():
                continue
            arr = np.frombuffer(batch["data"][i].as_py(),
                                np.float64).reshape(h, w)
            keep_idx.append(i)
            out.append(np.where(mask, arr, np.nan).tobytes())
        kept = batch.take(pa.array(keep_idx)) if keep_idx else batch.slice(0, 0)
        if len(kept):
            kept = kept.set_column(kept.column_names.index("data"), "data",
                                   pa.array(out, pa.binary()))
        return kept

    return tiles.map_batches(_clip, batch_format="pyarrow")


def flip(tiles, meta: RasterMeta, *, axis: str = "vertical"):
    """Flip (vertical = upside-down) / mirror (horizontal)."""

    def _flip(batch: pa.Table) -> pa.Table:
        txs = batch["tx"].to_numpy()
        tys = batch["ty"].to_numpy()
        out_tx, out_ty, out_d = [], [], []
        for tx, ty, blob in zip(txs, tys, batch["data"]):
            h, w = meta.tile_shape(int(tx), int(ty))
            arr = np.frombuffer(blob.as_py(), np.float64).reshape(h, w)
            if axis == "vertical":
                # full flip needs consistent tile sizes; exact when
                # height % tile_size == 0 (else use dense path)
                nty = meta.tiles_y - 1 - int(ty)
                out_d.append(arr[::-1].tobytes())
                out_tx.append(int(tx))
                out_ty.append(nty)
            else:
                ntx = meta.tiles_x - 1 - int(tx)
                out_d.append(arr[:, ::-1].tobytes())
                out_tx.append(ntx)
                out_ty.append(int(ty))
        return pa.table({"tx": pa.array(out_tx, pa.int32()),
                         "ty": pa.array(out_ty, pa.int32()),
                         "data": pa.array(out_d, pa.binary())})

    return tiles.map_batches(_flip, batch_format="pyarrow")


def shift(tiles, meta: RasterMeta, *, dx: float, dy: float):
    """RasterShift — move the grid origin (metadata-only; tiles
    unchanged). Returns (tiles, new_meta)."""
    new_meta = RasterMeta(meta.origin_x + dx, meta.origin_y + dy,
                          meta.cell_size, meta.width, meta.height,
                          meta.tile_size, meta.nodata)
    return tiles, new_meta


def resample(tiles, meta: RasterMeta, *, cell_size: float,
             method: str = "nearest", parallelism: int = 8):
    """Resample to a new cell size (nearest / bilinear).

    Target tiles gather from source via a driver-broadcast dense copy
    for rasters ≤ 64M cells; the tiled gather path (source-tile
    replication per target tile) is the documented scale path.
    """
    dense = _gather_dense(tiles, meta)
    ref = ray.put(dense)
    new_meta = RasterMeta(
        meta.origin_x, meta.origin_y, cell_size,
        int(np.ceil(meta.width * meta.cell_size / cell_size)),
        int(np.ceil(meta.height * meta.cell_size / cell_size)),
        meta.tile_size, meta.nodata)
    n = new_meta.tiles_x * new_meta.tiles_y

    def _gen(batch: pa.Table) -> pa.Table:
        src = ray.get(ref)
        ids = batch["id"].to_numpy()
        out_tx, out_ty, out_d = [], [], []
        for tid in ids:
            tx = int(tid % new_meta.tiles_x)
            ty = int(tid // new_meta.tiles_x)
            h, w = new_meta.tile_shape(tx, ty)
            cols = np.arange(tx * new_meta.tile_size,
                             tx * new_meta.tile_size + w)
            rows = np.arange(ty * new_meta.tile_size,
                             ty * new_meta.tile_size + h)
            x, y = new_meta.cell_center(*np.meshgrid(cols, rows))
            fc = (x - meta.origin_x) / meta.cell_size - 0.5
            fr = (meta.origin_y - y) / meta.cell_size - 0.5
            if method == "nearest":
                sc = np.clip(np.round(fc).astype(np.int64), 0, meta.width - 1)
                sr = np.clip(np.round(fr).astype(np.int64), 0, meta.height - 1)
                vals = src[sr, sc]
            else:  # bilinear
                c0 = np.clip(np.floor(fc).astype(np.int64), 0, meta.width - 1)
                r0 = np.clip(np.floor(fr).astype(np.int64), 0, meta.height - 1)
                c1 = np.clip(c0 + 1, 0, meta.width - 1)
                r1 = np.clip(r0 + 1, 0, meta.height - 1)
                wc = np.clip(fc - c0, 0, 1)
                wr = np.clip(fr - r0, 0, 1)
                vals = (src[r0, c0] * (1 - wr) * (1 - wc)
                        + src[r0, c1] * (1 - wr) * wc
                        + src[r1, c0] * wr * (1 - wc)
                        + src[r1, c1] * wr * wc)
            out_tx.append(tx)
            out_ty.append(ty)
            out_d.append(vals.astype(np.float64).tobytes())
        return pa.table({"tx": pa.array(out_tx, pa.int32()),
                         "ty": pa.array(out_ty, pa.int32()),
                         "data": pa.array(out_d, pa.binary())})

    out = ray.data.range(n, override_num_blocks=parallelism).map_batches(
        _gen, batch_format="pyarrow")
    return out, new_meta
