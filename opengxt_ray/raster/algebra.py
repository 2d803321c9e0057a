"""Per-cell raster map algebra — RasterMath / Con / Reclass / SetNull /
Rescale / Replace / NDVI.

Reference: GT/gridcoverage/ Raster{Math,Con,Reclass,ReplaceValues,
SetNull,Fuzzy,Rescale,NDVI}Operation — pure per-cell scalar functions;
the Ray mapping is a stateless ``map_batches`` over tile rows (SURVEY.md
§2.7 "Map algebra: pure MB"). Two-raster ops align tiles by (tx, ty)
hash join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def raster_math(tiles, fn):
    """Apply an arbitrary vectorized fn(np.ndarray) per tile."""

    def _apply(batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch["data"]:
            arr = np.frombuffer(blob.as_py(), dtype=np.float64)
            out.append(np.asarray(fn(arr), dtype=np.float64).tobytes())
        return pa.table({"tx": batch["tx"], "ty": batch["ty"],
                         "data": pa.array(out, pa.binary())})

    return tiles.map_batches(_apply, batch_format="pyarrow")


def raster_con(tiles, cond_fn, true_val: float, false_val: float):
    """RasterCon — per-cell conditional."""
    return raster_math(tiles, lambda a: np.where(cond_fn(a), true_val, false_val))


def raster_reclass(tiles, breaks: list[float], new_values: list[float]):
    """RasterReclass — map value ranges to class values.
    breaks has len(new_values)+1 edges."""
    edges = np.asarray(breaks[1:-1], dtype=np.float64)
    vals = np.asarray(new_values, dtype=np.float64)

    def _re(a):
        idx = np.searchsorted(edges, a, side="right")
        out = vals[np.clip(idx, 0, len(vals) - 1)]
        return np.where(np.isnan(a), np.nan, out)

    return raster_math(tiles, _re)


def raster_set_null(tiles, cond_fn):
    """RasterSetNull — cells matching cond become NaN."""
    return raster_math(tiles, lambda a: np.where(cond_fn(a), np.nan, a))


def raster_replace(tiles, old: float, new: float):
    return raster_math(tiles, lambda a: np.where(a == old, new, a))


def raster_rescale(tiles, src_min, src_max, dst_min=0.0, dst_max=1.0):
    span = src_max - src_min

    def _rs(a):
        return (a - src_min) / span * (dst_max - dst_min) + dst_min

    return raster_math(tiles, _rs)


def _align_two(tiles_a, tiles_b, num_partitions: int = 8):
    b2 = tiles_b.map_batches(
        lambda b: pa.table({"tx": b["tx"], "ty": b["ty"], "data_b": b["data"]}),
        batch_format="pyarrow")
    return tiles_a.join(b2, join_type="inner", num_partitions=num_partitions,
                        on=("tx", "ty"))


def raster_binary_op(tiles_a, tiles_b, fn):
    """Two-raster per-cell op (same grid): tiles joined by (tx, ty)."""
    joined = _align_two(tiles_a, tiles_b)

    def _apply(batch: pa.Table) -> pa.Table:
        out = []
        for a, b in zip(batch["data"], batch["data_b"]):
            av = np.frombuffer(a.as_py(), dtype=np.float64)
            bv = np.frombuffer(b.as_py(), dtype=np.float64)
            out.append(np.asarray(fn(av, bv), dtype=np.float64).tobytes())
        return pa.table({"tx": batch["tx"], "ty": batch["ty"],
                         "data": pa.array(out, pa.binary())})

    return joined.map_batches(_apply, batch_format="pyarrow")


def raster_ndvi(tiles_nir, tiles_red):
    """RasterNDVI — (NIR−Red)/(NIR+Red), nodata-safe."""

    def _ndvi(nir, red):
        den = nir + red
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(den == 0, np.nan, (nir - red) / den)

    return raster_binary_op(tiles_nir, tiles_red, _ndvi)


def raster_cut_fill(tiles_before, tiles_after, cell_area: float):
    """RasterCutFill — per-cell volume difference + GLOBAL cut/fill sums."""
    diff = raster_binary_op(tiles_before, tiles_after, lambda a, b: a - b)

    def _partial(batch: pa.Table) -> pa.Table:
        cut = fill = 0.0
        for blob in batch["data"]:
            d = np.frombuffer(blob.as_py(), dtype=np.float64)
            d = d[~np.isnan(d)]
            cut += float(d[d > 0].sum())
            fill += float(-d[d < 0].sum())
        return pa.table({"cut": [cut], "fill": [fill]})

    import ray.data.aggregate as A

    agg = diff.map_batches(_partial, batch_format="pyarrow").aggregate(
        A.Sum("cut"), A.Sum("fill"))
    return diff, {"cut_volume": agg["sum(cut)"] * cell_area,
                  "fill_volume": agg["sum(fill)"] * cell_area}


def raster_extraction(tiles, cond_fn):
    """RasterExtraction (GT/RasterExtractionProcess.java:88) — KEEP the
    cells matching the filter, everything else nodata (the complement
    of raster_set_null)."""
    return raster_math(tiles, lambda a: np.where(cond_fn(a), a, np.nan))


def raster_force_crs(tiles, meta, crs: str):
    """RasterForceCRS — metadata-only: stamp a new CRS code without
    transforming (the engine carries CRS in metadata, SURVEY §1.2).
    Returns (tiles, meta, crs)."""
    return tiles, meta, crs
