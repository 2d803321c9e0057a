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


# ---------------------------------------------------------------------------
# CutFill family (reference variants 1/2/3)
# ---------------------------------------------------------------------------

def _cut_fill_core(diff_tiles, cell_area: float):
    """Shared core: diff tiles → (flag tiles, stats table).

    Flag raster: Cut = 1 (diff > 0), Fill = -1 (diff < 0), Unchanged =
    0, NaN where either input was nodata. Stats per category mirror
    GT/gridcoverage/AbstractRasterCutFillOperation.java:152-195
    (CutFillResult): area = count·cellArea, volume = Σ|cellArea·diff|
    (0 for the unchanged class).
    """
    import ray.data.aggregate as A

    flags = raster_math(
        diff_tiles,
        lambda d: np.where(np.isnan(d), np.nan,
                           np.sign(d).astype(np.float64)))

    def _partial(batch: pa.Table) -> pa.Table:
        cut_n = fill_n = un_n = 0
        cut_v = fill_v = 0.0
        for blob in batch["data"]:
            d = np.frombuffer(blob.as_py(), dtype=np.float64)
            d = d[~np.isnan(d)]
            pos = d > 0
            neg = d < 0
            cut_n += int(pos.sum())
            fill_n += int(neg.sum())
            un_n += int(len(d) - pos.sum() - neg.sum())
            cut_v += float(d[pos].sum())
            fill_v += float(-d[neg].sum())
        return pa.table({"cut_n": [cut_n], "fill_n": [fill_n],
                         "un_n": [un_n], "cut_v": [cut_v],
                         "fill_v": [fill_v]})

    agg = diff_tiles.map_batches(_partial, batch_format="pyarrow").aggregate(
        A.Sum("cut_n"), A.Sum("fill_n"), A.Sum("un_n"),
        A.Sum("cut_v"), A.Sum("fill_v"))
    cnt = {1: int(agg["sum(cut_n)"] or 0), -1: int(agg["sum(fill_n)"] or 0),
           0: int(agg["sum(un_n)"] or 0)}
    vol = {1: float(agg["sum(cut_v)"] or 0.0) * cell_area,
           -1: float(agg["sum(fill_v)"] or 0.0) * cell_area, 0: 0.0}
    stats = pa.table({
        "category": pa.array([-1, 0, 1], pa.int32()),
        "count": pa.array([cnt[-1], cnt[0], cnt[1]], pa.int64()),
        "area": pa.array([cnt[-1] * cell_area, cnt[0] * cell_area,
                          cnt[1] * cell_area], pa.float64()),
        "volume": pa.array([vol[-1], vol[0], vol[1]], pa.float64()),
    })
    return flags, stats


def raster_cut_fill1(tiles, meta, *, base_height: float | None = None,
                     crop_wkb: bytes | None = None):
    """RasterCutFill (GT/gridcoverage/RasterCutFillOperation.java:55-140)
    — one DEM vs a horizontal reference plane. base_height=None means
    'use the mean of the (cropped) DEM' (the reference's -9999.0
    sentinel). Returns (flag_tiles, stats_table, base_height)."""
    from .geometry import clip_by_geometry
    from .tiles import raster_statistics

    if crop_wkb is not None:
        tiles = clip_by_geometry(tiles, meta, crop_wkb)
        tiles = tiles.materialize()  # consumed twice (mean + diff)
    if base_height is None:
        base_height = float(raster_statistics(tiles, meta)["mean"])
    diff = raster_math(tiles, lambda a, b=base_height: a - b)
    flags, stats = _cut_fill_core(diff, meta.cell_size * meta.cell_size)
    return flags, stats, base_height


def raster_cut_fill2(tiles_before, tiles_after, meta, *,
                     crop_wkb: bytes | None = None):
    """RasterCutFill2 (GT/gridcoverage/RasterCutFillOperation2.java:54-146)
    — volume change between two same-grid DEMs (diff = before − after;
    cut where the surface came DOWN). Returns (flag_tiles, stats)."""
    from .geometry import clip_by_geometry

    if crop_wkb is not None:
        tiles_before = clip_by_geometry(tiles_before, meta, crop_wkb)
        tiles_after = clip_by_geometry(tiles_after, meta, crop_wkb)
    diff = raster_binary_op(tiles_before, tiles_after, lambda a, b: a - b)
    flags, stats = _cut_fill_core(diff, meta.cell_size * meta.cell_size)
    return flags, stats


def raster_cut_fill3(tiles_before, tiles_after, meta, *,
                     base_height: float, crop_wkb: bytes | None = None):
    """RasterCutFill3 (GT/gridcoverage/RasterCutFillOperation3.java:64-178)
    — two DEMs against a common reference plane: volume stats from the
    before−after diff (as CutFill2), PLUS per-surface 'above plane'
    masks (the reference keeps only flag==1 cells of each surface,
    :151-153) whose polygon overlay classifies change regions:
    cut = before_above − after_above, fill = after_above − before_above,
    unchanged = intersection. Returns dict with flags_before/
    flags_after (1/NaN masks), stats, and the three polygon layers."""
    from .geometry import clip_by_geometry
    from .vectorize import raster_to_polygon

    if crop_wkb is not None:
        tiles_before = clip_by_geometry(tiles_before, meta, crop_wkb)
        tiles_after = clip_by_geometry(tiles_after, meta, crop_wkb)
    tiles_before = tiles_before.materialize()
    tiles_after = tiles_after.materialize()
    diff = raster_binary_op(tiles_before, tiles_after, lambda a, b: a - b)
    _, stats = _cut_fill_core(diff, meta.cell_size * meta.cell_size)

    # valid-pair mask propagates: a cell counts only when BOTH have data
    def _above(a, b):
        both = ~(np.isnan(a) | np.isnan(b))
        return np.where(both & (a > base_height), 1.0, np.nan)

    flags_before = raster_binary_op(tiles_before, tiles_after, _above)
    flags_after = raster_binary_op(tiles_after, tiles_before, _above)

    def _poly_table(flags):
        t = raster_to_polygon(flags, meta, value_col="value").to_pandas()
        return pa.Table.from_pandas(t, preserve_index=False)

    before_fc = _poly_table(flags_before)
    after_fc = _poly_table(flags_after)
    return {"flags_before": flags_before, "flags_after": flags_after,
            "stats": stats, "before_above": before_fc,
            "after_above": after_fc}


def raster_cut_fill_features(flag_tiles, meta, stats: pa.Table):
    """buildFeatures (GT/gridcoverage/AbstractRasterCutFillOperation.java
    :68-123) — vectorize the flag raster per category (cells tessellate,
    so the per-category union is the exact edge-cancellation dissolve)
    and attach count/area/volume (3-row stats attached by broadcast
    lookup, not a shuffle join). Returns a Dataset
    (category, geom, count, area, volume)."""
    from .vectorize import raster_to_polygon

    d = stats.to_pydict()
    lut = {int(c): (d["count"][i], d["area"][i], d["volume"][i])
           for i, c in enumerate(d["category"])}

    def _attach(b: pa.Table) -> pa.Table:
        cats = [int(v) for v in b["category"].to_pylist()]
        return pa.table({
            "category": pa.array(cats, pa.int32()),
            "geom": b["geom"],
            "count": pa.array([lut[c][0] for c in cats], pa.int64()),
            "area": pa.array([lut[c][1] for c in cats], pa.float64()),
            "volume": pa.array([lut[c][2] for c in cats], pa.float64()),
        })

    polys = raster_to_polygon(flag_tiles, meta, value_col="category")
    return polys.map_batches(_attach, batch_format="pyarrow")
