"""Binning / tessellation operators.

Reference semantics (SURVEY.md §2.6):
- HexagonalBinning: GT/pattern/HexagonalBinningVisitor.java:40-130 —
  pointy-top hex grid anchored at the data extent origin, width √3·s;
  per-cell weighted sum; ``onlyValidGrid`` drops empty bins.
- RectangularBinning: GT/pattern/RectangularBinningVisitor.java —
  rect grid over extent, per-cell weighted sum.
- CircularBinning: GT/pattern/CircularBinningVisitor.java — circle
  grid; a point contributes to the circle whose center grid cell it
  falls in (distance test).
- Fishnet: GT/operations/FishnetOperation.java — generate grid
  polygons, optional per-cell point counts.
- QuadratAnalysis: GT/pattern/QuadratOperation.java:44-… — grid-cell
  counts → variance-mean ratio + KS statistic, cell size √(2A/n).

Execution: stateless ``map_batches`` cell assignment + partial per-batch
combine → small ``groupby(cell)`` (SURVEY.md "pre-aggregate inside
map_batches").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..core import wkb as _wkb
from ..index import hexgrid

SQRT3 = np.sqrt(3.0)


def _partial_cell_sum(batch: pa.Table, keys: np.ndarray,
                      w: np.ndarray, extra: dict | None = None) -> pa.Table:
    import pandas as pd

    codes, uniq = pd.factorize(keys)
    s = np.bincount(codes, weights=w, minlength=len(uniq))
    cnt = np.bincount(codes, minlength=len(uniq))
    cols = {"cell_key": pa.array(uniq), "__w": pa.array(s),
            "__cnt": pa.array(cnt.astype(np.int64))}
    if extra:
        # first occurrence per code, vectorized: reverse-scatter row
        # indices so earlier rows overwrite later ones
        first = np.full(len(uniq), -1, np.int64)
        first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
        for name, arr in extra.items():
            cols[name] = pa.array(arr[first])
    return pa.table(cols)


def _reduce_cell_sums(partials):
    from ..core.util import default_shuffle_partitions

    agg = partials.groupby("cell_key",
                           num_partitions=default_shuffle_partitions()).aggregate(
        ray.data.aggregate.Sum("__w"), ray.data.aggregate.Sum("__cnt"))
    return agg.map_batches(
        lambda b: pa.table({"cell_key": b["cell_key"],
                            "val": b["sum(__w)"],
                            "count": b["sum(__cnt)"]}),
        batch_format="pyarrow",
    )


def hex_binning(ds, *, size: float, origin: tuple[float, float] = (0.0, 0.0),
                weight_col: str | None = None,
                xcol: str = "lon", ycol: str = "lat"):
    """Hexagonal binning (reference grid math, arbitrary origin/size).

    Output: (qr_key, q, r, cx, cy, val, count). Hex assignment uses
    exact axial cube-rounding — equivalent to the reference's
    3-candidate nearest-center disambiguation
    (HexagonalBinningVisitor.java:95-128), both assign to the nearest
    hex center.
    """
    ox, oy = origin

    def _assign(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy() - ox
        y = batch[ycol].to_numpy() - oy
        qf = (SQRT3 / 3.0 * x - y / 3.0) / size
        rf = (2.0 / 3.0 * y) / size
        q, r = hexgrid._axial_round(qf, rf)
        key = (q + np.int64(1 << 30)) * np.int64(1 << 32) + (r + np.int64(1 << 30))
        w = (batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
             if weight_col else np.ones(len(batch)))
        return _partial_cell_sum(batch, key, w)

    out = _reduce_cell_sums(ds.map_batches(_assign, batch_format="pyarrow"))

    def _centers(batch: pa.Table) -> pa.Table:
        key = batch["cell_key"].to_numpy()
        q = (key >> np.int64(32)) - np.int64(1 << 30)
        r = (key & np.int64((1 << 32) - 1)) - np.int64(1 << 30)
        cx = ox + size * SQRT3 * (q + r / 2.0)
        cy = oy + size * 1.5 * r
        return pa.table({
            "q": pa.array(q), "r": pa.array(r),
            "cx": pa.array(cx), "cy": pa.array(cy),
            "val": batch["val"], "count": batch["count"],
        })

    return out.map_batches(_centers, batch_format="pyarrow")


def rect_binning(ds, *, width: float, height: float,
                 origin: tuple[float, float] = (0.0, 0.0),
                 weight_col: str | None = None,
                 xcol: str = "lon", ycol: str = "lat"):
    """Rectangular binning → (col, row, minx, miny, val, count)."""
    ox, oy = origin

    def _assign(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        col = np.floor((x - ox) / width).astype(np.int64)
        row = np.floor((y - oy) / height).astype(np.int64)
        key = (col + np.int64(1 << 30)) * np.int64(1 << 32) + (row + np.int64(1 << 30))
        w = (batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
             if weight_col else np.ones(len(batch)))
        return _partial_cell_sum(batch, key, w)

    out = _reduce_cell_sums(ds.map_batches(_assign, batch_format="pyarrow"))

    def _corners(batch: pa.Table) -> pa.Table:
        key = batch["cell_key"].to_numpy()
        col = (key >> np.int64(32)) - np.int64(1 << 30)
        row = (key & np.int64((1 << 32) - 1)) - np.int64(1 << 30)
        return pa.table({
            "col": pa.array(col), "row": pa.array(row),
            "minx": pa.array(ox + col * width),
            "miny": pa.array(oy + row * height),
            "val": batch["val"], "count": batch["count"],
        })

    return out.map_batches(_corners, batch_format="pyarrow")


def fishnet(extent: tuple[float, float, float, float], *,
            columns: int, rows: int, parallelism: int = 8):
    """FishnetOperation — generate a grid of rect polygons as a Dataset.

    Deterministic generator via ray.data.range → map_batches (no driver
    loop; scales to billions of cells).
    """
    minx, miny, maxx, maxy = extent
    w = (maxx - minx) / columns
    h = (maxy - miny) / rows

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        col = ids % columns
        row = ids // columns
        geoms = []
        for c, r in zip(col, row):
            x0 = minx + c * w
            y0 = miny + r * h
            geoms.append(_wkb.encode_polygon(
                np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])))
        return pa.table({
            "cell_id": pa.array(ids), "col": pa.array(col), "row": pa.array(row),
            "geom": pa.array(geoms, pa.binary()),
        })

    ds = ray.data.range(columns * rows, override_num_blocks=parallelism)
    return ds.map_batches(_gen, batch_format="pyarrow")


def hexagon_grid(extent: tuple[float, float, float, float], *, size: float,
                 parallelism: int = 8):
    """HexagonOperation — hex polygon tessellation covering extent."""
    minx, miny, maxx, maxy = extent
    cols = int(np.ceil((maxx - minx) / (SQRT3 * size))) + 1
    rows = int(np.ceil((maxy - miny) / (1.5 * size))) + 1

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        col = ids % cols
        row = ids // cols
        cx = minx + SQRT3 * size * (col + 0.5 * (row % 2))
        cy = miny + 1.5 * size * row
        ang = np.radians(np.arange(7) * 60.0 + 30.0)
        geoms = []
        for x0, y0 in zip(cx, cy):
            ring = np.column_stack([x0 + size * np.cos(ang), y0 + size * np.sin(ang)])
            geoms.append(_wkb.encode_polygon(ring))
        return pa.table({
            "cell_id": pa.array(ids),
            "cx": pa.array(cx), "cy": pa.array(cy),
            "geom": pa.array(geoms, pa.binary()),
        })

    ds = ray.data.range(cols * rows, override_num_blocks=parallelism)
    return ds.map_batches(_gen, batch_format="pyarrow")


def quadrat_analysis(ds, *, xcol: str = "lon", ycol: str = "lat",
                     extent=None, cell_size: float | None = None) -> dict:
    """QuadratAnalysis → {cells, mean, variance, vmr, ks_d, cell_size}.

    Default cell size √(2A/n) (QuadratOperation.java:74-81). Counts per
    cell via the rect-binning shuffle; empty cells of the enclosing grid
    counted as zeros.
    """
    if extent is None:
        import ray.data.aggregate as A

        stats = ds.aggregate(A.Min(xcol), A.Max(xcol), A.Min(ycol), A.Max(ycol),
                             A.Count())
        extent = (stats[f"min({xcol})"], stats[f"min({ycol})"],
                  stats[f"max({xcol})"], stats[f"max({ycol})"])
        n = stats["count()"]
    else:
        n = ds.count()
    minx, miny, maxx, maxy = extent
    area = (maxx - minx) * (maxy - miny)
    if cell_size is None:
        cell_size = float(np.sqrt(2.0 * area / n))
    cols = int(np.ceil((maxx - minx) / cell_size))
    rows = int(np.ceil((maxy - miny) / cell_size))
    binned = rect_binning(ds, width=cell_size, height=cell_size,
                          origin=(minx, miny), xcol=xcol, ycol=ycol)
    counts = binned.to_pandas()["count"].to_numpy()  # ≤ cols·rows cells, small
    total_cells = cols * rows
    full = np.zeros(total_cells)
    full[: len(counts)] = counts  # nonempty cells; rest zero
    mean = n / total_cells
    var = float(((full - mean) ** 2).sum() / (total_cells - 1))
    vmr = var / mean if mean > 0 else 0.0
    # KS: observed CDF of per-cell counts vs Poisson
    from math import exp, factorial

    ks = 0.0
    cum_obs = 0.0
    cum_poi = 0.0
    maxc = int(full.max())
    for k in range(maxc + 1):
        cum_obs += float((full == k).sum()) / total_cells
        cum_poi += exp(-mean) * mean ** k / factorial(min(k, 170))
        ks = max(ks, abs(cum_obs - cum_poi))
    return {"cells": total_cells, "mean": float(mean), "variance": var,
            "vmr": float(vmr), "ks_d": float(ks), "cell_size": cell_size}


def circular_binning(ds, extent, *, radius: float,
                     weight_col: str | None = None,
                     xcol: str = "lon", ycol: str = "lat"):
    """CircularBinning (GT/pattern/CircularBinningOperation) — circles
    centered on a 2r-spaced grid; a point bins to its cell's circle
    only if within `radius` of the center (corner gaps drop points,
    matching the circle geometry). Output
    (cell_id, cx, cy, val, count)."""
    minx, miny, maxx, maxy = extent
    cols = int(np.ceil((maxx - minx) / (2 * radius)))

    def _assign(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        col = np.floor((x - minx) / (2 * radius)).astype(np.int64)
        row = np.floor((y - miny) / (2 * radius)).astype(np.int64)
        cx = minx + (col + 0.5) * 2 * radius
        cy = miny + (row + 0.5) * 2 * radius
        inside = (x - cx) ** 2 + (y - cy) ** 2 <= radius * radius
        w = (batch[weight_col].to_numpy(zero_copy_only=False)
             .astype(np.float64) if weight_col else np.ones(len(x)))
        cell = row * np.int64(1 << 31) + col
        return pa.table({
            "cell_id": pa.array(cell[inside]),
            "cx": pa.array(cx[inside]), "cy": pa.array(cy[inside]),
            "w": pa.array(w[inside]),
            "one": pa.array(np.ones(int(inside.sum()))),
        })

    import ray.data.aggregate as A

    from ..core.util import default_shuffle_partitions

    agg = ds.map_batches(_assign, batch_format="pyarrow").groupby(
        "cell_id", num_partitions=default_shuffle_partitions()).aggregate(
        A.Min("cx"), A.Min("cy"), A.Sum("w"), A.Sum("one"))
    return agg.map_batches(
        lambda b: pa.table({
            "cell_id": b["cell_id"], "cx": b["min(cx)"], "cy": b["min(cy)"],
            "val": b["sum(w)"], "count": b["sum(one)"]}),
        batch_format="pyarrow")
