"""Data classification — EqualInterval / Quantile / NaturalBreaks /
StdDev break computation over a column.

Reference: GT/clsssifier/ package (1,127 LoC); natural breaks = Jenks
(GT/clsssifier/NaturalBreaksClassify.java:50-96). Reference quantile is
exact; we compute exact quantiles from a distributed sort-free
histogram+refine when the column is large, or exact via sample when the
distinct count is small — exactness is flagged per SURVEY §2.4.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _minmax(ds, col):
    agg = ds.aggregate(ray.data.aggregate.Min(col), ray.data.aggregate.Max(col))
    return float(agg[f"min({col})"]), float(agg[f"max({col})"])


def equal_interval(ds, col: str, k: int) -> list[float]:
    lo, hi = _minmax(ds, col)
    return [lo + (hi - lo) * i / k for i in range(k + 1)]


def std_dev_breaks(ds, col: str, k: int = 4) -> list[float]:
    """Breaks at μ ± i·σ (population σ)."""
    def _p(batch):
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"n": [len(v)], "s": [float(v.sum())],
                         "s2": [float((v * v).sum())]})

    parts = ds.map_batches(_p, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(c) for c in ("n", "s", "s2")])
    n, s, s2 = agg["sum(n)"], agg["sum(s)"], agg["sum(s2)"]
    mean = s / n
    std = float(np.sqrt(max(s2 / n - mean ** 2, 0.0)))
    half = k // 2
    return [mean + (i - half) * std for i in range(k + 1)]


def quantile_breaks(ds, col: str, k: int, *, exact_threshold: int = 5_000_000
                    ) -> list[float]:
    """Exact quantile breaks. Small columns (≤ exact_threshold rows):
    pull the single column and sort locally (column-pruned — only the
    value column leaves the cluster). Larger: distributed ds.sort + take
    at rank positions. The reference is exact, so no sketching here."""
    n = ds.count()
    if n <= exact_threshold:
        vals = np.sort(np.concatenate([
            b[col].to_numpy(zero_copy_only=False)
            for b in ds.select_columns([col]).iter_batches(
                batch_format="pyarrow", batch_size=65536)
        ]).astype(np.float64))
        idx = [min(int(np.ceil(n * i / k)) - 1, n - 1) if i else 0
               for i in range(k + 1)]
        return [float(vals[j]) for j in idx]
    # distributed: sort then sample rank rows per partition boundary
    s = ds.select_columns([col]).sort(col)
    # rank positions via split proportions
    out = [float(s.take(1)[0][col])]
    for i in range(1, k + 1):
        pos = min(int(np.ceil(n * i / k)) - 1, n - 1)
        row = s.split_at_indices([pos])[1].take(1)
        out.append(float(row[0][col]))
    return out


def jenks_breaks(values: np.ndarray, k: int) -> list[float]:
    """Jenks natural breaks (exact dynamic programming, O(k·n²) on the
    deduplicated value array — the reference runs the same algorithm on
    the full in-memory list, NaturalBreaksClassify.java:50-96)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = len(v)
    if n <= k:
        return list(v) + [float(v[-1])]
    # classic Jenks matrices
    lower = np.zeros((n + 1, k + 1), dtype=np.int64)
    var = np.full((n + 1, k + 1), np.inf)
    var[0, 0] = 0.0
    lower[1, :] = 1
    var[1, 1:] = 0.0
    csum = np.concatenate([[0.0], np.cumsum(v)])
    csum2 = np.concatenate([[0.0], np.cumsum(v * v)])

    def sse(i, j):  # variance of v[i..j-1]
        cnt = j - i
        s = csum[j] - csum[i]
        s2 = csum2[j] - csum2[i]
        return s2 - s * s / cnt

    for i in range(2, n + 1):
        for c in range(1, min(i, k) + 1):
            best = np.inf
            arg = c
            lo = c if c > 1 else 1
            for j in range(lo, i + 1):
                prev = var[j - 1, c - 1]
                if prev == np.inf:
                    continue
                cur = prev + sse(j - 1, i)
                if cur < best:
                    best = cur
                    arg = j
            var[i, c] = best
            lower[i, c] = arg
    breaks = [float(v[-1])]
    idx = n
    for c in range(k, 0, -1):
        j = lower[idx, c]
        breaks.append(float(v[j - 1]))
        idx = j - 1
    return breaks[::-1]


def natural_breaks(ds, col: str, k: int, *, sample_limit: int = 40_000
                   ) -> list[float]:
    """NaturalBreaks over a Dataset column. Exact when the column fits
    ``sample_limit``; otherwise Jenks on an evenly-strided sorted sample
    (documented approximation — the DP is quadratic)."""
    vals = np.concatenate([
        b[col].to_numpy(zero_copy_only=False)
        for b in ds.select_columns([col]).iter_batches(
            batch_format="pyarrow", batch_size=65536)
    ]).astype(np.float64)
    vals = np.sort(vals)
    if len(vals) > sample_limit:
        stride = np.linspace(0, len(vals) - 1, sample_limit).astype(np.int64)
        vals = vals[stride]
    return jenks_breaks(vals, k)


def classify_column(ds, col: str, breaks: list[float], *,
                    out_col: str = "class"):
    """Append the class index (0-based) per row for given breaks."""
    edges = np.asarray(breaks[1:-1], dtype=np.float64)

    def _cls(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        cls = np.searchsorted(edges, v, side="right")
        return batch.append_column(out_col, pa.array(cls.astype(np.int32)))

    return ds.map_batches(_cls, batch_format="pyarrow")
