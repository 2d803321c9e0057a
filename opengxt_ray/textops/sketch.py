"""Mergeable streaming sketches: count-min (heavy-hitter frequency
estimation, Cormode & Muthukrishnan 2005) and HyperLogLog (distinct
counting, Flajolet et al. 2007) — the sublinear-memory corpus
statistics a 100 TB pipeline computes where an exact groupby would
shuffle the whole vocabulary/key space.

Both are built as per-batch partials inside ``map_batches`` and
merged with the sketch's own merge law (CMS: element-wise ADD; HLL:
element-wise MAX) through a two-level reduce — the same bounded
driver-materialization shape as ``build_bloom`` (≤ 8 × sketch bytes
on the driver regardless of corpus size).

Estimates are approximate BY DESIGN (CMS never under-counts; HLL
relative error ≈ 1.04/√m) so there is no hash-exact SQL oracle;
correctness is pytest-proven: the over-count guarantee, the ε·N error
bound, merge associativity (sharded build == single-shard build,
bit-identical), and HLL accuracy vs exact COUNT DISTINCT.

No reference counterpart; nearest analog is the statistics family
(GT/statistics/DataStatisticsProcess.java:1)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.fid import hash_strings

_ODD = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
                 0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5 | 1,
                 0x2545F4914F6CDD1D, 0x9E6C63D0876A9F4D],
                dtype=np.uint64)


def _row_hashes(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket indices from one 64-bit hash per item
    (splitmix-style row mixing — pairwise-independent enough for the
    CMS guarantee in practice)."""
    out = np.empty((depth, h.size), np.int64)
    with np.errstate(over="ignore"):
        for d in range(depth):
            m = h * _ODD[d % len(_ODD)] + np.uint64(d)
            m ^= m >> np.uint64(33)
            m *= np.uint64(0xFF51AFD7ED558CCD)
            m ^= m >> np.uint64(33)
            out[d] = (m % np.uint64(width)).astype(np.int64)
    return out


def _mix64(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 avalanche: hash_strings (FNV-flavored) leaves
    the HIGH bits correlated across similar strings, which collapses
    any sketch that slices top bits (HLL buckets). Full-avalanche mix
    first."""
    with np.errstate(over="ignore"):
        m = h.copy()
        m ^= m >> np.uint64(33)
        m *= np.uint64(0xFF51AFD7ED558CCD)
        m ^= m >> np.uint64(33)
        m *= np.uint64(0xC4CEB9FE1A85EC53)
        m ^= m >> np.uint64(33)
    return m


def _values_to_hashes(col) -> np.ndarray:
    import pyarrow.compute as pc

    if not pa.types.is_string(col.type):  # canonical string form
        col = pc.cast(col, pa.string())
    return _mix64(hash_strings(col))


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------

def cms_build(ds, *, col: str, width: int = 4096, depth: int = 4,
              weight_col: str | None = None) -> np.ndarray:
    """Count-min sketch (depth × width int64) over a column; optional
    integer weights. Per-batch partials merge by addition (two-level
    reduce, bloom-style)."""

    def _partial(batch: pa.Table) -> pa.Table:
        cms = np.zeros((depth, width), np.int64)
        if batch.num_rows:
            h = _values_to_hashes(batch[col])
            idx = _row_hashes(h, depth, width)
            w = (batch[weight_col].to_numpy(zero_copy_only=False)
                 .astype(np.int64) if weight_col
                 else np.ones(h.size, np.int64))
            for d in range(depth):
                np.add.at(cms[d], idx[d], w)
        return pa.table({"sk": pa.array([cms.tobytes()], pa.binary())})

    return _reduce_sketch(ds, _partial, (depth, width), np.int64,
                          np.add)


def cms_query(cms: np.ndarray, items) -> np.ndarray:
    """Point estimates (int64) — min over rows; NEVER under-counts."""
    depth, width = cms.shape
    h = _mix64(hash_strings([str(v) for v in items]))
    idx = _row_hashes(h, depth, width)
    est = cms[0, idx[0]]
    for d in range(1, depth):
        est = np.minimum(est, cms[d, idx[d]])
    return est


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_build(ds, *, col: str, p: int = 12) -> np.ndarray:
    """HLL registers (uint8[2^p]) over a column; partials merge by
    element-wise max."""
    m = 1 << p

    def _partial(batch: pa.Table) -> pa.Table:
        reg = np.zeros(m, np.uint8)
        if batch.num_rows:
            h = _values_to_hashes(batch[col])
            bucket = (h >> np.uint64(64 - p)).astype(np.int64)
            rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
            # rank = leading zeros of the remaining 64-p bits + 1
            cur = rest.copy()
            lz = np.zeros(h.size, np.int64)
            for shift in (32, 16, 8, 4, 2, 1):
                mask = cur < (np.uint64(1) << np.uint64(64 - shift))
                lz += np.where(mask, shift, 0)
                cur = np.where(mask, cur << np.uint64(shift), cur)
            rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
            np.maximum.at(reg, bucket, rank)
        return pa.table({"sk": pa.array([reg.tobytes()], pa.binary())})

    return _reduce_sketch(ds, _partial, (m,), np.uint8, np.maximum)


def hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with the linear-counting small-range
    correction."""
    m = reg.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.ldexp(1.0, -reg.astype(np.int64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, *, col: str, p: int = 12) -> float:
    return hll_estimate(hll_build(ds, col=col, p=p))


# ---------------------------------------------------------------------------
# shared two-level reduce
# ---------------------------------------------------------------------------

def _reduce_sketch(ds, partial_fn, shape, dtype, op):
    partials = ds.map_batches(partial_fn, batch_format="pyarrow")

    def _merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"sk": pa.array([], pa.binary())})
        acc = np.zeros(shape, dtype)
        for buf in batch["sk"].to_pylist():
            acc = op(acc, np.frombuffer(buf, dtype).reshape(shape))
        return pa.table({"sk": pa.array([acc.tobytes()], pa.binary())})

    reduced = partials.repartition(8).map_batches(
        _merge, batch_format="pyarrow", batch_size=None)
    acc = np.zeros(shape, dtype)
    for row in reduced.take_all():
        acc = op(acc, np.frombuffer(row["sk"], dtype).reshape(shape))
    return acc
