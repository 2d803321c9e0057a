"""Deterministic table sampling.

The reference has NO table-sampling operator (SURVEY §2.8 — only
random point *generation*); a large-scale pipeline needs one that is
reproducible across runs and partitionings. ``deterministic_sample``
keeps a row iff a multiplicative hash of its integer key lands under
the rate — stateless, vectorized, shuffle-free, and independent of
block boundaries (unlike ``Dataset.random_sample``, whose output
depends on execution nondeterminism).

Hash: Knuth multiplicative (key+salt) × 2⁶⁴/φ mod 2⁶⁴, then the HIGH
32 bits mod 10_000 (low product bits are lattice-patterned) — exactly
replicable in DuckDB with HUGEINT wraparound arithmetic, so the op is
SQL-oracle-checkable (gate query ``table_sample``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PHI64 = np.uint64(0x9E3779B97F4A7C15)


def sample_mask(keys: np.ndarray, rate_bp: int, salt: int = 0) -> np.ndarray:
    """True where the row is kept; ``rate_bp`` in basis points of
    10_000 (e.g. 1_000 = 10%)."""
    k = keys.astype(np.uint64) + np.uint64(salt)
    h = k * _PHI64
    return ((h >> np.uint64(32)) % np.uint64(10_000)) < np.uint64(rate_bp)


def deterministic_sample(ds, key_col: str, *, rate_bp: int, salt: int = 0):
    """Keep ~rate_bp/10_000 of rows by hashed key — reproducible across
    runs, partitionings and cluster sizes."""
    if not 0 <= rate_bp <= 10_000:
        raise ValueError("rate_bp must be in [0, 10000]")

    def _f(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        mask = sample_mask(keys, rate_bp, salt)
        return batch.filter(pa.array(mask))

    return ds.map_batches(_f, batch_format="pyarrow")
