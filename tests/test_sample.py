"""Deterministic hash sampling: reproducibility + rate + SQL parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.ops.sample import deterministic_sample, sample_mask


def test_sample_reproducible_across_partitionings():
    tbl = pa.table({"k": pa.array(np.arange(10000, dtype=np.int64))})
    a = deterministic_sample(ray.data.from_arrow(tbl).repartition(3),
                             "k", rate_bp=1500).to_pandas()
    b = deterministic_sample(ray.data.from_arrow(tbl).repartition(17),
                             "k", rate_bp=1500).to_pandas()
    assert sorted(a["k"]) == sorted(b["k"])
    # rate within 3 sigma of binomial
    n, p = 10000, 0.15
    assert abs(len(a) - n * p) < 3 * np.sqrt(n * p * (1 - p))


def test_sample_salt_changes_selection_and_bounds():
    keys = np.arange(5000, dtype=np.int64)
    m1 = sample_mask(keys, 1000, salt=0)
    m2 = sample_mask(keys, 1000, salt=1)
    assert (m1 != m2).any()
    assert sample_mask(keys, 0).sum() == 0
    assert sample_mask(keys, 10000).all()
    with pytest.raises(ValueError):
        deterministic_sample(ray.data.range(5), "id", rate_bp=10001)


def test_sample_matches_duckdb_hash():
    import duckdb

    keys = np.arange(1, 3000, dtype=np.int64)
    want = keys[sample_mask(keys, 2500, salt=7)]
    got = duckdb.connect().execute("""
        SELECT k FROM range(1, 3000) t(k)
        WHERE CAST((CAST(((CAST(k AS HUGEINT) + 7)
                          * 11400714819323198485)
                         % 18446744073709551616 AS UBIGINT)
                    // 4294967296) % 10000 AS BIGINT) < 2500
    """).df()["k"].to_numpy()
    assert np.array_equal(np.sort(want), np.sort(got))
