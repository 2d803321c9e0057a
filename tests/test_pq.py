"""Product-quantization ANN (vector/ann.py PQ family): exactness in
the lossless regime, recall on clustered data, encode determinism and
compression, code-path reuse."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.vector import ann as A


def _mk_ds(V, ids=None, nblocks=4):
    ids = np.arange(len(V)) if ids is None else ids
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in V],
                                        pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(nblocks)


def test_pq_exact_when_codebook_covers_distinct(ray_session):
    """ksub ≥ distinct subvectors → zero reconstruction error → PQ
    result equals brute force exactly (ranks, ids, scores)."""
    rs = np.random.RandomState(3)
    protos = rs.standard_normal((12, 32))
    idx = rs.randint(0, 12, 400)
    V = protos[idx]  # only 12 distinct vectors
    Q = rs.standard_normal((5, 32))
    qids = np.arange(5)
    ds = _mk_ds(V)
    brute = A.brute_topk(ds, qids, Q, k=8).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pq = A.pq_topk(ds, qids, Q, k=8, m=4, ksub=64,
                   sample_n=400).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(pq["vec_id"]) == list(brute["vec_id"])
    np.testing.assert_allclose(pq["score"], brute["score"], rtol=1e-9)


def test_pq_retrieval_and_score_accuracy_on_clusters(ray_session):
    """Clustered embeddings (the realistic shape). Exact top-10 ORDER
    inside a tight cluster sits below PQ's quantization noise by
    construction (all 100 members are near-identical cosine), so the
    meaningful contracts are: (a) retrieved neighbors come from the
    query's cluster, (b) ADC scores track true cosine to within a
    small quantization error."""
    rs = np.random.RandomState(7)
    centers = rs.standard_normal((20, 64)) * 4
    V = np.vstack([c + rs.standard_normal((100, 64)) * 0.3
                   for c in centers])
    cluster_of = np.repeat(np.arange(20), 100)
    Q = centers[:6] + rs.standard_normal((6, 64)) * 0.2
    qids = np.arange(6)
    ds = _mk_ds(V, nblocks=8)
    pq = A.pq_topk(ds, qids, Q, k=10, m=8, ksub=128,
                   sample_n=2000).to_pandas()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    for q in range(6):
        hits = pq.loc[pq.query_id == q]
        assert len(hits) == 10
        # (a) every retrieved neighbor is in the query's cluster
        assert (cluster_of[hits["vec_id"].to_numpy()] == q).all()
        # (b) ADC score ≈ true cosine (quantization error bound)
        true = (Vn[hits["vec_id"].to_numpy()] * Qn[q]).sum(axis=1)
        assert np.abs(hits["score"].to_numpy() - true).max() < 0.05


def test_pq_encode_deterministic_and_compact(ray_session):
    rs = np.random.RandomState(11)
    V = rs.standard_normal((300, 64)).astype(np.float64)
    M = V / np.linalg.norm(V, axis=1, keepdims=True)
    books = A.train_pq_codebooks(M, m=8, ksub=32)
    assert books.shape == (8, 32, 8)
    ds = _mk_ds(V)
    c1 = A.pq_encode(ds, books).to_pandas().sort_values("vec_id")
    c2 = A.pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert list(c1["pq_code"]) == list(c2["pq_code"])
    assert all(len(c) == 8 for c in c1["pq_code"])  # 8 bytes per vector


def test_pq_reuses_precomputed_codes(ray_session):
    """Production shape: encode once, query many times — passing
    codes_ds+books skips retraining/re-encoding and matches."""
    rs = np.random.RandomState(13)
    V = rs.standard_normal((500, 32))
    Q = rs.standard_normal((3, 32))
    qids = np.arange(3)
    ds = _mk_ds(V)
    M = A._normalize(np.stack(V).astype(np.float64))
    books = A.train_pq_codebooks(M, m=4, ksub=64)
    codes = A.pq_encode(ds, books).materialize()
    a = A.pq_topk(ds, qids, Q, k=5, m=4, ksub=64,
                  books=books, codes_ds=codes).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = A.pq_topk(ds, qids, Q, k=5, m=4, ksub=64,
                  books=books).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(a["vec_id"]) == list(b["vec_id"])


def test_pq_validation():
    M = np.zeros((10, 30))
    with pytest.raises(ValueError, match="not divisible"):
        A.train_pq_codebooks(M, m=4)
    with pytest.raises(ValueError, match="uint8"):
        A.train_pq_codebooks(np.zeros((10, 32)), m=4, ksub=512)
