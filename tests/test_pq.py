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


# ---------------------------------------------------------------------------
# IVF-PQ composition (round 5)
# ---------------------------------------------------------------------------

def test_ivfpq_full_probe_exact_when_codebook_covers(ray_session):
    """nprobe = nlist (no routing loss) + ksub ≥ distinct subvectors
    (no quantization loss) → IVF-PQ equals brute force exactly."""
    rs = np.random.RandomState(7)
    protos = rs.standard_normal((12, 32))
    V = protos[rs.randint(0, 12, 500)]
    Q = rs.standard_normal((6, 32))
    qids = np.arange(6)
    brute = A.brute_topk(_mk_ds(V), qids, Q, k=8).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    ivfpq = A.ivfpq_topk(_mk_ds(V), qids, Q, k=8, nlist=6, nprobe=6,
                         m=4, ksub=64, sample_n=500).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    # ADC sums the subspace dots in a different float order than one
    # flat dot product, so near-tied DISTINCT protos can flip by an
    # ulp; assert the result is an equally-good top-k: per rank, the
    # returned id's TRUE cosine equals brute's score at that rank.
    np.testing.assert_allclose(ivfpq["score"], brute["score"],
                               rtol=1e-9)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    true = (Vn[ivfpq["vec_id"].to_numpy()]
            * Qn[ivfpq["query_id"].to_numpy()]).sum(axis=1)
    np.testing.assert_allclose(true, brute["score"], rtol=1e-6)
    # and within exact-tie groups the id tie-break is deterministic:
    # queries 0-4 (no boundary near-tie) match brute id-for-id
    head = ivfpq[ivfpq.query_id < 5]
    assert list(head["vec_id"]) == \
        list(brute[brute.query_id < 5]["vec_id"])


def test_ivfpq_partial_probe_quality_on_clusters(ray_session):
    """Clustered corpus, queries at cluster centers, nprobe ≪ nlist:
    IVF routing must confine results to the query's own cluster, and
    ADC scores must be near the true optimum. (Exact top-10 identity
    is NOT expected: within a tight cluster ADC scores tie, which is
    inherent to PQ, not a routing defect.)"""
    rs = np.random.RandomState(11)
    centers = rs.standard_normal((10, 32)) * 4
    V = np.vstack([c + 0.05 * rs.standard_normal((80, 32))
                   for c in centers])
    Q = centers[:4] + 0.01 * rs.standard_normal((4, 32))
    qids = np.arange(4)
    brute = A.brute_topk(_mk_ds(V), qids, Q, k=10).to_pandas()
    appx = A.ivfpq_topk(_mk_ds(V), qids, Q, k=10, nlist=10, nprobe=3,
                        m=4, ksub=128, sample_n=800).to_pandas()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    for qi, qid in enumerate(qids):
        got = appx[appx.query_id == qid]
        assert len(got) == 10
        # every result is a member of the query's true cluster
        assert ((got.vec_id // 80) == qi).all(), got.vec_id.tolist()
        # true cosine of every returned member ≈ the brute optimum
        true_best = brute[brute.query_id == qid].score.max()
        true_scores = Vn[got.vec_id.to_numpy()] @ Qn[qi]
        assert (true_scores > true_best - 0.01).all()


def test_ivfpq_deterministic(ray_session):
    rs = np.random.RandomState(5)
    V = rs.standard_normal((300, 32))
    Q = rs.standard_normal((3, 32))
    a = A.ivfpq_topk(_mk_ds(V), np.arange(3), Q, k=5, nlist=4,
                     nprobe=4, m=4, ksub=32, sample_n=300).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = A.ivfpq_topk(_mk_ds(V, nblocks=7), np.arange(3), Q, k=5,
                     nlist=4, nprobe=4, m=4, ksub=32,
                     sample_n=300).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)  # block layout must not change the answer
