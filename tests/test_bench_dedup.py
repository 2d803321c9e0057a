"""bench.py dedup_10x corpus: cluster collapse through the FORCED
distributed connected-components path (small_graph_threshold=0)."""

import numpy as np


def test_dedup_corpus_collapses_through_distributed_cc():
    import bench
    from opengxt_ray.textops.dedup import minhash_dedup

    docs = bench.synth_dedup_corpus(5000)
    out = minhash_dedup(docs, small_graph_threshold=0).to_pandas()
    assert len(out) == 5000
    out["cluster"] = out["doc_id"] // 5
    per_cluster = out.groupby("cluster")["rep_id"].nunique()
    # LSH recall envelope: a 1-word variant can miss all 16 bands with
    # small probability — require >=98% full collapse, zero false merges
    assert (per_cluster == 1).mean() >= 0.98
    merged = out.groupby("rep_id")["cluster"].nunique()
    assert (merged == 1).all()
    mins = out.groupby("rep_id")["doc_id"].min()
    assert (mins == mins.index).all()


def test_duplicate_window_hits_planted():
    """Plant an exact 20-word span in 3 docs among noise docs: every
    occurrence (and nothing else) is reported at the right offset."""
    import pyarrow as pa
    import ray

    from opengxt_ray.textops.dedup import duplicate_window_hits

    span = " ".join(f"s{i}" for i in range(20))
    rs = np.random.RandomState(4)
    docs, ids = [], []
    for d in range(10):
        words = [f"w{d}_{j}" for j in range(30)]  # globally unique words
        if d in (2, 5, 9):
            at = 3 + d  # different offsets
            words[at:at + 20] = span.split(" ")
        docs.append(" ".join(words))
        ids.append(d)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(docs, pa.string())}))
    hits = duplicate_window_hits(ds, window=20).to_pandas() \
        .sort_values(["doc_id", "pos"]).reset_index(drop=True)
    got = set(map(tuple, hits[["doc_id", "pos"]].to_numpy()))
    assert got == {(2, 3 + 2 + 1), (5, 3 + 5 + 1), (9, 3 + 9 + 1)}
