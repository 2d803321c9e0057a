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
