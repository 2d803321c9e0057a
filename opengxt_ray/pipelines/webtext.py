"""End-to-end crawl curation pipeline — the webtext north-star slice:
the full funnel a training-data team runs from raw Common-Crawl
containers to a deduplicated, quality-filtered, resumable corpus.

    WARC shards (per-record gzip)
      → streaming shard read (1 task/shard, HTTP strip)
      → robots.txt deny filter (RFC 9309, vectorized)
      → charset-sniffing decode (never raises on hostile pages)
      → HTML→text extraction (actor pool, wide payload dropped)
      → Unicode normalization (NFC + casefold + whitespace squash)
      → quality funnel (word count / TTR / char-LM fluency,
        integer cross-multiplied keep rules)
      → exact dedup on the normalized text (hash groupby keep-min)
      → checkpointed partitioned parquet (resume skips done buckets)

Every stage is an already-gated operator; this module is the
composition glue plus the projection discipline (the wide html/text
payloads never enter a shuffle — the dedup key shuffle carries only
16-byte hashes, and the final join-back is by id).

Scale notes: the funnel stages are all map-shaped (stream through,
no barrier); the only shuffles are the vocabulary-bounded charlm
count, the dedup hash groupby, and the output bucketing.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources import warc as W
from ..textops.charlm import charlm_score
from ..textops.htmlops import html_to_text
from ..textops.normalize import normalize_text_batch
from ..textops.urlops import match_robots_batch, parse_robots


def curate_crawl(warc_paths, *, robots_txt: str = "",
                 min_bigrams: int = 50, min_freq_per_bigram: int = 0,
                 ttr_num: int = 3, ttr_den: int = 10,
                 charlm_freq=None, scratch_dir: str | None = None,
                 out_dir: str | None = None, nbuckets: int = 16):
    """Raw WARC shards → curated (url, text, metrics) Dataset.

    With ``out_dir`` the result is written as checkpoint-resumable
    bucketed parquet and the Dataset of surviving rows is returned
    lazily re-read from it; without, the lazy Dataset is returned
    directly. Thresholds are integers (cross-multiplied ratios) so
    reruns are bit-stable.
    """
    ds = W.warc_dataset(warc_paths, columns=["url", "payload"])

    # robots deny filter on the URL path (cheap, before any decode)
    if robots_txt:
        rules = parse_robots(robots_txt)

        def _robots(b: pa.Table) -> pa.Table:
            path = pc.replace_substring_regex(
                b["url"], r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
            path = pc.if_else(pc.equal(path, ""), "/", path)
            tb = b.append_column("path", path)
            tb = match_robots_batch(tb, rules)
            return tb.filter(tb["allowed"]).select(["url", "payload"])

        ds = ds.map_batches(_robots, batch_format="pyarrow")

    # charset sniff + decode, then drop the raw payload immediately
    ds = W.decode_payloads(ds, out_col="html_text")
    ds = ds.map_batches(
        lambda b: pa.table({
            "url": b["url"],
            "html": pc.cast(b["html_text"], pa.binary())}),
        batch_format="pyarrow")

    # html → text (actor pool; html payload dropped by default).
    # TWO actor pools share this DAG (extract + charlm scorer): SPLIT
    # the pool budget or they starve the task CPUs and deadlock ≤4-CPU
    # sessions (repo actor-pool-budget lore)
    from ..core.util import default_concurrency

    pool = max(1, default_concurrency() // 2)
    ds = html_to_text(ds, html_col="html", concurrency=pool)

    # normalization + per-doc word stats in one pass
    def _norm_stats(b: pa.Table) -> pa.Table:
        nb = normalize_text_batch(b, text_col="text_extracted",
                                  out_col="text")
        nw, nu = [], []
        for t in nb["text"].to_pylist():
            ws = (t or "").split(" ")
            nw.append(len(ws))
            nu.append(len(set(ws)))
        return pa.table({"url": nb["url"], "text": nb["text"],
                         "n_words": pa.array(nw, pa.int64()),
                         "n_uniq": pa.array(nu, pa.int64())})

    ds = ds.map_batches(_norm_stats, batch_format="pyarrow")

    # char-LM fluency + integer keep rules. Default trains the LM on
    # this corpus (a SECOND pass over the shards — Ray re-executes the
    # extract lineage for the count pass); production crawls pass
    # ``charlm_freq`` from a reference corpus (the CCNet formulation:
    # score under a CLEAN LM) which makes the whole funnel SINGLE-pass
    scored = charlm_score(ds, text_col="text", id_col="url",
                          keep_cols=("text", "n_words", "n_uniq"),
                          freq=charlm_freq, concurrency=pool)

    def _keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.greater_equal(b["n_bigrams"], min_bigrams),
            pc.greater_equal(pc.multiply(b["n_uniq"], ttr_den),
                             pc.multiply(b["n_words"], ttr_num))),
            pc.greater_equal(
                b["sum_freq"],
                pc.multiply(b["n_bigrams"], min_freq_per_bigram)))
        return b.filter(m)

    kept = scored.map_batches(_keep, batch_format="pyarrow")

    # The dedup tail consumes ``kept`` TWICE (winner selection +
    # payload re-attach); without a boundary Ray re-executes the whole
    # extract lineage for each branch. ``scratch_dir`` checkpoints the
    # funnel output (slim text + metrics, html long gone) as resumable
    # bucketed parquet and re-reads it — the production stage-boundary
    # shape (also where a crashed run resumes from).
    if scratch_dir is not None:
        import glob as _glob

        from ..state.checkpoint import checkpointed_write

        checkpointed_write(kept, scratch_dir, key_col="url",
                           num_buckets=nbuckets, stage="funnel")
        import ray as _ray

        kept = _ray.data.read_parquet(sorted(_glob.glob(
            f"{scratch_dir}/bucket=*/*.parquet")))

    # exact dedup on normalized text, repo shuffle discipline: the
    # groupby shuffles ONLY (16-byte hash, url); the surviving url set
    # then re-attaches the wide text by one bounded hash join
    # (slim_join_reattach — text crosses the exchange exactly once)
    from ..core.fid import hash_strings
    import numpy as np

    def _hash_slim(b: pa.Table) -> pa.Table:
        h = hash_strings(b["text"]).view(np.int64)
        return pa.table({"text_hash": pa.array(h, pa.int64()),
                         "url": b["url"]})

    import ray
    import ray.data.aggregate as A

    winners = kept.map_batches(_hash_slim, batch_format="pyarrow") \
        .groupby("text_hash").aggregate(A.Min("url"))
    slim = winners.map_batches(
        lambda b: pa.table({"url": b["min(url)"]}),
        batch_format="pyarrow")

    from ..ops.join import slim_join_reattach

    out = slim_join_reattach(
        slim, kept, key="url",
        payload_cols=["text", "n_words", "n_uniq",
                      "n_bigrams", "sum_freq"])

    if out_dir is not None:
        from ..state.checkpoint import checkpointed_write

        checkpointed_write(out, out_dir, key_col="url",
                           num_buckets=nbuckets, stage="curate")
        import glob

        parts = sorted(glob.glob(f"{out_dir}/bucket=*/*.parquet"))
        return ray.data.read_parquet(parts)
    return out
