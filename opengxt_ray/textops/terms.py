"""Corpus term statistics: global top-k terms and per-document
TF-IDF-style keyword extraction — the vocabulary/keyword passes a
training-data pipeline runs for corpus analytics and filter-list
construction (cf. Gopher's vocabulary audits, C4's blocklists).

Integer-exact formulation: ranking keys are (tf DESC, df ASC, term
ASC) — term frequency breaks toward rarer corpus terms exactly like
tf·idf does for fixed tf, but with no float logs, so the DuckDB
window oracle hash-matches.

Scale shape:
- Per-batch term explosion is ONE ``str.split`` pass over the
  NUL-joined batch + ``np.unique`` — no per-row Python in the count
  kernels; only ``(term, cnt)`` / ``(term, df)`` partials shuffle
  (vocabulary-bounded, not corpus-bounded).
- The document-frequency table broadcasts once (``core.broadcast``
  token) and the keyword pass is lexsort/reduceat per batch.
- Driver materialization is vocabulary-sized with a raise-past-cap
  guard, same envelope as ``charlm``.

No reference counterpart (the reference has no text ops); nearest
analog is the StatisticsFeatures family
(GT/statistics/StatisticsFeaturesProcess.java:1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.util import default_concurrency


def _explode(texts):
    """All words of a batch + per-doc word counts, one split pass."""
    if not texts:
        return np.empty(0, object), np.empty(0, np.int64)
    per_doc = [t.split(" ") if t else [] for t in texts]
    counts = np.array([len(w) for w in per_doc], np.int64)
    flat = np.array([w for ws in per_doc for w in ws], dtype=object)
    return flat, counts


def term_count_partials(batch: pa.Table, *, text_col: str) -> pa.Table:
    """(term, cnt, df) partials for one batch: cnt = occurrences,
    df = distinct docs containing the term (within the batch —
    summed across batches df stays exact only for cnt; df partials
    are made exact by deduplicating (doc, term) first)."""
    texts = [t or "" for t in batch[text_col].to_pylist()]
    flat, counts = _explode(texts)
    if flat.size == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "df": pa.array([], pa.int64())})
    terms, inv, cnts = np.unique(flat, return_inverse=True,
                                 return_counts=True)
    doc_ids = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    # exact df partial: distinct (doc, term) pairs in this batch
    pair = doc_ids * np.int64(len(terms)) + inv
    uniq_pairs = np.unique(pair)
    df = np.bincount((uniq_pairs % len(terms)).astype(np.int64),
                     minlength=len(terms))
    return pa.table({"term": pa.array(terms.astype(str), pa.string()),
                     "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
                     "df": pa.array(df.astype(np.int64), pa.int64())})


def term_table(ds, *, text_col: str = "text",
               max_vocab: int = 1 << 22):
    """Corpus-wide (term, cnt, df) as numpy arrays (term-sorted).
    Exactness note: summed ``df`` partials are exact only when each
    document lies in ONE batch (map_batches never splits a row, so
    this always holds)."""
    import ray

    partials = ds.map_batches(term_count_partials, batch_format="pyarrow",
                              fn_kwargs={"text_col": text_col})
    agg = partials.groupby("term", num_partitions=8).sum(["cnt", "df"])
    rows = agg.take_all()
    if len(rows) > max_vocab:
        raise ValueError(
            f"term vocabulary {len(rows)} exceeds max_vocab {max_vocab}")
    terms = np.array([r["term"] for r in rows], dtype=object)
    cnt = np.array([r["sum(cnt)"] for r in rows], np.int64)
    df = np.array([r["sum(df)"] for r in rows], np.int64)
    order = np.argsort(terms)
    return terms[order], cnt[order], df[order]


def top_terms(ds, *, text_col: str = "text", k: int = 50,
              max_vocab: int = 1 << 22) -> pa.Table:
    """Global top-k terms by occurrence count, ties broken by term
    ASC (deterministic — matches the SQL ORDER BY cnt DESC, term).
    Returns an Arrow table (term, cnt)."""
    terms, cnt, _ = term_table(ds, text_col=text_col,
                               max_vocab=max_vocab)
    if terms.size == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    order = np.lexsort((terms.astype(str), -cnt))[:k]
    return pa.table({"term": pa.array(terms[order].astype(str),
                                      pa.string()),
                     "cnt": pa.array(cnt[order], pa.int64())})


class _KeywordExtractor:
    """Actor stage: df table fetched once per actor; per-batch
    lexsort/reduceat (doc, term) tf counting, per-doc top-k by
    (tf DESC, df ASC, term ASC)."""

    def __init__(self, token, text_col, id_col, k):
        from ..core.broadcast import resolve_state
        self.terms, self.df = resolve_state(token)
        self.text_col = text_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        flat, counts = _explode(texts)
        if flat.size == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64),
                            counts)
        uterm, inv = np.unique(flat, return_inverse=True)
        # tf per (doc, term): sort by packed key, reduceat
        key = doc_idx * np.int64(len(uterm)) + inv
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], ks[1:] != ks[:-1]]))
        tf = np.diff(np.concatenate([starts, [ks.size]]))
        gkey = ks[starts]
        gdoc = (gkey // len(uterm)).astype(np.int64)
        gterm = (gkey % len(uterm)).astype(np.int64)
        # corpus df lookup (terms sorted)
        pos = np.searchsorted(self.terms, uterm[gterm])
        pos = np.clip(pos, 0, max(self.terms.size - 1, 0))
        found = (self.terms.size > 0) & (self.terms[pos] == uterm[gterm])
        gdf = np.where(found, self.df[pos], 0).astype(np.int64)
        # per-doc top-k by (tf DESC, df ASC, term ASC):
        # lexsort is last-key-primary → (term, df, -tf, doc)
        sel = np.lexsort((uterm[gterm].astype(str), gdf, -tf, gdoc))
        gdoc_s = gdoc[sel]
        new_doc = np.concatenate([[True], gdoc_s[1:] != gdoc_s[:-1]])
        rank = np.arange(gdoc_s.size) - np.maximum.accumulate(
            np.where(new_doc, np.arange(gdoc_s.size), 0))
        keep = sel[rank < self.k]
        return pa.table({
            self.id_col: pa.array(ids[gdoc[keep]], pa.int64()),
            "term": pa.array(uterm[gterm[keep]].astype(str),
                             pa.string()),
            "tf": pa.array(tf[keep], pa.int64()),
            "df": pa.array(gdf[keep], pa.int64())})


def doc_keywords(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 3, term_stats=None,
                 max_vocab: int = 1 << 22,
                 concurrency: int | None = None):
    """Per-document top-k keywords: rank terms by (tf DESC, corpus-df
    ASC, term ASC) — the integer-exact tf·idf ordering. Two passes:
    corpus df table (vocabulary-bounded shuffle, broadcast once), then
    a vectorized per-batch extraction. Output: (id, term, tf, df)."""
    from ..core.broadcast import put_broadcast

    if term_stats is None:
        terms, _, df = term_table(ds, text_col=text_col,
                                  max_vocab=max_vocab)
    else:
        terms, df = term_stats
    token = put_broadcast((terms, df))
    return ds.map_batches(
        _KeywordExtractor, batch_format="pyarrow",
        fn_constructor_args=(token, text_col, id_col, k),
        concurrency=concurrency or default_concurrency(),
        batch_size=1024)


def inverted_index(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   num_partitions: int | None = None):
    """Inverted index build: term → (n_docs, sorted posting list) —
    the search-index construction pass over a corpus.

    Scale shape: per-batch distinct ``(term, doc)`` pairs shuffle
    (slim — the text never moves); terms are bucketized by hash and
    posting lists assembled VECTORIZED per bucket (lexsort + run
    detection; the per-term string join is the posting-list
    materialization itself, not avoidable work). Returns
    ``(term, n_docs, postings)`` with postings a comma-joined
    ascending id list (deterministic, SQL-mirrorable).
    """
    from ..core.fid import hash_strings
    from ..core.util import default_shuffle_partitions

    num_partitions = num_partitions or default_shuffle_partitions()

    def _pairs(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[text_col].to_pylist()]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        flat, counts = _explode(texts)
        if flat.size == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "bkt": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64),
                            counts)
        uterm, inv = np.unique(flat, return_inverse=True)
        pair = doc_idx * np.int64(len(uterm)) + inv
        up = np.unique(pair)
        t_i = (up % len(uterm)).astype(np.int64)
        d_i = (up // len(uterm)).astype(np.int64)
        terms = uterm[t_i].astype(str)
        h = hash_strings(list(terms))
        with np.errstate(over="ignore"):
            m = h * np.uint64(0x9E3779B97F4A7C15)
        bkt = ((m >> np.uint64(40)).astype(np.int64)
               % np.int64(num_partitions * 8))
        return pa.table({"term": pa.array(terms, pa.string()),
                         id_col: pa.array(ids[d_i], pa.int64()),
                         "bkt": pa.array(bkt, pa.int64())})

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")

    def _assemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # empty shuffle partition — typed
            return pa.table({"term": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.string())})
        t = np.asarray(group["term"].to_pylist(), dtype=object)
        d = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t.astype(str)))
        ts, ds_ = t[order], d[order]
        new_t = np.concatenate([[True], ts[1:] != ts[:-1]])
        # cross-batch duplicates of the same (term, doc) pair collapse
        dup = np.concatenate([[False],
                              (ts[1:] == ts[:-1]) & (ds_[1:] == ds_[:-1])])
        keep = ~dup
        ts, ds_, new_t = ts[keep], ds_[keep], new_t[keep]
        starts = np.flatnonzero(new_t)
        ends = np.concatenate([starts[1:], [ts.size]])
        terms_out, n_out, post_out = [], [], []
        for s, e in zip(starts, ends):
            terms_out.append(str(ts[s]))
            n_out.append(int(e - s))
            post_out.append(",".join(str(int(x)) for x in ds_[s:e]))
        return pa.table({"term": pa.array(terms_out, pa.string()),
                         "n_docs": pa.array(n_out, pa.int64()),
                         "postings": pa.array(post_out, pa.string())})

    return pairs.groupby("bkt", num_partitions=num_partitions) \
        .map_groups(_assemble, batch_format="pyarrow")
