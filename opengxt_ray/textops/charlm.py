"""Corpus character-LM fluency scoring (CCNet/KenLM-style quality
signal, integer-exact formulation).

Real pipelines score documents with a language-model perplexity and
drop the tails (CCNet, Wenzek et al. 2020).  A float cross-entropy is
order-sensitive, so this engine uses the integer-exact equivalent: the
corpus-frequency sum of a document's character bigrams.  Rank order is
identical to a unigram-backoff bigram LM's likelihood under a
monotone map, every value is an int64, and the DuckDB oracle matches
hash-for-hash.

Two Ray Data passes, both scale-clean:

1. **Count** — per-batch vectorized bigram extraction (one
   ``utf-32-le`` ``np.frombuffer`` over the NUL-joined batch, packed
   ``(a<<32)|b`` keys, ``np.unique`` partials) → tiny
   ``groupby(bigram_key).sum`` — only ``(key, cnt)`` partials shuffle,
   bounded by the distinct-bigram vocabulary (≈ charset², NOT corpus
   size).  The finished table is vocabulary-sized; we raise past
   ``max_vocab`` instead of silently flooding the driver.
2. **Score** — the frequency table is broadcast once (``ray.put`` of
   two sorted numpy arrays) and every batch scores its documents with
   ``searchsorted`` + ``np.add.reduceat``; no per-row Python in the
   hot path.

No reference counterpart (the reference has no text-quality ops);
nearest analog is the statistics family, e.g.
GT/statistics/DataStatisticsProcess.java:1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.util import default_concurrency


def _packed_bigrams(texts):
    """Vectorized char bigrams for a batch of strings.

    Returns (packed int64 array of all bigrams in document order,
    per-document bigram counts int64).  One encode + one frombuffer
    for the whole batch; the NUL separator never forms a valid bigram
    because NUL is masked from both sides of the pair.
    """
    if not texts:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    joined = "\x00".join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if codes.size < 2:
        return (np.empty(0, np.int64),
                np.maximum(np.array([len(t) for t in texts],
                                    np.int64) - 1, 0))
    a, b = codes[:-1], codes[1:]
    valid = (a != 0) & (b != 0)
    packed = ((a.astype(np.uint64) << np.uint64(32))
              | b.astype(np.uint64)).view(np.int64)[valid]
    nbig = np.maximum(
        np.array([len(t) for t in texts], np.int64) - 1, 0)
    return packed, nbig


def _count_batch(batch: pa.Table, *, text_col: str) -> pa.Table:
    texts = batch[text_col].to_pylist()
    packed, _ = _packed_bigrams([t or "" for t in texts])
    if packed.size == 0:
        # typed empty — schema-less empties poison downstream shuffles
        return pa.table({"bigram_key": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    keys, cnts = np.unique(packed, return_counts=True)
    return pa.table({"bigram_key": pa.array(keys, pa.int64()),
                     "cnt": pa.array(cnts.astype(np.int64), pa.int64())})


def bigram_frequency_table(ds, *, text_col: str = "text",
                           max_vocab: int = 1 << 22):
    """Corpus-wide char-bigram counts as two sorted numpy arrays
    ``(keys, cnts)``.  The shuffle moves only per-batch ``(key, cnt)``
    partials; the result is vocabulary-sized (charset², independent of
    corpus size) so the driver materialization is bounded — we raise
    past ``max_vocab`` rather than flood the driver.
    """
    partials = ds.map_batches(_count_batch, batch_format="pyarrow",
                              fn_kwargs={"text_col": text_col})
    agg = partials.groupby("bigram_key", num_partitions=8).sum("cnt")
    rows = agg.take_all()
    if len(rows) > max_vocab:
        raise ValueError(
            f"bigram vocabulary {len(rows)} exceeds max_vocab "
            f"{max_vocab}; broadcast table would not fit — shard the "
            "frequency table or raise max_vocab explicitly")
    if not rows:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    keys = np.array([r["bigram_key"] for r in rows], np.int64)
    cnts = np.array([r["sum(cnt)"] for r in rows], np.int64)
    order = np.argsort(keys)
    return keys[order], cnts[order]


class _Scorer:
    """Actor-pool scoring stage: the broadcast frequency table is
    fetched ONCE per actor in ``__init__`` (never re-shipped per
    batch)."""

    def __init__(self, freq_token, text_col: str, id_col: str,
                 keep_cols: tuple = ()):
        from ..core.broadcast import resolve_state
        self.keys, self.cnts = resolve_state(freq_token)
        self.text_col = text_col
        self.id_col = id_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        packed, nbig = _packed_bigrams(texts)
        sums = np.zeros(len(texts), np.int64)
        if packed.size and self.keys.size:
            idx = np.searchsorted(self.keys, packed)
            idx = np.clip(idx, 0, self.keys.size - 1)
            freq = np.where(self.keys[idx] == packed,
                            self.cnts[idx], 0).astype(np.int64)
            nz = np.flatnonzero(nbig > 0)
            if nz.size:
                offsets = np.zeros(nz.size, np.int64)
                offsets[1:] = np.cumsum(nbig[nz])[:-1]
                sums[nz] = np.add.reduceat(freq, offsets)
        cols = {self.id_col: batch[self.id_col],
                "n_bigrams": pa.array(nbig, pa.int64()),
                "sum_freq": pa.array(sums, pa.int64())}
        for c in self.keep_cols:
            cols[c] = batch[c]
        return pa.table(cols)


def charlm_score(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 freq=None, max_vocab: int = 1 << 22,
                 concurrency: int | None = None,
                 keep_cols: tuple = ()):
    """Score every document by the corpus-frequency sum of its char
    bigrams (integer-exact LM fluency signal).

    Output: ``(id_col, n_bigrams, sum_freq)`` — all int64.  A
    low ``sum_freq / n_bigrams`` marks documents whose character
    transitions are rare in the corpus (boilerplate, encoding noise,
    foreign scripts), exactly the role of the CCNet perplexity filter.

    ``freq`` may be a precomputed ``(keys, cnts)`` pair (e.g. from a
    reference corpus — the CCNet formulation scores target docs under
    a *clean* LM); default is the input corpus itself.
    """
    from ..core.broadcast import put_broadcast

    if freq is None:
        freq = bigram_frequency_table(ds, text_col=text_col,
                                      max_vocab=max_vocab)
    # restart-safe broadcast token (ray#53727 — see core/broadcast.py)
    freq_token = put_broadcast(freq)
    return ds.map_batches(
        _Scorer, batch_format="pyarrow",
        fn_constructor_args=(freq_token, text_col, id_col, keep_cols),
        concurrency=concurrency or default_concurrency(),
        batch_size=1024)
