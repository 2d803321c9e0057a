"""Deduplication for large text corpora — the training-data-pipeline
operator family (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup).

All stages are Ray-Data-native:
- exact: hash-partitioned ``groupby(text_hash)`` keep-min-id — only the
  16-byte hash + id shuffle, never the text.
- MinHash+LSH: shingle → minhash signature (vectorized permutations) →
  band keys (flat_map) → ``groupby(band_key)`` bucket → candidate pairs
  → optional exact-Jaccard verify per pair; connected components via
  iterated min-label propagation (bounded rounds).
- SimHash: 64-bit fingerprint; near-dup = identical fingerprint (or
  banded Hamming via 4×16-bit block keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..core.fid import hash_ints, hash_strings
from ..core.util import default_concurrency

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int | None = None):
    """Keep the min-id row per exactly-equal text. Returns
    (text_hash, keep_id) — join back for full rows if needed."""

    def _hash(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch[text_col])
        return pa.table({"text_hash": pa.array(h, pa.uint64()),
                         id_col: batch[id_col]})

    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    gb = hashed.groupby("text_hash", num_partitions=num_partitions)
    return gb.aggregate(ray.data.aggregate.Min(id_col))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of k-word shingles (uint64)."""
    words = text.lower().split()
    if len(words) < k:
        return hash_strings([" ".join(words)]) if words else np.empty(0, np.uint64)
    sh = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return hash_strings(sh)


class MinHasher:
    """Stateful map_batches stage: permutation parameters built once per
    actor (SURVEY.md §7.2 actor-pool pattern)."""

    MERSENNE = np.uint64((1 << 61) - 1)

    def __init__(self, num_perm: int = 128, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id",
                 emit_bands: int = 0):
        rs = np.random.RandomState(42)  # fixed seed: deterministic across actors
        self.a = rs.randint(1, (1 << 61) - 1, num_perm).astype(np.uint64)
        self.b = rs.randint(0, (1 << 61) - 1, num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        self.emit_bands = emit_bands  # >0: emit band keys directly (fused)

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (a*h + b) mod 2^64, matrix (n_shingles, num_perm)
            vals = h[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized across the whole batch: hash every shingle of every
        # doc in ONE hash_strings call, permute once, segment-min per doc
        texts = batch[self.text_col].to_pylist()
        all_shingles: list[str] = []
        offsets = [0]
        for t in texts:
            words = (t or "").lower().split()
            if len(words) == 0:
                pass
            elif len(words) < self.k:
                all_shingles.append(" ".join(words))
            else:
                all_shingles.extend(
                    " ".join(words[i : i + self.k])
                    for i in range(len(words) - self.k + 1))
            offsets.append(len(all_shingles))
        if not all_shingles:
            sigs = np.zeros((len(texts), self.num_perm), dtype=np.uint64)
        else:
            h = hash_strings(all_shingles)
            # permute UNIQUE shingle hashes only (big win on repetitive
            # corpora), mod-2^64 wraparound instead of Mersenne-61 (the
            # permutation family stays ~universal for min-hashing)
            uniq, inv = np.unique(h, return_inverse=True)
            with np.errstate(over="ignore"):
                uvals = uniq[:, None] * self.a[None, :] + self.b[None, :]
            vals = uvals[inv]
            starts = np.asarray(offsets[:-1])
            ends = np.asarray(offsets[1:])
            nonempty = ends > starts
            sigs = np.zeros((len(texts), self.num_perm), dtype=np.uint64)
            mins = np.minimum.reduceat(vals, starts[nonempty], axis=0)
            sigs[nonempty] = mins
        if self.emit_bands:
            return _band_key_rows(batch[self.id_col], sigs, self.emit_bands,
                                  self.id_col)
        return pa.table({
            self.id_col: batch[self.id_col],
            "sig": pa.array(list(sigs), pa.list_(pa.uint64(), self.num_perm)),
        })


def _band_key_rows(ids_arr, sigs: np.ndarray, bands: int,
                   id_col: str) -> pa.Table:
    """(n, num_perm) signatures → (n·bands) rows of (band_key, id)."""
    ids = ids_arr.to_numpy(zero_copy_only=False) if hasattr(
        ids_arr, "to_numpy") else np.asarray(ids_arr)
    n, p = sigs.shape
    rows = p // bands
    keys, out_ids = [], []
    for b in range(bands):
        seg = np.ascontiguousarray(sigs[:, b * rows : (b + 1) * rows])
        # vectorized segment hash: fold uint64 columns with splitmix
        kh = np.full(n, np.uint64(0xCBF29CE484222325))
        with np.errstate(over="ignore"):
            for c in range(rows):
                kh = hash_ints(kh ^ seg[:, c])
            kh = hash_ints(kh + np.uint64(b))
        keys.append(kh)
        out_ids.append(ids)
    return pa.table({
        "band_key": pa.array(np.concatenate(keys), pa.uint64()),
        id_col: pa.array(np.concatenate(out_ids)),
    })


def minhash_signatures(ds, *, num_perm=128, shingle_k=3,
                       text_col="text", id_col="doc_id",
                       concurrency=None):
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency(),
    )


def lsh_candidate_pairs(sig_ds, *, bands: int = 16, id_col: str = "doc_id"):
    """Band the signatures, bucket-groupby, emit candidate pairs
    (a < b). rows = num_perm/bands per band."""

    def _band_keys(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = np.stack(batch["sig"].to_numpy(zero_copy_only=False))
        n, p = sigs.shape
        rows = p // bands
        keys = []
        out_ids = []
        for b in range(bands):
            seg = np.ascontiguousarray(sigs[:, b * rows : (b + 1) * rows])
            kh = hash_ints(hash_strings([seg[i].tobytes() for i in range(n)])
                           + np.uint64(b))
            keys.append(kh)
            out_ids.append(ids)
        return pa.table({
            "band_key": pa.array(np.concatenate(keys), pa.uint64()),
            id_col: pa.array(np.concatenate(out_ids)),
        })

    banded = sig_ds.map_batches(_band_keys, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group[id_col].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        # emit star pairs to the min id (enough for connected components)
        a = np.full(len(ids) - 1, ids[0])
        return pa.table({"a": pa.array(a), "b": pa.array(ids[1:])})

    pairs = banded.groupby("band_key").map_groups(_pairs, batch_format="pyarrow")
    return pairs.groupby(["a", "b"]).count()  # dedup pairs


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard (verification kernel)."""
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup(ds, *, num_perm=128, bands=16, shingle_k=3,
                  text_col="text", id_col="doc_id",
                  num_partitions: int | None = 16):
    """Full near-dup pipeline → Dataset (doc_id, rep_id): each doc mapped
    to its duplicate-cluster representative (min id). Docs with no
    near-dups map to themselves."""
    banded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   text_col=text_col, id_col=id_col,
                                   emit_bands=bands),
        batch_format="pyarrow",
        concurrency=default_concurrency(),
    )

    def _star_edges(group: pa.Table) -> pa.Table:
        ids = np.sort(group[id_col].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"node": pa.array([], pa.int64()),
                             "rep": pa.array([], pa.int64())})
        return pa.table({"node": pa.array(ids[1:]),
                         "rep": pa.array(np.full(len(ids) - 1, ids[0]))})

    # duplicate edges across bands are harmless to the min-label reduce,
    # so no pair-dedup shuffle is needed
    edges = banded.groupby("band_key", num_partitions=num_partitions) \
        .map_groups(_star_edges, batch_format="pyarrow")
    # min-label per node (star contraction; one round suffices for
    # star-shaped edges emitted toward bucket-min ids; a second round
    # collapses chains rep→rep)
    lab = edges.groupby("node", num_partitions=num_partitions).aggregate(
        ray.data.aggregate.Min("rep"))
    lab = lab.map_batches(
        lambda b: pa.table({"node": b["node"], "rep": b["min(rep)"]}),
        batch_format="pyarrow")
    ids = ds.map_batches(lambda b: pa.table({"node": b[id_col]}),
                         batch_format="pyarrow")
    out = ids.join(lab, join_type="left_outer", num_partitions=8, on=("node",))

    def _final2(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rep = pc.coalesce(batch["rep"], batch["node"])
        return pa.table({id_col: batch["node"], "rep_id": rep})

    return out.map_batches(_final2, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, *, text_col="text", id_col="doc_id",
                  shingle_k: int = 2) -> pa.Table:
    """64-bit SimHash per doc + 4×16-bit block keys for banded Hamming
    bucketing."""
    texts = batch[text_col].to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        h = _shingle_hashes(t or "", shingle_k)
        if len(h) == 0:
            continue
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sh = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sh |= np.uint64(1) << np.uint64(b)
        out[i] = sh
    cols = {id_col: batch[id_col], "simhash": pa.array(out, pa.uint64())}
    for blk in range(4):
        cols[f"sh_block{blk}"] = pa.array(
            (out >> np.uint64(16 * blk)) & np.uint64(0xFFFF), pa.uint32())
    return pa.table(cols)


def simhash_dedup(ds, *, text_col="text", id_col="doc_id"):
    """Exact-simhash dedup: groupby(simhash) keep min id."""
    sh = ds.map_batches(
        lambda b: simhash_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")
    return sh.groupby("simhash").aggregate(ray.data.aggregate.Min(id_col))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup(ds, *, vec_col="embedding", id_col="vec_id",
                      threshold: float = 0.95, nbits: int = 12):
    """Near-dup via random-hyperplane LSH buckets + in-bucket exact
    cosine. Returns (a, b, cos) pairs above threshold.

    Hyperplanes are seeded → deterministic across workers.
    """

    def _bucket(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False))
        dim = vecs.shape[1]
        rs = np.random.RandomState(123)
        planes = rs.standard_normal((dim, nbits))
        bits = (vecs @ planes) > 0
        key = np.zeros(len(vecs), dtype=np.uint64)
        for b in range(nbits):
            key |= bits[:, b].astype(np.uint64) << np.uint64(b)
        return pa.table({
            "bucket": pa.array(key, pa.uint64()),
            id_col: batch[id_col],
            vec_col: batch[vec_col],
        })

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        vecs = np.stack(group[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        vn = vecs / norm
        sim = vn @ vn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        m = sim[iu, ju] >= threshold
        a = np.minimum(ids[iu[m]], ids[ju[m]])
        b = np.maximum(ids[iu[m]], ids[ju[m]])
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "cos": pa.array(sim[iu, ju][m])})

    return bucketed.groupby("bucket").map_groups(_pairs, batch_format="pyarrow")
