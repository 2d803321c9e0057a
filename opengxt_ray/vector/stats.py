"""Distributed embedding statistics: mean / covariance / PCA /
whitening — the preprocessing an embedding pipeline runs before
quantization or similarity search (PCA rotation is the first half of
OPQ; whitening equalizes subspace variance so PQ codebooks spend
bits evenly — Jégou et al. 2011, Ge et al. OPQ 2013, public).

One streaming pass: each batch contributes the sufficient statistics
``(n, Σx, ΣxxT)`` — a D-vector and a D×D matrix, independent of
corpus size — summed by a two-level reduce (bloom-style); the driver
finishes with one ``eigh`` of the D×D covariance. No corpus
materialization, no shuffle of vectors.

Float caveat (documented): partial sums combine in block order, so
covariance entries are reproducible only to float64 addition
reassociation (~1e-12 relative); tests use tolerances, there is no
hash-exact SQL oracle.

No reference counterpart; nearest analog is the PCA-flavored
statistics in GT/statistics (e.g. StatisticsFeaturesProcess.java:1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _moments_partial(batch: pa.Table, *, vec_col: str) -> pa.Table:
    if batch.num_rows == 0:
        return pa.table({"n": pa.array([], pa.int64()),
                         "mom": pa.array([], pa.binary())})
    V = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)
                 ).astype(np.float64)
    s = V.sum(axis=0)
    ss = V.T @ V
    payload = np.concatenate([s, ss.ravel()])
    return pa.table({"n": pa.array([len(V)], pa.int64()),
                     "mom": pa.array([payload.tobytes()], pa.binary())})


def embedding_moments(ds, *, vec_col: str = "embedding"):
    """(n, mean, covariance) of an embedding column in one streaming
    pass; driver holds only D + D² floats."""

    def _merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "mom": pa.array([], pa.binary())})
        n = int(np.sum(batch["n"].to_numpy()))
        acc = None
        for buf in batch["mom"].to_pylist():
            v = np.frombuffer(buf, np.float64)
            acc = v if acc is None else acc + v
        return pa.table({"n": pa.array([n], pa.int64()),
                         "mom": pa.array([acc.tobytes()], pa.binary())})

    partials = ds.map_batches(_moments_partial, batch_format="pyarrow",
                              fn_kwargs={"vec_col": vec_col})
    reduced = partials.repartition(8).map_batches(
        _merge, batch_format="pyarrow", batch_size=None)
    n = 0
    acc = None
    for row in reduced.take_all():
        n += int(row["n"])
        v = np.frombuffer(row["mom"], np.float64)
        acc = v.copy() if acc is None else acc + v
    if n == 0:
        raise ValueError("embedding_moments on an empty dataset")
    # D from |payload| = D + D²
    D = int((-1 + np.sqrt(1 + 4 * acc.size)) / 2)
    s = acc[:D]
    ss = acc[D:].reshape(D, D)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(ds, *, vec_col: str = "embedding", n_components: int | None = None,
            whiten: bool = False, eps: float = 1e-9):
    """PCA of the embedding column. Returns ``(mean, components,
    eigenvalues)`` with components as rows, sorted by eigenvalue
    DESC; sign fixed so each component's largest-|coordinate| entry is
    positive (deterministic across runs/block layouts up to float
    reassociation).

    With ``whiten``, components are pre-scaled by ``1/√(λ+eps)`` so
    ``(x − mean) @ components.T`` has identity covariance — the OPQ /
    PQ-balancing rotation."""
    _, mean, cov = embedding_moments(ds, vec_col=vec_col)
    w, U = np.linalg.eigh(cov)           # ascending
    order = np.argsort(w)[::-1]
    w = np.maximum(w[order], 0.0)
    comps = U[:, order].T                # rows = components
    # deterministic sign: largest-|entry| coordinate positive
    amax = np.argmax(np.abs(comps), axis=1)
    signs = np.sign(comps[np.arange(len(comps)), amax])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    if n_components is not None:
        comps = comps[:n_components]
        w = w[:n_components]
    if whiten:
        comps = comps / np.sqrt(w + eps)[:, None]
    return mean, comps, w


def pca_transform(ds, mean: np.ndarray, components: np.ndarray, *,
                  vec_col: str = "embedding", out_col: str | None = None):
    """Project every embedding: ``(x − mean) @ components.T`` —
    stateless vectorized batch map; the (D×d) matrix rides the task
    closure (small), output column is ``list<float>``."""
    out_col = out_col or vec_col
    mean = np.asarray(mean, np.float64)
    C = np.asarray(components, np.float64)

    def _proj(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {c: batch[c] for c in batch.column_names
                    if c != vec_col}
            cols[out_col] = pa.array([], pa.list_(pa.float32()))
            return pa.table(cols)
        V = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)
                     ).astype(np.float64)
        P = (V - mean) @ C.T
        cols = {c: batch[c] for c in batch.column_names
                if c not in (vec_col, out_col)}
        cols[out_col] = pa.array(
            [row for row in P.astype(np.float32)],
            pa.list_(pa.float32()))
        return pa.table(cols)

    return ds.map_batches(_proj, batch_format="pyarrow")
