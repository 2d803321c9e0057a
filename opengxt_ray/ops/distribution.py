"""Spatial distribution summaries — mean/median center, standard
distance, standard deviational ellipse, directional mean, central
feature.

Reference: GT/distribution/*Operation.java (SURVEY.md §2.5 table);
weighted mean center per GT/core/DistanceFactory.java:149-163; median
center is the iterative Weiszfeld point; SDE per the classic ArcGIS
formulas.

All are GLOBAL reductions: per-block weighted-moment partials via
``map_batches`` → single driver combine. Only the tiny partials move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _moment_partials(ds, xcol, ycol, weight_col):
    def _partial(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        w = (batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
             if weight_col else np.ones(len(batch)))
        return pa.table({
            "w": [float(w.sum())],
            "wx": [float((w * x).sum())], "wy": [float((w * y).sum())],
            "wx2": [float((w * x * x).sum())], "wy2": [float((w * y * y).sum())],
            "wxy": [float((w * x * y).sum())],
            "n": [len(x)],
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(c)
                            for c in ("w", "wx", "wy", "wx2", "wy2", "wxy", "n")])
    return {k[4:-1]: v for k, v in agg.items()}


def mean_center(ds, *, xcol="lon", ycol="lat", weight_col=None) -> dict:
    """MeanCenterOperation → {cx, cy, n}."""
    m = _moment_partials(ds, xcol, ycol, weight_col)
    return {"cx": m["wx"] / m["w"], "cy": m["wy"] / m["w"], "n": int(m["n"])}


def standard_distance(ds, *, xcol="lon", ycol="lat", weight_col=None) -> dict:
    """StandardDistanceOperation → {cx, cy, std_dist}.

    SD = √(Σw(x−x̄)²/W + Σw(y−ȳ)²/W).
    """
    m = _moment_partials(ds, xcol, ycol, weight_col)
    w = m["w"]
    cx, cy = m["wx"] / w, m["wy"] / w
    varx = m["wx2"] / w - cx ** 2
    vary = m["wy2"] / w - cy ** 2
    return {"cx": cx, "cy": cy,
            "std_dist": float(np.sqrt(max(varx + vary, 0.0)))}


def standard_deviational_ellipse(ds, *, xcol="lon", ycol="lat",
                                 weight_col=None) -> dict:
    """SDE → {cx, cy, sigma_x, sigma_y, rotation_deg} (1-σ ellipse)."""
    m = _moment_partials(ds, xcol, ycol, weight_col)
    w = m["w"]
    cx, cy = m["wx"] / w, m["wy"] / w
    a = m["wx2"] / w - cx ** 2          # var x
    b = m["wy2"] / w - cy ** 2          # var y
    c = m["wxy"] / w - cx * cy          # cov
    diff = a - b
    disc = np.sqrt(diff ** 2 + 4 * c ** 2)
    theta = np.arctan2(diff + disc, 2 * c) if c != 0 else (0.0 if a >= b else np.pi / 2)
    sx = np.sqrt(max((a + b + disc) / 2, 0.0))
    sy = np.sqrt(max((a + b - disc) / 2, 0.0))
    return {"cx": cx, "cy": cy, "sigma_x": float(sx), "sigma_y": float(sy),
            "rotation_deg": float(np.degrees(theta) % 180.0)}


def median_center(ds, *, xcol="lon", ycol="lat", weight_col=None,
                  iterations: int = 50, tol: float = 1e-9) -> dict:
    """MedianCenterOperation — Weiszfeld iteration, distributed: each
    iteration is one map_batches partial pass with the current center
    broadcast (bounded iterations, like the reference's loop)."""
    cur = mean_center(ds, xcol=xcol, ycol=ycol, weight_col=weight_col)
    cx, cy = cur["cx"], cur["cy"]
    for _ in range(iterations):
        def _partial(batch: pa.Table, cx=cx, cy=cy) -> pa.Table:
            x = batch[xcol].to_numpy()
            y = batch[ycol].to_numpy()
            w = (batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
                 if weight_col else np.ones(len(batch)))
            d = np.hypot(x - cx, y - cy)
            inv = np.where(d < 1e-12, 0.0, 1.0 / np.where(d < 1e-12, 1.0, d))
            return pa.table({
                "sw": [float((w * inv).sum())],
                "sx": [float((w * inv * x).sum())],
                "sy": [float((w * inv * y).sum())],
            })

        parts = ds.map_batches(_partial, batch_format="pyarrow")
        agg = parts.aggregate(*[ray.data.aggregate.Sum(c) for c in ("sw", "sx", "sy")])
        if agg["sum(sw)"] == 0:
            break
        nx, ny = agg["sum(sx)"] / agg["sum(sw)"], agg["sum(sy)"] / agg["sum(sw)"]
        if np.hypot(nx - cx, ny - cy) < tol:
            cx, cy = nx, ny
            break
        cx, cy = nx, ny
    return {"cx": float(cx), "cy": float(cy)}


def directional_mean(ds, *, xcol0, ycol0, xcol1, ycol1) -> dict:
    """DirectionalMeanOperation — linear directional mean of line
    segments (start/end coordinate columns) + circular variance."""

    def _partial(batch: pa.Table) -> pa.Table:
        dx = batch[xcol1].to_numpy() - batch[xcol0].to_numpy()
        dy = batch[ycol1].to_numpy() - batch[ycol0].to_numpy()
        ang = np.arctan2(dy, dx)
        return pa.table({
            "s": [float(np.sin(ang).sum())], "c": [float(np.cos(ang).sum())],
            "n": [len(dx)],
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(c) for c in ("s", "c", "n")])
    s, c, n = agg["sum(s)"], agg["sum(c)"], agg["sum(n)"]
    mean_deg = float(np.degrees(np.arctan2(s, c)) % 360.0)
    r = np.hypot(s, c) / n if n else 0.0
    return {"mean_direction_deg": mean_deg, "circular_variance": float(1 - r),
            "n": int(n)}


def central_feature(ds, *, id_col, xcol="lon", ycol="lat",
                    candidates: int = 64) -> dict:
    """CentralFeatureOperation — feature minimizing total distance to all
    others. Exact pairwise is O(n²); we use the standard approximation:
    take the `candidates` features nearest the mean center (one pass),
    then score each candidate against the full dataset (one pass) —
    the true central feature is overwhelmingly near the center.
    """
    mc = mean_center(ds, xcol=xcol, ycol=ycol)
    cx, cy = mc["cx"], mc["cy"]

    def _dist(batch: pa.Table) -> pa.Table:
        d = np.hypot(batch[xcol].to_numpy() - cx, batch[ycol].to_numpy() - cy)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # per-batch partial top-k (deterministic (d, id) order): the
        # global sort then moves only k rows per block instead of the
        # whole dataset through an all-to-all (round-4 scale audit)
        k = min(candidates, len(d))
        keep = np.lexsort((ids, d))[:k]
        t = batch.take(pa.array(keep))
        return pa.table({id_col: t[id_col], "x": t[xcol], "y": t[ycol],
                         "d": pa.array(d[keep])})

    near = (ds.map_batches(_dist, batch_format="pyarrow")
            .sort("d").limit(candidates).to_pandas())
    cand_x = near["x"].to_numpy()
    cand_y = near["y"].to_numpy()

    def _score(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        d = np.hypot(x[:, None] - cand_x[None, :], y[:, None] - cand_y[None, :])
        return pa.Table.from_arrays(
            [pa.array(d.sum(axis=0))], names=["s"]
        ).append_column("i", pa.array(np.arange(len(cand_x))))

    parts = ds.map_batches(_score, batch_format="pyarrow")
    tot = parts.groupby("i").aggregate(ray.data.aggregate.Sum("s")).to_pandas()
    tot = tot.sort_values("i")
    best = int(tot["sum(s)"].to_numpy().argmin())
    return {id_col: near[id_col].iloc[best],
            "x": float(cand_x[best]), "y": float(cand_y[best]),
            "total_dist": float(tot["sum(s)"].iloc[best])}
