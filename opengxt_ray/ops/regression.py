"""Relationship operators: Pearson correlation, OLS regression,
standardized scores (z-scores).

Reference:
- Pearson: GT/operations/PearsonOperation.java (correlation matrix over
  fields).
- OLS: GT/relationship/OLSOperation.java:105-450 — y ~ X with
  coefficients, R², adjusted R², residual output; classic normal
  equations. Distributed as XᵀX / Xᵀy partials per block, driver solve,
  then a residual ``map_batches`` pass (SURVEY.md §2.4).
- StandardizedScores: GT/pattern/StandardizedScoresOperation.java —
  append (x−μ)/σ; two-pass (GLOBAL moments then stateless map).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def pearson(ds, cols: list[str]) -> dict:
    """Pearson correlation matrix → {(a,b): r} for all pairs.

    Single streaming pass: per-block partial sums of x, x², xy.
    Population moments (matches the reference's visitor accumulation).
    """
    k = len(cols)

    def _partial(batch: pa.Table) -> pa.Table:
        X = np.column_stack([
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        out = {"n": [len(X)]}
        for i in range(k):
            out[f"s_{i}"] = [float(X[:, i].sum())]
            for j in range(i, k):
                out[f"p_{i}_{j}"] = [float((X[:, i] * X[:, j]).sum())]
        return pa.table(out)

    names = ["n"] + [f"s_{i}" for i in range(k)] + [
        f"p_{i}_{j}" for i in range(k) for j in range(i, k)]
    parts = ds.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(c) for c in names])
    n = agg["sum(n)"]
    s = np.array([agg[f"sum(s_{i})"] for i in range(k)])
    result = {}
    for i in range(k):
        for j in range(i, k):
            pij = agg[f"sum(p_{i}_{j})"]
            pii = agg[f"sum(p_{i}_{i})"]
            pjj = agg[f"sum(p_{j}_{j})"]
            cov = pij / n - (s[i] / n) * (s[j] / n)
            vi = pii / n - (s[i] / n) ** 2
            vj = pjj / n - (s[j] / n) ** 2
            r = cov / np.sqrt(vi * vj) if vi > 0 and vj > 0 else 0.0
            result[(cols[i], cols[j])] = float(r)
            result[(cols[j], cols[i])] = float(r)
    return result


def ols(ds, y_col: str, x_cols: list[str]) -> dict:
    """OLS y ~ [1, X] → {coef, intercept, r2, adj_r2, n, std_err}.

    XᵀX / Xᵀy partials per block → driver solve (normal equations,
    like OLSOperation's in-memory matrices but distributed).
    """
    k = len(x_cols)

    def _partial(batch: pa.Table) -> pa.Table:
        X = np.column_stack(
            [np.ones(len(batch))] + [
                batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
                for c in x_cols])
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        xtx = X.T @ X
        xty = X.T @ y
        out = {"n": [len(y)], "yy": [float((y * y).sum())],
               "ys": [float(y.sum())]}
        for i in range(k + 1):
            out[f"xty_{i}"] = [float(xty[i])]
            for j in range(i, k + 1):
                out[f"xtx_{i}_{j}"] = [float(xtx[i, j])]
        return pa.table(out)

    names = (["n", "yy", "ys"] + [f"xty_{i}" for i in range(k + 1)]
             + [f"xtx_{i}_{j}" for i in range(k + 1) for j in range(i, k + 1)])
    parts = ds.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(c) for c in names])
    n = agg["sum(n)"]
    XtX = np.empty((k + 1, k + 1))
    Xty = np.empty(k + 1)
    for i in range(k + 1):
        Xty[i] = agg[f"sum(xty_{i})"]
        for j in range(i, k + 1):
            XtX[i, j] = XtX[j, i] = agg[f"sum(xtx_{i}_{j})"]
    beta = np.linalg.solve(XtX, Xty)
    yy = agg["sum(yy)"]
    ys = agg["sum(ys)"]
    ss_tot = yy - ys ** 2 / n
    ss_res = yy - beta @ Xty
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    adj = 1.0 - (1.0 - r2) * (n - 1) / (n - k - 1) if n > k + 1 else r2
    sigma2 = ss_res / (n - k - 1) if n > k + 1 else 0.0
    try:
        se = np.sqrt(np.maximum(np.diag(np.linalg.inv(XtX)) * sigma2, 0.0))
    except np.linalg.LinAlgError:
        se = np.full(k + 1, np.nan)
    return {
        "intercept": float(beta[0]),
        "coef": {c: float(beta[i + 1]) for i, c in enumerate(x_cols)},
        "r2": float(r2), "adj_r2": float(adj), "n": int(n),
        "std_err": {c: float(se[i + 1]) for i, c in enumerate(x_cols)},
        "sigma2": float(sigma2),
    }


def ols_residuals(ds, y_col: str, x_cols: list[str], fit: dict | None = None):
    """Residual pass: append predicted / residual / std residual columns
    (OLSOperation's residual output FC)."""
    if fit is None:
        fit = ols(ds, y_col, x_cols)
    beta0 = fit["intercept"]
    coefs = np.array([fit["coef"][c] for c in x_cols])
    sigma = float(np.sqrt(fit["sigma2"])) if fit["sigma2"] > 0 else 1.0

    def _resid(batch: pa.Table) -> pa.Table:
        X = np.column_stack([
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in x_cols])
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pred = beta0 + X @ coefs
        resid = y - pred
        out = batch.append_column("predicted", pa.array(pred))
        out = out.append_column("residual", pa.array(resid))
        return out.append_column("std_residual", pa.array(resid / sigma))

    return ds.map_batches(_resid, batch_format="pyarrow")


def standardized_scores(ds, col: str, *, out_col: str | None = None):
    """StandardizedScores — append (x−μ)/σ (population σ, matching
    StatisticsVisitor variance). Two-pass GLOBAL + map."""
    def _partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return pa.table({"n": [len(v)], "s": [float(v.sum())],
                         "s2": [float((v * v).sum())]})

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(c) for c in ("n", "s", "s2")])
    n, s, s2 = agg["sum(n)"], agg["sum(s)"], agg["sum(s2)"]
    mean = s / n
    std = float(np.sqrt(max(s2 / n - mean ** 2, 0.0)))
    name = out_col or f"z_{col}"

    def _z(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        z = (v - mean) / std if std > 0 else np.zeros(len(v))
        return batch.append_column(name, pa.array(z))

    return ds.map_batches(_z, batch_format="pyarrow")
