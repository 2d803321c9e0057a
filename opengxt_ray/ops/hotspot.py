"""Hotspot / spatial-autocorrelation statistics — Gi*, LISA, global indices.

Reference semantics (replicated exactly, see SURVEY.md §2.5):
- Getis-Ord Gi*: GT/autocorrelation/LocalGStatisticOperation.java:92-131
  z_i = (Σⱼ wᵢⱼxⱼ − W̄ᵢ·μ) / (σ·√((n·Σw² − W̄ᵢ²)/(n−1))),
  GiMean = W̄ᵢ/(n(n−1)), GiVar = √(Σw²/n − GiMean²); NaN/Inf → z=0,p=1;
  self-neighbors ON by default (:60).
- Local Moran's I (Anselin LISA):
  GT/autocorrelation/LocalMoranIStatisticOperation.java:76-251 with
  kurtosis-corrected variance and HH/LL/HL/LH bins (|z| ≥ 1.96).
- Global Moran's I: GT/autocorrelation/GlobalMoranIStatisticOperation
  .java:49-135 (observed I, expected −1/(n−1), kurtosis-corrected
  variance from S1/S2 sums).
- Weights: GT/core/WeightMatrixBuilder.java:206-236 —
  fixed (d ≤ band), inverse distance (1 if d ≤ 1 else 1/d^β),
  zone-of-indifference; optional row standardization (:229-236).
- p-values via AS-66 (:mod:`opengxt_ray.core.ssutils`), outputs rounded
  with FormatUtils.round(8).

Ray execution (SURVEY.md §7.3): O(n·k) not O(n²) —
1. GLOBAL pass: Σx..Σx⁴ moments via per-block partials + tiny reduce.
2. Halo co-shuffle: each slim event row (id, x, y, val) is replicated
   to the 1-ring hex disk of its cell (resolution chosen so the disk
   provably covers the distance band); ``groupby(cell).map_groups``
   computes each primary row's neighbor sums vectorized.
3. Finalize: stateless map_batches applying the z/p formulas with the
   broadcast global moments.

``band=None`` (the reference's unbounded InverseDistance default,
GT/core/WeightMatrixBuilder.java:213-216) falls back to a single-group
exact O(n²) pass — parity mode for small inputs; banded is the scale
path (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.ssutils import format_round, zprob
from ..index import hexgrid

FIXED = "fixed"
INVERSE = "inverse_distance"
INVERSE2 = "inverse_distance_squared"
ZOI = "zone_of_indifference"


# ---------------------------------------------------------------------------
# Pass 1: global moments
# ---------------------------------------------------------------------------

def global_moments(ds, value_col: str) -> dict:
    """One streaming pass → {n, s1, s2, s3, s4} raw power sums."""

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "s1": pa.array([float(np.sum(v))]),
            "s2": pa.array([float(np.sum(v ** 2))]),
            "s3": pa.array([float(np.sum(v ** 3))]),
            "s4": pa.array([float(np.sum(v ** 4))]),
        })

    import ray

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(
        ray.data.aggregate.Sum("n"), ray.data.aggregate.Sum("s1"),
        ray.data.aggregate.Sum("s2"), ray.data.aggregate.Sum("s3"),
        ray.data.aggregate.Sum("s4"),
    )
    return {
        "n": int(agg["sum(n)"]), "s1": float(agg["sum(s1)"]),
        "s2": float(agg["sum(s2)"]), "s3": float(agg["sum(s3)"]),
        "s4": float(agg["sum(s4)"]),
    }


# ---------------------------------------------------------------------------
# Pass 2: neighbor sums via halo co-shuffle
# ---------------------------------------------------------------------------

def _weights(d: np.ndarray, concept: str, band: float | None) -> np.ndarray:
    if concept == FIXED:
        return (d <= band).astype(np.float64)
    if concept == INVERSE:
        w = np.where(d <= 1.0, 1.0, 1.0 / np.where(d <= 1.0, 1.0, d))
    elif concept == INVERSE2:
        w = np.where(d <= 1.0, 1.0, 1.0 / np.where(d <= 1.0, 1.0, d) ** 2)
    elif concept == ZOI:
        w = np.where(d > band, 1.0 / ((d - band) + 1.0), 1.0)
    else:
        raise ValueError(f"unknown concept {concept}")
    if band is not None and concept in (INVERSE, INVERSE2):
        w = np.where(d <= band, w, 0.0)
    return w


def _group_neighbor_sums(group: pa.Table, *, concept, band,
                         self_neighbors) -> pa.Table:
    prim_mask = group["__primary"].to_numpy(zero_copy_only=False)
    px = group["x"].to_numpy()
    py = group["y"].to_numpy()
    pv = group["val"].to_numpy()
    pid = group["id"].to_numpy(zero_copy_only=False)
    pidx = np.nonzero(prim_mask)[0]
    if len(pidx) == 0:
        return pa.table({
            "id": pa.array([], type=group.schema.field("id").type),
            "val": pa.array([], pa.float64()),
            "local_sum": pa.array([], pa.float64()),
            "wij_sum": pa.array([], pa.float64()),
            "wij2_sum": pa.array([], pa.float64()),
            "nn": pa.array([], pa.int64()),
        })
    n_p = len(pidx)
    local_sum = np.zeros(n_p)
    wij_sum = np.zeros(n_p)
    wij2_sum = np.zeros(n_p)
    nn = np.zeros(n_p, dtype=np.int64)
    CH = 512  # primary chunk — bounds the (CH × group) distance matrix
    for c0 in range(0, n_p, CH):
        sel = pidx[c0 : c0 + CH]
        d = np.hypot(px[sel][:, None] - px[None, :], py[sel][:, None] - py[None, :])
        w = _weights(d, concept, band)
        if not self_neighbors:
            w = np.where(pid[sel][:, None] == pid[None, :], 0.0, w)
        local_sum[c0 : c0 + CH] = w @ pv
        wij_sum[c0 : c0 + CH] = w.sum(axis=1)
        wij2_sum[c0 : c0 + CH] = (w * w).sum(axis=1)
        nn[c0 : c0 + CH] = (w > 0).sum(axis=1)
    return pa.table({
        "id": pa.array(pid[pidx]),
        "val": pa.array(pv[pidx]),
        "local_sum": pa.array(local_sum),
        "wij_sum": pa.array(wij_sum),
        "wij2_sum": pa.array(wij2_sum),
        "nn": pa.array(nn),
    })


def neighbor_sums(ds, value_col: str, *, id_col: str, band: float | None,
                  concept: str = FIXED, self_neighbors: bool = True,
                  xcol: str = "lon", ycol: str = "lat",
                  row_standardize: bool = False):
    """Slim-project → halo replicate → groupby(cell) neighbor sums.

    Returns a Dataset (id, val, local_sum, wij_sum, wij2_sum, nn).
    """
    exact = band is None

    def _slim(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch[id_col]
        if exact:
            # single group: exact O(n²) parity mode
            gcell = np.zeros(len(batch), dtype=np.uint64)
            return pa.table({
                "gcell": pa.array(gcell, pa.uint64()),
                "id": ids, "x": pa.array(x), "y": pa.array(y),
                "val": pa.array(v),
                "__primary": pa.array(np.ones(len(batch), dtype=bool)),
            })
        res = hexgrid.res_for_band(band)
        cells = hexgrid.hex_cell(x, y, res)
        disks = hexgrid.disk_per_row(cells, 1)  # (n, 7)
        m = disks.shape[1]
        nrep = len(batch) * m
        rep = lambda a: np.repeat(a, m)
        return pa.table({
            "gcell": pa.array(disks.ravel(), pa.uint64()),
            "id": ids.take(pa.array(np.repeat(np.arange(len(batch)), m))),
            "x": pa.array(rep(x)), "y": pa.array(rep(y)),
            "val": pa.array(rep(v)),
            "__primary": pa.array(disks.ravel() == np.repeat(cells, m)),
        })

    slim = ds.map_batches(_slim, batch_format="pyarrow")
    sums = slim.groupby("gcell").map_groups(
        lambda g: _group_neighbor_sums(
            g, concept=concept, band=band, self_neighbors=self_neighbors),
        batch_format="pyarrow",
    )
    if row_standardize:
        def _std(batch: pa.Table) -> pa.Table:
            rs = batch["wij_sum"].to_numpy()
            safe = np.where(rs == 0, 1.0, rs)
            return pa.table({
                "id": batch["id"], "val": batch["val"],
                "local_sum": pa.array(np.where(rs == 0, 0.0,
                                               batch["local_sum"].to_numpy() / safe)),
                "wij_sum": pa.array(np.where(rs == 0, 0.0, 1.0)),
                "wij2_sum": pa.array(np.where(rs == 0, 0.0,
                                              batch["wij2_sum"].to_numpy() / safe ** 2)),
                "nn": batch["nn"],
            })

        sums = sums.map_batches(_std, batch_format="pyarrow")
    return sums


# ---------------------------------------------------------------------------
# Finalizers
# ---------------------------------------------------------------------------

def local_gi_star(ds, value_col: str, *, id_col: str,
                  band: float | None, concept: str = FIXED,
                  self_neighbors: bool = True, row_standardize: bool = False,
                  xcol: str = "lon", ycol: str = "lat",
                  round_digits: int | None = 8):
    """Getis-Ord Gi* → Dataset (id, GiZScore, GiPValue, GiMean, GiVar, nn)."""
    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    mean_x = mom["s1"] / n
    var_x = float(np.sqrt(max(mom["s2"] / n - mean_x ** 2, 0.0)))
    sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                         concept=concept, self_neighbors=self_neighbors,
                         xcol=xcol, ycol=ycol, row_standardize=row_standardize)

    def _finalize(batch: pa.Table) -> pa.Table:
        ls = batch["local_sum"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        w2 = batch["wij2_sum"].to_numpy()
        gi_mean = ws / (n * (n - 1.0))
        gi_var = np.sqrt(np.maximum(w2 / n - gi_mean ** 2, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            b = var_x * np.sqrt((n * w2 - ws ** 2) / (n - 1.0))
            z = (ls - ws * mean_x) / b
        bad = ~np.isfinite(z)
        p = np.where(bad, 1.0, zprob(np.where(bad, 0.0, z), "both"))
        z = np.where(bad, 0.0, z)
        rd = (lambda v: format_round(v, round_digits)) if round_digits else (lambda v: v)
        return pa.table({
            "id": batch["id"],
            "GiZScore": pa.array(rd(z)), "GiPValue": pa.array(rd(p)),
            "GiMean": pa.array(rd(gi_mean)), "GiVar": pa.array(rd(gi_var)),
            "nn": batch["nn"],
        })

    return sums.map_batches(_finalize, batch_format="pyarrow")


def local_morans_i(ds, value_col: str, *, id_col: str,
                   band: float | None, concept: str = FIXED,
                   row_standardize: bool = False,
                   xcol: str = "lon", ycol: str = "lat",
                   round_digits: int | None = 8):
    """Anselin LISA → (id, LMiIndex, LMiZScore, LMiPValue, COType, nn).

    self-neighbors OFF (reference LISA excludes i=j).
    """
    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    mean_x = mom["s1"] / n
    # central moments about the mean, / (n-1), as the reference computes
    c2 = mom["s2"] - 2 * mean_x * mom["s1"] + n * mean_x ** 2
    c4 = (mom["s4"] - 4 * mean_x * mom["s3"] + 6 * mean_x ** 2 * mom["s2"]
          - 4 * mean_x ** 3 * mom["s1"] + n * mean_x ** 4)
    m2 = c2 / (n - 1.0)
    m4 = c4 / (n - 1.0)
    b2 = m4 / (m2 ** 2) if m2 != 0 else 0.0
    sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                         concept=concept, self_neighbors=False,
                         xcol=xcol, ycol=ycol, row_standardize=row_standardize)

    def _finalize(batch: pa.Table) -> pa.Table:
        val = batch["val"].to_numpy()
        ls = batch["local_sum"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        w2 = batch["wij2_sum"].to_numpy()
        nn = batch["nn"].to_numpy()
        zxj_wsum = ls - ws * mean_x
        with np.errstate(divide="ignore", invalid="ignore"):
            index = ((val - mean_x) / m2) * zxj_wsum
            expected = (-1.0 * ws) / (n - 1.0)
            wij_wih = ws ** 2 - w2
            v1 = (w2 * (n - b2)) / (n - 1.0)
            v2 = ws ** 2 / (n - 1.0) ** 2
            v3 = wij_wih * (2.0 * b2 - n)
            v4 = (n - 1.0) * (n - 2.0)
            variance = v1 + v3 / v4 - v2
            z = (index - expected) / np.sqrt(variance)
            local_mean = np.where(ws == 0, np.nan, ls / np.where(ws == 0, 1.0, ws))
        bad = ~np.isfinite(z)
        p = np.where(bad, 1.0, zprob(np.where(bad, 0.0, z), "both"))
        idx_out = np.where(bad, 0.0, index)
        z_out = np.where(bad, 0.0, z)
        # COType bins (LocalMoranIStatisticOperation.java:228-251)
        cot = np.full(len(val), "", dtype=object)
        sig = (~bad) & (nn > 0) & (np.abs(z_out) >= 1.96)
        hh = sig & (z_out > 1.96) & (local_mean >= mean_x)
        ll = sig & (z_out > 1.96) & (local_mean < mean_x)
        hl = sig & (z_out <= 1.96) & (val >= mean_x) & (local_mean <= mean_x)
        lh = sig & (z_out <= 1.96) & (val <= mean_x) & (local_mean >= mean_x)
        cot[hh] = "HH"; cot[ll] = "LL"; cot[hl] = "HL"; cot[lh] = "LH"
        rd = (lambda v: format_round(v, round_digits)) if round_digits else (lambda v: v)
        return pa.table({
            "id": batch["id"],
            "LMiIndex": pa.array(rd(idx_out)), "LMiZScore": pa.array(rd(z_out)),
            "LMiPValue": pa.array(rd(p)),
            "COType": pa.array(list(cot), pa.string()),
            "nn": batch["nn"],
        })

    return sums.map_batches(_finalize, batch_format="pyarrow")


def global_morans_i(ds, value_col: str, *, id_col: str,
                    band: float | None, concept: str = FIXED,
                    self_neighbors: bool = False,
                    xcol: str = "lon", ycol: str = "lat") -> dict:
    """Global Moran's I → dict {observed, expected, variance, z, p}.

    Pairwise sums decompose per cell group (symmetric un-standardized
    weights): zijW, W, S1 = Σ(2w)²/2, S2 = Σᵢ(2·rowsumᵢ)².
    """
    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    mean_x = mom["s1"] / n
    sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                         concept=concept, self_neighbors=self_neighbors,
                         xcol=xcol, ycol=ycol)

    def _partial(batch: pa.Table) -> pa.Table:
        val = batch["val"].to_numpy()
        ls = batch["local_sum"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        w2 = batch["wij2_sum"].to_numpy()
        zi = val - mean_x
        zij_w = zi * (ls - ws * mean_x)  # wij · zi · zj summed over j
        return pa.table({
            "zijw": pa.array([float(np.sum(zij_w))]),
            "w": pa.array([float(np.sum(ws))]),
            "s1": pa.array([float(np.sum(4.0 * w2))]),   # Σ(wij+wji)² = Σ4w²
            "s2": pa.array([float(np.sum((2.0 * ws) ** 2))]),
            "z2": pa.array([float(np.sum(zi ** 2))]),
            "z4": pa.array([float(np.sum(zi ** 4))]),
        })

    import ray

    parts = sums.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(c)
                            for c in ("zijw", "w", "s1", "s2", "z2", "z4")])
    zijw = agg["sum(zijw)"]; W = agg["sum(w)"]
    s1 = 0.5 * agg["sum(s1)"]; s2 = agg["sum(s2)"]
    z2 = agg["sum(z2)"] / n; z4 = agg["sum(z4)"] / n
    expected = -1.0 / (n - 1.0)
    if W <= 0:
        return {"observed": 0.0, "expected": expected, "variance": 0.0,
                "z": 0.0, "p": 1.0}
    observed = zijw / (z2 * W)
    b2 = z4 / (z2 * z2)
    a = n * ((n ** 2 - 3 * n + 3) * s1 - n * s2 + 3 * W ** 2)
    b = b2 * ((n ** 2 - n) * s1 - 2 * n * s2 + 6 * W ** 2)
    c = (n - 1.0) * (n - 2.0) * (n - 3.0) * W ** 2
    variance = a / c - b / c - expected ** 2
    z = (observed - expected) / np.sqrt(variance) if variance > 0 else 0.0
    return {
        "observed": observed, "expected": expected, "variance": variance,
        "z": z, "p": zprob(z, "both") if np.isfinite(z) else 1.0,
    }
