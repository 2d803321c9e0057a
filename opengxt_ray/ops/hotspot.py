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

from ..core.util import default_join_partitions

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
    bivar = "val2" in group.column_names
    pw = group["val2"].to_numpy() if bivar else None
    pid = group["id"].to_numpy(zero_copy_only=False)
    pidx = np.nonzero(prim_mask)[0]
    if len(pidx) == 0:
        cols = {
            "id": pa.array([], type=group.schema.field("id").type),
            "val": pa.array([], pa.float64()),
            "local_sum": pa.array([], pa.float64()),
            "local_sum2": pa.array([], pa.float64()),
            "wij_sum": pa.array([], pa.float64()),
            "wij2_sum": pa.array([], pa.float64()),
            "nn": pa.array([], pa.int64()),
        }
        if bivar:
            cols["val2"] = pa.array([], pa.float64())
            cols["local_sumy"] = pa.array([], pa.float64())
        return pa.table(cols)
    n_p = len(pidx)
    local_sum = np.zeros(n_p)
    local_sum2 = np.zeros(n_p)
    local_sumy = np.zeros(n_p) if bivar else None
    wij_sum = np.zeros(n_p)
    wij2_sum = np.zeros(n_p)
    nn = np.zeros(n_p, dtype=np.int64)
    pv2 = pv * pv
    CH = 512  # primary chunk — bounds the (CH × group) distance matrix
    for c0 in range(0, n_p, CH):
        sel = pidx[c0 : c0 + CH]
        d = np.hypot(px[sel][:, None] - px[None, :], py[sel][:, None] - py[None, :])
        w = _weights(d, concept, band)
        if not self_neighbors:
            w = np.where(pid[sel][:, None] == pid[None, :], 0.0, w)
        local_sum[c0 : c0 + CH] = w @ pv
        local_sum2[c0 : c0 + CH] = w @ pv2
        if bivar:
            local_sumy[c0 : c0 + CH] = w @ pw
        wij_sum[c0 : c0 + CH] = w.sum(axis=1)
        wij2_sum[c0 : c0 + CH] = (w * w).sum(axis=1)
        nn[c0 : c0 + CH] = (w > 0).sum(axis=1)
    cols = {
        "id": pa.array(pid[pidx]),
        "val": pa.array(pv[pidx]),
        "local_sum": pa.array(local_sum),
        "local_sum2": pa.array(local_sum2),
        "wij_sum": pa.array(wij_sum),
        "wij2_sum": pa.array(wij2_sum),
        "nn": pa.array(nn),
    }
    if bivar:
        cols["val2"] = pa.array(pw[pidx])
        cols["local_sumy"] = pa.array(local_sumy)
    return pa.table(cols)


def neighbor_sums(ds, value_col: str, *, id_col: str, band: float | None,
                  concept: str = FIXED, self_neighbors: bool = True,
                  xcol: str = "lon", ycol: str = "lat",
                  row_standardize: bool = False,
                  value_col2: str | None = None):
    """Slim-project → halo replicate → groupby(cell) neighbor sums.

    Returns a Dataset (id, val, local_sum, wij_sum, wij2_sum, nn).
    """
    exact = band is None
    if not exact:
        band_res = hexgrid.res_for_band(band)
        if hexgrid.hex_size(band_res) < 2.0 * band:
            # band wider than the coarsest grid supports (res 0, s=45):
            # the 1-ring halo would silently drop true neighbors — fall
            # back to the exact single-group path (ADVICE round-1 #2)
            exact = True

    def _slim(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v2 = (batch[value_col2].to_numpy(zero_copy_only=False).astype(np.float64)
              if value_col2 else None)
        ids = batch[id_col]
        if exact:
            # single group: exact O(n²) parity mode
            gcell = np.zeros(len(batch), dtype=np.uint64)
            cols = {
                "gcell": pa.array(gcell, pa.uint64()),
                "id": ids, "x": pa.array(x), "y": pa.array(y),
                "val": pa.array(v),
                "__primary": pa.array(np.ones(len(batch), dtype=bool)),
            }
            if v2 is not None:
                cols["val2"] = pa.array(v2)
            return pa.table(cols)
        res = band_res
        cells = hexgrid.hex_cell(x, y, res)
        disks = hexgrid.disk_per_row(cells, 1)  # (n, 7)
        m = disks.shape[1]
        rep = lambda a: np.repeat(a, m)
        cols = {
            "gcell": pa.array(disks.ravel(), pa.uint64()),
            "id": ids.take(pa.array(np.repeat(np.arange(len(batch)), m))),
            "x": pa.array(rep(x)), "y": pa.array(rep(y)),
            "val": pa.array(rep(v)),
            "__primary": pa.array(disks.ravel() == np.repeat(cells, m)),
        }
        if v2 is not None:
            cols["val2"] = pa.array(rep(v2))
        return pa.table(cols)

    from ..core.util import coalesce_for_groupby, default_shuffle_partitions

    slim = ds.map_batches(_slim, batch_format="pyarrow")
    # exact mode has ONE group; banded mode has ≥ occupied-cell count
    # groups — coalesce so no reduce partition comes out empty
    slim = coalesce_for_groupby(slim, 1 if exact else None)
    sums = slim.groupby(
        "gcell", num_partitions=default_shuffle_partitions()).map_groups(
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
                "local_sum2": pa.array(np.where(rs == 0, 0.0,
                                                batch["local_sum2"].to_numpy() / safe)),
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
                  band: float | None = None, concept: str = FIXED,
                  self_neighbors: bool = True, row_standardize: bool = False,
                  xcol: str = "lon", ycol: str = "lat",
                  round_digits: int | None = 8, sums=None):
    """Getis-Ord Gi* → Dataset (id, GiZScore, GiPValue, GiMean, GiVar, nn)."""
    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    mean_x = mom["s1"] / n
    var_x = float(np.sqrt(max(mom["s2"] / n - mean_x ** 2, 0.0)))
    if sums is None:
        sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                             concept=concept, self_neighbors=self_neighbors,
                             xcol=xcol, ycol=ycol,
                             row_standardize=row_standardize)

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
                   band: float | None = None, concept: str = FIXED,
                   row_standardize: bool = False,
                   xcol: str = "lon", ycol: str = "lat",
                   round_digits: int | None = 8, sums=None):
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
    if sums is None:
        sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                             concept=concept, self_neighbors=False,
                             xcol=xcol, ycol=ycol,
                             row_standardize=row_standardize)

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


def local_gearys_c(ds, value_col: str, *, id_col: str,
                   band: float | None = None, concept: str = FIXED,
                   row_standardize: bool = False,
                   xcol: str = "lon", ycol: str = "lat",
                   round_digits: int | None = 8, sums=None):
    """Local Geary's c → (id, LcIndex, LcZScore, LcPValue, nn).

    GT/autocorrelation/LocalGearysCOperation.java:100-142:
    c_i = Σⱼ wᵢⱼ(xᵢ−xⱼ)² / m2 ; E = 2n·W̄ᵢ/(n−1);
    Var = (n/(n−1))·(W̄ᵢ²+Σw²)·(3+b2) − E².
    Σⱼ wᵢⱼ(xᵢ−xⱼ)² decomposes as xᵢ²·W̄ᵢ − 2xᵢ·Σwx + Σwx².
    """
    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    mean_x = mom["s1"] / n
    c2 = mom["s2"] - 2 * mean_x * mom["s1"] + n * mean_x ** 2
    c4 = (mom["s4"] - 4 * mean_x * mom["s3"] + 6 * mean_x ** 2 * mom["s2"]
          - 4 * mean_x ** 3 * mom["s1"] + n * mean_x ** 4)
    m2 = c2 / (n - 1.0)
    m4 = c4 / (n - 1.0)
    b2 = m4 / (m2 ** 2) if m2 != 0 else 0.0
    if sums is None:
        sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                             concept=concept, self_neighbors=False,
                             xcol=xcol, ycol=ycol,
                             row_standardize=row_standardize)

    def _finalize(batch: pa.Table) -> pa.Table:
        val = batch["val"].to_numpy()
        ls = batch["local_sum"].to_numpy()
        ls2 = batch["local_sum2"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        w2 = batch["wij2_sum"].to_numpy()
        dev = val * val * ws - 2.0 * val * ls + ls2
        with np.errstate(divide="ignore", invalid="ignore"):
            index = dev / m2
            expected = (2.0 * n * ws) / (n - 1.0)
            variance = (n / (n - 1.0)) * (ws ** 2 + w2) * (3.0 + b2) - expected ** 2
            z = (index - expected) / np.sqrt(variance)
        bad = ~np.isfinite(z)
        p = np.where(bad, 1.0, zprob(np.where(bad, 0.0, z), "both"))
        z = np.where(bad, 0.0, z)
        index = np.where(np.isfinite(index), index, 0.0)
        rd = (lambda v: format_round(v, round_digits)) if round_digits else (lambda v: v)
        return pa.table({
            "id": batch["id"],
            "LcIndex": pa.array(rd(index)), "LcZScore": pa.array(rd(z)),
            "LcPValue": pa.array(rd(p)), "nn": batch["nn"],
        })

    return sums.map_batches(_finalize, batch_format="pyarrow")


def global_gearys_c(ds, value_col: str, *, id_col: str,
                    band: float | None, concept: str = FIXED,
                    xcol: str = "lon", ycol: str = "lat") -> dict:
    """Global Geary's C (GT/autocorrelation/GlobalGearysCOperation.java
    :95-142): C = Σwᵢⱼ(xᵢ−xⱼ)²/(2·m2·W), E=1, kurtosis-corrected
    variance; symmetric un-standardized weights decompose per row."""
    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    mean_x = mom["s1"] / n
    c2 = mom["s2"] - 2 * mean_x * mom["s1"] + n * mean_x ** 2
    c4 = (mom["s4"] - 4 * mean_x * mom["s3"] + 6 * mean_x ** 2 * mom["s2"]
          - 4 * mean_x ** 3 * mom["s1"] + n * mean_x ** 4)
    m2 = c2 / (n - 1.0)
    m4 = c4 / (n - 1.0)
    b2 = m4 / (m2 ** 2) if m2 != 0 else 0.0
    sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                         concept=concept, self_neighbors=False,
                         xcol=xcol, ycol=ycol)

    def _partial(batch: pa.Table) -> pa.Table:
        val = batch["val"].to_numpy()
        ls = batch["local_sum"].to_numpy()
        ls2 = batch["local_sum2"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        w2 = batch["wij2_sum"].to_numpy()
        dev = val * val * ws - 2.0 * val * ls + ls2
        return pa.table({
            "cijw": [float(np.sum(dev))],
            "w": [float(np.sum(ws))],
            "s1": [float(np.sum(4.0 * w2))],
            "s2": [float(np.sum((2.0 * ws) ** 2))],
        })

    import ray

    agg = sums.map_batches(_partial, batch_format="pyarrow").aggregate(
        *[ray.data.aggregate.Sum(c) for c in ("cijw", "w", "s1", "s2")])
    W = agg["sum(w)"]
    if W <= 0:
        return {"observed": 0.0, "expected": 1.0, "variance": 0.0,
                "z": 0.0, "p": 1.0}
    s1 = 0.5 * agg["sum(s1)"]
    s2 = agg["sum(s2)"]
    observed = agg["sum(cijw)"] / (2.0 * m2 * W)
    W2 = W ** 2
    n2 = n ** 2
    div = n * (n - 2.0) * (n - 3.0)
    A = ((n - 1) * s1 * (n2 - 3 * n + 3 - (n - 1) * b2)) / (div * W2)
    B = ((n - 1) * s2 * (n2 + 3 * n - 6 - (n2 - n + 2) * b2)) / (4.0 * div * W2)
    C = (n2 - 3.0 - (n - 1) ** 2 * b2) / div
    variance = A - B + C
    z = (observed - 1.0) / np.sqrt(variance) if variance > 0 else 0.0
    return {"observed": observed, "expected": 1.0, "variance": variance,
            "z": float(z), "p": float(zprob(z, "both"))}


def global_g(ds, value_col: str, *, id_col: str,
             band: float | None, concept: str = FIXED,
             xcol: str = "lon", ycol: str = "lat") -> dict:
    """General G (Getis-Ord) — GT/autocorrelation/
    GlobalGStatisticOperation.java:75-140: G = Σwᵢⱼxᵢxⱼ / Σxᵢxⱼ (i≠j),
    E = W/(n(n−1)), b0..b4 variance on raw power sums."""
    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    sx, sx2, sx3, sx4 = mom["s1"], mom["s2"], mom["s3"], mom["s4"]
    sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                         concept=concept, self_neighbors=False,
                         xcol=xcol, ycol=ycol)

    def _partial(batch: pa.Table) -> pa.Table:
        val = batch["val"].to_numpy()
        ls = batch["local_sum"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        w2 = batch["wij2_sum"].to_numpy()
        return pa.table({
            "npsum": [float(np.sum(val * ls))],
            "w": [float(np.sum(ws))],
            "s1": [float(np.sum(4.0 * w2))],
            "s2": [float(np.sum((2.0 * ws) ** 2))],
        })

    import ray

    agg = sums.map_batches(_partial, batch_format="pyarrow").aggregate(
        *[ray.data.aggregate.Sum(c) for c in ("npsum", "w", "s1", "s2")])
    W = agg["sum(w)"]
    s1 = 0.5 * agg["sum(s1)"]
    s2 = agg["sum(s2)"]
    np_sum = agg["sum(npsum)"]
    tp_sum = sx * sx - sx2  # Σ_{i≠j} xi·xj
    expected = W / (n * (n - 1.0))
    W2 = W ** 2
    b0 = (n ** 2 - 3 * n + 3) * s1 - n * s2 + 3 * W2
    b1 = -1.0 * ((n ** 2 - n) * s1 - 2 * n * s2 + 6 * W2)
    b2_ = -1.0 * (2 * n * s1 - (n + 3) * s2 + 6 * W2)
    b3 = 4 * (n - 1) * s1 - 2 * (n + 1) * s2 + 8 * W2
    b4 = s1 - s2 + W2
    variance = ((b0 * sx2 ** 2 + b1 * sx4 + b2_ * sx ** 2 * sx2
                 + b3 * sx * sx3 + b4 * sx ** 4)
                / ((sx ** 2 - sx2) ** 2 * (n * (n - 1) * (n - 2) * (n - 3)))
                ) - expected ** 2
    if tp_sum <= 0:
        return {"observed": 0.0, "expected": expected, "variance": variance,
                "z": 0.0, "p": 1.0}
    observed = np_sum / tp_sum
    z = (observed - expected) / np.sqrt(variance) if variance > 0 else 0.0
    return {"observed": observed, "expected": expected, "variance": variance,
            "z": float(z), "p": float(zprob(z, "both"))}


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


# ---------------------------------------------------------------------------
# Lee's S / L, FocalLQ, Rogerson's R
# ---------------------------------------------------------------------------

def local_lees_s(ds, value_col: str, *, id_col: str, band: float | None,
                 concept: str = FIXED, self_neighbors: bool = True,
                 xcol: str = "lon", ycol: str = "lat",
                 round_digits: int | None = 8):
    """Local Lee's S (GT/autocorrelation/LocalLeesSOperation.java:58,118-133):
    S_i = (n²/Σᵢ W̄ᵢ²) · ((Σⱼwᵢⱼ(xⱼ−μ))² / Σ(x−μ)²); z TODO'd 0 in the
    reference (replicated). Self-neighbors ON."""
    import ray

    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    mean_x = mom["s1"] / n
    mx2 = mom["s2"] - 2 * mean_x * mom["s1"] + n * mean_x ** 2  # Σ(x−μ)²
    sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                         concept=concept, self_neighbors=self_neighbors,
                         xcol=xcol, ycol=ycol).materialize()
    w2agg = sums.map_batches(
        lambda b: pa.table({"w2": [float(np.sum(b["wij_sum"].to_numpy() ** 2))]}),
        batch_format="pyarrow").aggregate(ray.data.aggregate.Sum("w2"))
    wij2_total = w2agg["sum(w2)"]

    def _finalize(batch: pa.Table) -> pa.Table:
        ls = batch["local_sum"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        zxjw = ls - ws * mean_x
        with np.errstate(divide="ignore", invalid="ignore"):
            index = (n ** 2 / wij2_total) * (zxjw ** 2 / mx2)
        index = np.where(np.isfinite(index), index, 0.0)
        rd = (lambda v: format_round(v, round_digits)) if round_digits else (lambda v: v)
        return pa.table({
            "id": batch["id"], "LsIndex": pa.array(rd(index)),
            "LsZScore": pa.array(np.zeros(len(index))),
            "nn": batch["nn"],
        })

    return sums.map_batches(_finalize, batch_format="pyarrow")


def global_lees_s(ds, value_col: str, *, id_col: str, band: float | None,
                  concept: str = FIXED, xcol: str = "lon",
                  ycol: str = "lat") -> dict:
    """Global Lee's S (GT/autocorrelation/GlobalLeesSOperation.java:46,105):
    S = (n/Σ W̄ᵢ²)·(Σ(Σⱼwᵢⱼzⱼ)²/Σzᵢ²); expected/variance are 0 in the
    reference (TODO'd there; replicated). Self-neighbors OFF."""
    import ray

    mom = global_moments(ds, value_col)
    n = float(mom["n"])
    mean_x = mom["s1"] / n
    z2 = mom["s2"] - 2 * mean_x * mom["s1"] + n * mean_x ** 2
    sums = neighbor_sums(ds, value_col, id_col=id_col, band=band,
                         concept=concept, self_neighbors=False,
                         xcol=xcol, ycol=ycol)

    def _partial(batch: pa.Table) -> pa.Table:
        ls = batch["local_sum"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        zw = ls - ws * mean_x
        return pa.table({
            "w": [float(np.sum(ws))],
            "w2": [float(np.sum(ws ** 2))],
            "zw2": [float(np.sum(zw ** 2))],
        })

    agg = sums.map_batches(_partial, batch_format="pyarrow").aggregate(
        *[ray.data.aggregate.Sum(c) for c in ("w", "w2", "zw2")])
    if agg["sum(w)"] <= 0:
        return {"observed": 0.0, "expected": 0.0, "variance": 0.0}
    observed = (n / agg["sum(w2)"]) * (agg["sum(zw2)"] / z2)
    return {"observed": float(observed), "expected": 0.0, "variance": 0.0}


def local_lees_l(ds, x_col: str, y_col: str, *, id_col: str,
                 band: float | None, concept: str = FIXED,
                 xcol: str = "lon", ycol: str = "lat",
                 round_digits: int | None = 8):
    """Local bivariate Lee's L (GT/autocorrelation/LocalLeesLOperation
    .java:58,85-140): L_i = (n²/Σ W̄ᵢ²)·(Σwᵢⱼzxⱼ·Σwᵢⱼzyⱼ)/(√Σzx²·√Σzy²).
    Self-neighbors ON; z TODO'd 0 in the reference."""
    import ray

    momx = global_moments(ds, x_col)
    momy = global_moments(ds, y_col)
    n = float(momx["n"])
    mux = momx["s1"] / n
    muy = momy["s1"] / n
    mx2 = momx["s2"] - 2 * mux * momx["s1"] + n * mux ** 2
    my2 = momy["s2"] - 2 * muy * momy["s1"] + n * muy ** 2
    sums = neighbor_sums(ds, x_col, id_col=id_col, band=band, concept=concept,
                         self_neighbors=True, xcol=xcol, ycol=ycol,
                         value_col2=y_col).materialize()
    w2agg = sums.map_batches(
        lambda b: pa.table({"w2": [float(np.sum(b["wij_sum"].to_numpy() ** 2))]}),
        batch_format="pyarrow").aggregate(ray.data.aggregate.Sum("w2"))
    wij2_total = w2agg["sum(w2)"]

    def _finalize(batch: pa.Table) -> pa.Table:
        lsx = batch["local_sum"].to_numpy()
        lsy = batch["local_sumy"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        zxw = lsx - ws * mux
        zyw = lsy - ws * muy
        with np.errstate(divide="ignore", invalid="ignore"):
            index = (n ** 2 / wij2_total) * ((zxw * zyw)
                                             / (np.sqrt(mx2) * np.sqrt(my2)))
        index = np.where(np.isfinite(index), index, 0.0)
        rd = (lambda v: format_round(v, round_digits)) if round_digits else (lambda v: v)
        return pa.table({
            "id": batch["id"], "LlIndex": pa.array(rd(index)),
            "LlZScore": pa.array(np.zeros(len(index))),
            "nn": batch["nn"],
        })

    return sums.map_batches(_finalize, batch_format="pyarrow")


def global_lees_l(ds, x_col: str, y_col: str, *, id_col: str,
                  band: float | None, concept: str = FIXED,
                  xcol: str = "lon", ycol: str = "lat") -> dict:
    """Global bivariate Lee's L (GlobalLeesLOperation.java:46,55-115):
    L = (n/Σ W̄ᵢ²)·(Σ|Σwzxⱼ·Σwzyⱼ|/(√Σzx²·√Σzy²)). Self ON."""
    import ray

    momx = global_moments(ds, x_col)
    momy = global_moments(ds, y_col)
    n = float(momx["n"])
    mux = momx["s1"] / n
    muy = momy["s1"] / n
    mx2 = momx["s2"] - 2 * mux * momx["s1"] + n * mux ** 2
    my2 = momy["s2"] - 2 * muy * momy["s1"] + n * muy ** 2
    sums = neighbor_sums(ds, x_col, id_col=id_col, band=band, concept=concept,
                         self_neighbors=True, xcol=xcol, ycol=ycol,
                         value_col2=y_col)

    def _partial(batch: pa.Table) -> pa.Table:
        lsx = batch["local_sum"].to_numpy()
        lsy = batch["local_sumy"].to_numpy()
        ws = batch["wij_sum"].to_numpy()
        zxw = lsx - ws * mux
        zyw = lsy - ws * muy
        return pa.table({
            "w": [float(np.sum(ws))],
            "w2": [float(np.sum(ws ** 2))],
            "xyw": [float(np.sum(np.abs(zxw * zyw)))],
        })

    agg = sums.map_batches(_partial, batch_format="pyarrow").aggregate(
        *[ray.data.aggregate.Sum(c) for c in ("w", "w2", "xyw")])
    if agg["sum(w)"] == 0:
        return {"observed": 0.0, "expected": 0.0, "variance": 0.0}
    observed = (n / agg["sum(w2)"]) * (agg["sum(xyw)"]
                                       / (np.sqrt(mx2) * np.sqrt(my2)))
    return {"observed": float(observed), "expected": 0.0, "variance": 0.0}


def focal_lq(ds, x_col: str, y_col: str, *, id_col: str,
             band: float | None, concept: str = FIXED,
             xcol: str = "lon", ycol: str = "lat",
             round_digits: int | None = 8):
    """Focal Location Quotient (GT/autocorrelation/FocalLQOperation.java
    :67-150): per-row flq = (yᵢ/xᵢ)/(ΣX/ΣY), flqd = (Σnbr x/Σnbr y)/
    (ΣX/ΣY), fz = (Σnbr y − Σnbr x·(ΣX/ΣY))/√(Σnbr x·(ΣX/ΣY));
    neighbors INCLUDE self (no self-skip in the reference loop).
    Returns (Dataset, global_lq)."""
    import ray

    momx = global_moments(ds, x_col)
    momy = global_moments(ds, y_col)
    dxy = momx["s1"] / momy["s1"]  # named Y/X in reference, computed ΣX/ΣY
    sums = neighbor_sums(ds, x_col, id_col=id_col, band=band, concept=concept,
                         self_neighbors=True, xcol=xcol, ycol=ycol,
                         value_col2=y_col).materialize()

    def _finalize(batch: pa.Table) -> pa.Table:
        xv = batch["val"].to_numpy()
        yv = batch["val2"].to_numpy()
        sumx = batch["local_sum"].to_numpy()
        sumy = batch["local_sumy"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            dxy_local = np.where(sumy == 0, 0.0,
                                 sumx / np.where(sumy == 0, 1.0, sumy))
            tmp2 = sumx * dxy
            tmp4 = np.where(xv != 0, yv / np.where(xv == 0, 1.0, xv), 0.0)
            flq = tmp4 / dxy
            flqd = dxy_local / dxy
            fz = (sumy - tmp2) / np.sqrt(tmp2)
        fix = lambda a: np.where(np.isfinite(a), a, 0.0)
        rd = (lambda v: format_round(v, round_digits)) if round_digits else (lambda v: v)
        return pa.table({
            "id": batch["id"], "flq": pa.array(rd(fix(flq))),
            "flqd": pa.array(rd(fix(flqd))), "fz": pa.array(rd(fix(fz))),
        })

    out = sums.map_batches(_finalize, batch_format="pyarrow").materialize()
    glq = out.map_batches(
        lambda b: pa.table({"g": [float(np.sum(np.abs(b["flqd"].to_numpy())))]}),
        batch_format="pyarrow").aggregate(ray.data.aggregate.Sum("g"))
    return out, float(glq["sum(g)"])


# ---------------------------------------------------------------------------
# Rogerson's R (spatial chi-square, case/pop fields)
# ---------------------------------------------------------------------------

def _rogerson_prep(ds, case_col, pop_col, id_col, xcol, ycol):
    """Append v1 = (r−p)/√p and v2 = √p (r = case share, p = pop share)."""
    import ray

    def _sums(batch: pa.Table) -> pa.Table:
        c = batch[case_col].to_numpy(zero_copy_only=False).astype(np.float64)
        p = batch[pop_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"sc": [float(c.sum())], "sp": [float(p.sum())]})

    agg = ds.map_batches(_sums, batch_format="pyarrow").aggregate(
        ray.data.aggregate.Sum("sc"), ray.data.aggregate.Sum("sp"))
    sum_x, sum_y = agg["sum(sc)"], agg["sum(sp)"]

    def _prep(batch: pa.Table) -> pa.Table:
        c = batch[case_col].to_numpy(zero_copy_only=False).astype(np.float64)
        p = batch[pop_col].to_numpy(zero_copy_only=False).astype(np.float64)
        r = c / sum_x
        pp = p / sum_y
        v1 = (r - pp) / np.sqrt(pp)
        return pa.table({
            id_col: batch[id_col],
            xcol: batch[xcol], ycol: batch[ycol],
            "__v1": pa.array(v1),
            "__sqrtp": pa.array(np.sqrt(pp)),
            "__t1v": pa.array((1.0 - pp) * np.sqrt(pp)),
            "__invsq": pa.array(1.0 / np.sqrt(pp)),
            "__ripi": pa.array(r - pp),
            "__pi": pa.array(pp),
        })

    return ds.map_batches(_prep, batch_format="pyarrow"), sum_x, sum_y


def local_rogerson_r(ds, case_col: str, pop_col: str, *, id_col: str,
                     band: float | None = None, kappa: float = 1.0,
                     xcol: str = "lon", ycol: str = "lat",
                     round_digits: int | None = 8):
    """Local Rogerson's R (GT/autocorrelation/LocalRogersonROperation
    .java:85-135): Rᵢ = ((rᵢ−pᵢ)/√pᵢ)·Σⱼ aᵢⱼ(rⱼ−pⱼ)/√pⱼ with
    aᵢᵢ=1, aᵢⱼ = 1 if d≤1 else d^−κ; z = Rᵢ/E(Rᵢ),
    E = (1−pᵢ)/ΣX. κ=1 maps to the inverse-distance concept (κ=2 the
    squared variant)."""
    prep, sum_x, _ = _rogerson_prep(ds, case_col, pop_col, id_col, xcol, ycol)
    concept = INVERSE if kappa == 1.0 else INVERSE2
    sums = neighbor_sums(prep, "__v1", id_col=id_col, band=band,
                         concept=concept, self_neighbors=True,
                         xcol=xcol, ycol=ycol, value_col2="__ripi")
    own = prep.map_batches(
        lambda b: pa.table({"id": b[id_col], "__ripi0": b["__ripi"],
                            "__pi0": b["__pi"], "__sqrtp0": b["__sqrtp"]}),
        batch_format="pyarrow")
    joined = sums.join(own, join_type="inner", num_partitions=default_join_partitions(), on=("id",))

    def _finalize(batch: pa.Table) -> pa.Table:
        ls = batch["local_sum"].to_numpy()  # Σ aij·(rj−pj)/√pj incl self
        ripi = batch["__ripi0"].to_numpy()
        pi = batch["__pi0"].to_numpy()
        sqrtp = batch["__sqrtp0"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            index = (ripi / sqrtp) * ls
            expected = (1.0 - pi) / sum_x
            z = index / expected
        bad = ~np.isfinite(z)
        p = np.where(bad, 1.0, zprob(np.where(bad, 0.0, z), "both"))
        rd = (lambda v: format_round(v, round_digits)) if round_digits else (lambda v: v)
        return pa.table({
            "id": batch["id"],
            "LRrIndex": pa.array(rd(np.where(np.isfinite(index), index, 0.0))),
            "LRrZScore": pa.array(rd(np.where(bad, 0.0, z))),
            "LRrPValue": pa.array(rd(p)),
        })

    return joined.map_batches(_finalize, batch_format="pyarrow")


def global_rogerson_r(ds, case_col: str, pop_col: str, *, id_col: str,
                      band: float | None = None, kappa: float = 1.0,
                      xcol: str = "lon", ycol: str = "lat") -> dict:
    """Global Rogerson's R (GlobalRogersonROperation.java:66-142):
    R = GOF + SA; GOF = Σ(rᵢ−pᵢ)²/pᵢ,
    SA = Σᵢ ((rᵢ−pᵢ)/√pᵢ)·Σⱼ≠ᵢ aᵢⱼ(rⱼ−pⱼ)/√pⱼ;
    E = (m−1−2Σᵢ>ⱼaᵢⱼ√(pᵢpⱼ))/ΣX.

    VARIANCE (round 4): the reference computes it with an O(n³)
    nested loop marked "TODO Verify" (GlobalRogersonROperation.java:
    114-131 + sumKJ). Its math reduces in closed form — with
    S_j = Σ_{k≠j} a_jk √p_k, Y1_i = Σ_{j≠i}(1−p_j)a_ij√p_j,
    U1_i = Σ_{j≠i} a_ij/√p_j, P = Σ_j p_j S_j, G = Σ_j 1/√p_j:
        yij_i = (Y1_i − (P − p_i S_i)) / √p_i
        yji_i = (1−p_i)√p_i·U1_i − p_i S_i (G − 1/√p_i)
        Var = 2/ΣX² · Σ_i yij_i·yji_i
    — i.e. two neighbor-sum halo passes + two scalar aggregates,
    O(n·k) distributed instead of O(n³). Equality with the reference's
    literal loop is pytest-verified (tests/test_rogerson.py)."""
    import ray

    prep, sum_x, _ = _rogerson_prep(ds, case_col, pop_col, id_col, xcol, ycol)
    m = prep.count()
    concept = INVERSE if kappa == 1.0 else INVERSE2
    sums = neighbor_sums(prep, "__v1", id_col=id_col, band=band,
                         concept=concept, self_neighbors=False,
                         xcol=xcol, ycol=ycol, value_col2="__sqrtp")
    sums2 = neighbor_sums(prep, "__t1v", id_col=id_col, band=band,
                          concept=concept, self_neighbors=False,
                          xcol=xcol, ycol=ycol, value_col2="__invsq")
    sums2 = sums2.map_batches(
        lambda b: pa.table({"id": b["id"], "__y1": b["local_sum"],
                            "__u1": b["local_sumy"]}),
        batch_format="pyarrow")
    own = prep.map_batches(
        lambda b: pa.table({"id": b[id_col], "__ripi0": b["__ripi"],
                            "__pi0": b["__pi"], "__sqrtp0": b["__sqrtp"]}),
        batch_format="pyarrow")
    # materialize between the two joins — two join operators in one
    # streaming DAG deadlock small CPU sessions (repo lore)
    joined = sums.join(own, join_type="inner",
                       num_partitions=default_join_partitions(),
                       on=("id",)).materialize()
    joined = joined.join(sums2, join_type="inner",
                         num_partitions=default_join_partitions(),
                         on=("id",)).materialize()

    def _partial(batch: pa.Table) -> pa.Table:
        ls = batch["local_sum"].to_numpy()      # Σⱼ≠ᵢ aij (rj−pj)/√pj
        lsy = batch["local_sumy"].to_numpy()    # Σⱼ≠ᵢ aij √pj  (= S_i)
        ripi = batch["__ripi0"].to_numpy()
        pi = batch["__pi0"].to_numpy()
        sqrtp = batch["__sqrtp0"].to_numpy()
        gof = float(np.sum(ripi * ripi / pi))
        sa = float(np.sum((ripi / sqrtp) * ls))
        aijsum2 = float(np.sum(sqrtp * lsy))    # Σᵢ≠ⱼ aij √(pi pj) = 2Σᵢ>ⱼ
        return pa.table({"gof": [gof], "sa": [sa], "aij2": [aijsum2],
                         "ps": [float(np.sum(pi * lsy))],      # Σ p_j S_j
                         "g": [float(np.sum(1.0 / sqrtp))]})   # Σ 1/√p_j

    agg = joined.map_batches(_partial, batch_format="pyarrow").aggregate(
        *[ray.data.aggregate.Sum(c)
          for c in ("gof", "sa", "aij2", "ps", "g")])
    observed = agg["sum(gof)"] + agg["sum(sa)"]
    expected = (m - 1.0 - agg["sum(aij2)"]) / sum_x
    P, G = agg["sum(ps)"], agg["sum(g)"]

    def _var_partial(batch: pa.Table) -> pa.Table:
        s_i = batch["local_sumy"].to_numpy()
        pi = batch["__pi0"].to_numpy()
        sqrtp = batch["__sqrtp0"].to_numpy()
        y1 = batch["__y1"].to_numpy()
        u1 = batch["__u1"].to_numpy()
        yij = (y1 - (P - pi * s_i)) / sqrtp
        yji = (1.0 - pi) * sqrtp * u1 - pi * s_i * (G - 1.0 / sqrtp)
        return pa.table({"yy": [float(np.sum(yij * yji))]})

    vagg = joined.map_batches(_var_partial, batch_format="pyarrow") \
        .aggregate(ray.data.aggregate.Sum("yy"))
    variance = (2.0 / sum_x ** 2) * vagg["sum(yy)"]
    return {"observed": float(observed), "expected": float(expected),
            "gof": float(agg["sum(gof)"]), "sa": float(agg["sum(sa)"]),
            "variance": float(variance)}


# ---------------------------------------------------------------------------
# LocalSA composes (LocalSABinningProcess / LocalSAOverlayProcess)
# ---------------------------------------------------------------------------

_LOCAL_SA = None


def _local_sa_dispatch(method: str):
    m = method.lower()
    if m in ("moran", "moransi", "local moran's i"):
        return local_morans_i
    if m in ("geary", "gearysc"):
        return local_gearys_c
    if m in ("g", "gi", "gistar", "getisordgi*"):
        return local_gi_star
    if m in ("lees", "leess"):
        return local_lees_s
    raise ValueError(f"unknown LocalSA method {method}")


def local_sa_binning(ds, *, size: float, weight_col: str | None = None,
                     grid: str = "hexagon", method: str = "moran",
                     xcol: str = "lon", ycol: str = "lat", **sa_kwargs):
    """LocalSABinningProcess (GT/LocalSABinningProcess.java:140-216):
    bin the points (hexagon/rectangle/circle grid, weight sum = the
    reference's AGG_FIELD "val"), then run the chosen local spatial
    autocorrelation statistic on the bin values at the bin centers."""
    from .binning import hex_binning, rect_binning

    if grid.startswith("hex"):
        bins = hex_binning(ds, size=size, weight_col=weight_col,
                           xcol=xcol, ycol=ycol)
        bins = bins.map_batches(
            lambda b: pa.table({
                "id": ((b["q"].to_numpy() + (1 << 30)) * np.int64(1 << 32)
                       + (b["r"].to_numpy() + (1 << 30))),
                "lon": b["cx"], "lat": b["cy"], "val": b["val"]}),
            batch_format="pyarrow")
    elif grid.startswith("rect"):
        bins = rect_binning(ds, width=size, height=size,
                            weight_col=weight_col, xcol=xcol, ycol=ycol)
        bins = bins.map_batches(
            lambda b: pa.table({
                "id": (b["col"].to_numpy() * (1 << 31)
                       + b["row"].to_numpy()),
                "lon": pa.array(b["minx"].to_numpy() + size / 2),
                "lat": pa.array(b["miny"].to_numpy() + size / 2),
                "val": b["val"]}),
            batch_format="pyarrow")
    else:
        raise ValueError(f"unknown grid {grid}")
    stat = _local_sa_dispatch(method)
    return stat(bins, "val", id_col="id", **sa_kwargs)


def local_sa_overlay(points_ds, poly_table, *, poly_key: str,
                     weight_col: str | None = None, method: str = "moran",
                     **sa_kwargs):
    """LocalSAOverlayProcess (GT/LocalSAOverlayProcess.java:127-150):
    PIP-aggregate points into the polygons (count / weighted sum), then
    run the chosen local statistic on the polygon values at the polygon
    centroids."""
    from ..core import geomops
    from .pip import points_in_polygon

    vals = points_in_polygon(points_ds, poly_table, poly_key=poly_key,
                             weight_col=weight_col)
    cx, cy = geomops.centroids(poly_table["geom"].to_pylist())
    keys = poly_table[poly_key].to_numpy(zero_copy_only=False)
    cent = {int(k): (float(a), float(b)) for k, a, b in zip(keys, cx, cy)}

    def _attach(b: pa.Table) -> pa.Table:
        ks = b[poly_key].to_numpy(zero_copy_only=False)
        xs = np.asarray([cent[int(k)][0] for k in ks])
        ys = np.asarray([cent[int(k)][1] for k in ks])
        return pa.table({"id": b[poly_key], "lon": pa.array(xs),
                         "lat": pa.array(ys), "val": b["val"]})

    pts = vals.map_batches(_attach, batch_format="pyarrow")
    stat = _local_sa_dispatch(method)
    return stat(pts, "val", id_col="id", **sa_kwargs)
