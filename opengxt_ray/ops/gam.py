"""Openshaw GAM + Besag–Newell cluster detection.

Reference:
- GT/pattern/ClusterGAMOperation.java:209 — candidate circles on a
  lattice (per radius level, center step = radius·overlapRatio over the
  pop extent expanded by maxRadius/2); circle population/cases by
  point-in-circle; expected = population · (ΣcaseValue/ΣpopValue);
  Poisson tail test (FitnessFunction.java:79-120) with threshold,
  fitness ∈ {Poisson: 1−p, Relative: cases−expected,
  RelativePercent: cases/expected}.
- GT/pattern/ClusterBesagNewellOperation.java:176 — one circle per
  case point, radius = distance to its k-th nearest OTHER case point,
  cases = Σ of those k neighbour values; same Poisson test.

Ray-Data-first execution (GAM): each point enumerates the lattice
centers within its reach per radius level (≈ π/overlap² ≈ 13 per
level) and emits (level, ci, cj, pop, cases) contributions; ONE
groupby over the center key sums both layers; the finalizer runs the
Poisson test per surviving center. No circle list is ever
materialized on the driver, and no point ever leaves its contribution
radius — the same halo-locality argument as the hotspot co-shuffle.

Besag–Newell broadcasts the CASE side (the small layer by
construction) for the kNN radius, then streams the population.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..core import geomops, wkb as _wkb
from ..core.util import default_shuffle_partitions

_MAX_CASES = 300  # FitnessFunction.MAX_CASES


def poisson_tail_prob(expected: float, cases: float) -> float:
    """P(X ≥ cases) for X ~ Poisson(expected), replicating
    FitnessFunction.getStat's accumulation (FitnessFunction.java:79-102
    — term-by-term pmf sum, jA = (int) cases, the jA ≤ 1 shortcut)."""
    jA = int(cases)
    m = float(expected)
    if jA > 1:
        jA = min(jA, _MAX_CASES)  # the reference warns above MAX_CASES
        term = np.exp(-m)
        prob = term
        for j in range(1, jA):
            term *= m / j
            prob += term
        return 1.0 - prob
    return 1.0 - np.exp(-m)


def _fitness_finalize(batch: pa.Table, *, density, function, threshold,
                      min_expected, min_cases, keycols) -> pa.Table:
    pop = batch["pop_sum"].to_numpy()
    cases = batch["case_sum"].to_numpy()
    expected = pop * density
    worth = ((expected <= cases) & (expected >= min_expected)
             & (cases >= min_cases))
    fit = np.full(len(batch), np.nan)
    idx = np.nonzero(worth)[0]
    for i in idx:
        prob = poisson_tail_prob(expected[i], cases[i])
        if prob <= threshold:
            if function == "poisson":
                fit[i] = 1.0 - prob
            elif function == "relative":
                fit[i] = cases[i] - expected[i]
            else:  # relative_percent
                fit[i] = cases[i] / expected[i]
    keep = np.isfinite(fit)
    out = {k: batch[k].filter(pa.array(keep)) for k in keycols}
    out["fitness"] = pa.array(fit[keep])
    out["pop"] = pa.array(pop[keep])
    out["expected"] = pa.array(expected[keep])
    out["cases"] = pa.array(cases[keep])
    return pa.table(out)


def cluster_gam(pop_ds, case_ds, *, pop_col: str, case_col: str,
                xcol: str = "lon", ycol: str = "lat",
                min_radius: float | None = None,
                max_radius: float | None = None,
                radius_increment: float | None = None,
                overlap_ratio: float = 0.5,
                function: str = "poisson", threshold: float = 0.01,
                min_expected: float = 1.0, min_cases: float = 1.0,
                quadrant_segs: int = 8):
    """GAM → Dataset (cx, cy, radius, fitness, pop, expected, cases,
    geom) of significant circles."""
    import ray.data.aggregate as A

    pstats = pop_ds.aggregate(A.Min(xcol), A.Max(xcol), A.Min(ycol),
                              A.Max(ycol), A.Sum(pop_col))
    csum = case_ds.aggregate(A.Sum(case_col))
    sum_pop = float(pstats[f"sum({pop_col})"] or 0.0)
    sum_cases = float(csum[f"sum({case_col})"] or 0.0)
    density = 0.0 if sum_pop == 0 else sum_cases / sum_pop
    bw = pstats[f"max({xcol})"] - pstats[f"min({xcol})"]
    bh = pstats[f"max({ycol})"] - pstats[f"min({ycol})"]
    if min_radius is None or min_radius <= 0:
        min_radius = min(bw, bh) / 150.0
        max_radius = min_radius * 5.0
    if max_radius is None or max_radius <= min_radius:
        max_radius = min_radius * 5.0
    if radius_increment is None or radius_increment <= 0:
        radius_increment = min_radius / 2.0
    overlap_ratio = min(max(overlap_ratio, 0.0), 1.0) or 0.5
    half = max_radius / 2.0
    min_x = pstats[f"min({xcol})"] - half
    min_y = pstats[f"min({ycol})"] - half
    max_x = pstats[f"max({xcol})"] + half
    max_y = pstats[f"max({ycol})"] + half
    radii = []
    r = min_radius
    while r <= max_radius:   # same float accumulation as the reference
        radii.append(r)
        r += radius_increment
    radii = np.asarray(radii)

    def _contrib(batch: pa.Table, vcol: str, is_case: bool) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        v = batch[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
        lev_o, ci_o, cj_o, pv, cv = [], [], [], [], []
        for lev, rad in enumerate(radii):
            step = rad * overlap_ratio
            imax = int(np.floor((max_x - min_x) / step))
            jmax = int(np.floor((max_y - min_y) / step))
            i0 = np.maximum(np.ceil((x - rad - min_x) / step), 0).astype(np.int64)
            i1 = np.minimum(np.floor((x + rad - min_x) / step),
                            imax).astype(np.int64)
            j0 = np.maximum(np.ceil((y - rad - min_y) / step), 0).astype(np.int64)
            j1 = np.minimum(np.floor((y + rad - min_y) / step),
                            jmax).astype(np.int64)
            for p in range(len(x)):
                if i1[p] < i0[p] or j1[p] < j0[p]:
                    continue
                ii = np.arange(i0[p], i1[p] + 1)
                jj = np.arange(j0[p], j1[p] + 1)
                cx = min_x + ii * step
                cy = min_y + jj * step
                dx2 = (cx - x[p]) ** 2
                dy2 = (cy - y[p]) ** 2
                m = dx2[:, None] + dy2[None, :] <= rad * rad
                mi, mj = np.nonzero(m)
                if len(mi) == 0:
                    continue
                lev_o.append(np.full(len(mi), lev, dtype=np.int32))
                ci_o.append(ii[mi])
                cj_o.append(jj[mj])
                pv.append(np.zeros(len(mi)) if is_case
                          else np.full(len(mi), v[p]))
                cv.append(np.full(len(mi), v[p]) if is_case
                          else np.zeros(len(mi)))
        if not lev_o:
            return pa.table({"lev": pa.array([], pa.int32()),
                             "ci": pa.array([], pa.int64()),
                             "cj": pa.array([], pa.int64()),
                             "pop_c": pa.array([], pa.float64()),
                             "case_c": pa.array([], pa.float64())})
        return pa.table({
            "lev": pa.array(np.concatenate(lev_o), pa.int32()),
            "ci": pa.array(np.concatenate(ci_o), pa.int64()),
            "cj": pa.array(np.concatenate(cj_o), pa.int64()),
            "pop_c": pa.array(np.concatenate(pv), pa.float64()),
            "case_c": pa.array(np.concatenate(cv), pa.float64()),
        })

    contrib = pop_ds.map_batches(
        lambda b: _contrib(b, pop_col, False), batch_format="pyarrow").union(
        case_ds.map_batches(
            lambda b: _contrib(b, case_col, True), batch_format="pyarrow"))
    import ray.data.aggregate as A2

    sums = contrib.groupby(
        ["lev", "ci", "cj"],
        num_partitions=default_shuffle_partitions()).aggregate(
        A2.Sum("pop_c"), A2.Sum("case_c"))

    def _final(batch: pa.Table) -> pa.Table:
        lev = batch["lev"].to_numpy()
        ci = batch["ci"].to_numpy()
        cj = batch["cj"].to_numpy()
        rad = radii[lev]
        step = rad * overlap_ratio
        cx = min_x + ci * step
        cy = min_y + cj * step
        pre = pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "radius": pa.array(rad),
            "pop_sum": batch["sum(pop_c)"], "case_sum": batch["sum(case_c)"],
        })
        out = _fitness_finalize(pre, density=density, function=function,
                                threshold=threshold,
                                min_expected=min_expected,
                                min_cases=min_cases,
                                keycols=["cx", "cy", "radius"])
        geoms = [_wkb.encode_polygon(geomops.circle_ring(
            float(a), float(b), float(c), quadrant_segs))
            for a, b, c in zip(out["cx"].to_numpy(), out["cy"].to_numpy(),
                               out["radius"].to_numpy())]
        return out.append_column("geom", pa.array(geoms, pa.binary()))

    return sums.map_batches(_final, batch_format="pyarrow")


def cluster_besag_newell(pop_ds, case_table: pa.Table, *, pop_col: str,
                         case_col: str, xcol: str = "lon",
                         ycol: str = "lat", neighbours: int = 10,
                         function: str = "poisson", threshold: float = 0.01,
                         min_expected: float = 1.0, min_cases: float = 1.0,
                         quadrant_segs: int = 8):
    """Besag–Newell → Dataset of significant circles. The CASE layer is
    the broadcast (driver-side pyarrow Table) — it is the small layer
    by construction; population streams."""
    import ray.data.aggregate as A

    cx = case_table[xcol].to_numpy()
    cy = case_table[ycol].to_numpy()
    cval = case_table[case_col].to_numpy().astype(np.float64)
    n = len(cx)
    psum = pop_ds.aggregate(A.Sum(pop_col))
    sum_pop = float(psum[f"sum({pop_col})"] or 0.0)
    density = 0.0 if sum_pop == 0 else float(cval.sum()) / sum_pop
    # kNN among case points (small side, exact) — radius + case sum
    d2 = ((cx[:, None] - cx[None, :]) ** 2
          + (cy[:, None] - cy[None, :]) ** 2)
    np.fill_diagonal(d2, np.inf)
    k = min(neighbours, n - 1)
    circles = []
    for i in range(n):
        o = np.lexsort((np.arange(n), d2[i]))[:k]
        radius = float(np.sqrt(d2[i, o].max()))
        cases = float(cval[o].sum())
        circles.append((float(cx[i]), float(cy[i]), radius, cases))
    carr = np.asarray([(c[0], c[1], c[2]) for c in circles])
    cases_arr = np.asarray([c[3] for c in circles])
    ref = ray.put((carr, cases_arr))

    def _pop_contrib(batch: pa.Table) -> pa.Table:
        cc, _ = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        v = batch[pop_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # (points × circles) containment — circles are the small side
        inside = ((x[:, None] - cc[None, :, 0]) ** 2
                  + (y[:, None] - cc[None, :, 1]) ** 2
                  <= cc[None, :, 2] ** 2)
        pops = inside.T @ v  # per-circle partial population
        return pa.table({"circle_id": pa.array(np.arange(len(cc)),
                                               pa.int64()),
                         "pop_c": pa.array(pops, pa.float64())})

    sums = pop_ds.map_batches(_pop_contrib, batch_format="pyarrow") \
        .groupby("circle_id", num_partitions=default_shuffle_partitions()) \
        .aggregate(ray.data.aggregate.Sum("pop_c"))

    def _final(batch: pa.Table) -> pa.Table:
        ids = batch["circle_id"].to_numpy()
        pre = pa.table({
            "cx": pa.array(carr[ids, 0]), "cy": pa.array(carr[ids, 1]),
            "radius": pa.array(carr[ids, 2]),
            "pop_sum": batch["sum(pop_c)"],
            "case_sum": pa.array(cases_arr[ids]),
        })
        out = _fitness_finalize(pre, density=density, function=function,
                                threshold=threshold,
                                min_expected=min_expected,
                                min_cases=min_cases,
                                keycols=["cx", "cy", "radius"])
        geoms = [_wkb.encode_polygon(geomops.circle_ring(
            float(a), float(b), float(c), quadrant_segs))
            for a, b, c in zip(out["cx"].to_numpy(), out["cy"].to_numpy(),
                               out["radius"].to_numpy())]
        return out.append_column("geom", pa.array(geoms, pa.binary()))

    return sums.map_batches(_final, batch_format="pyarrow")
