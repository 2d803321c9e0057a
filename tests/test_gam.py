"""GAM / Besag-Newell vs serial brute-force scans (judge round-1 #8)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.ops.gam import (cluster_besag_newell, cluster_gam,
                                 poisson_tail_prob)


def _mk(x, y, v, vcol):
    return pa.table({"lon": pa.array(x), "lat": pa.array(y),
                     vcol: pa.array(v)})


@pytest.fixture(scope="module")
def pop_case():
    rs = np.random.RandomState(12)
    # population: uniform grid of 20x20 with pop 5 each
    gx, gy = np.meshgrid(np.linspace(0, 19, 20), np.linspace(0, 19, 20))
    px, py = gx.ravel(), gy.ravel()
    pv = np.full(len(px), 5.0)
    # cases: background + a hot cluster near (5,5)
    cx = np.concatenate([rs.uniform(0, 19, 30), rs.normal(5, 0.7, 25)])
    cy = np.concatenate([rs.uniform(0, 19, 30), rs.normal(5, 0.7, 25)])
    cv = np.ones(len(cx))
    return (px, py, pv), (cx, cy, cv)


def _gam_brute(pop, case, *, min_radius, max_radius, radius_increment,
               overlap=0.5, threshold=0.01):
    (px, py, pv), (cx, cy, cv) = pop, case
    density = cv.sum() / pv.sum()
    half = max_radius / 2.0
    min_x, max_x = px.min() - half, px.max() + half
    min_y, max_y = py.min() - half, py.max() + half
    out = []
    r = min_radius
    radii = []
    while r <= max_radius:
        radii.append(r)
        r += radius_increment
    for rad in radii:
        step = rad * overlap
        imax = int(np.floor((max_x - min_x) / step))
        jmax = int(np.floor((max_y - min_y) / step))
        for i in range(imax + 1):
            for j in range(jmax + 1):
                ox = min_x + i * step
                oy = min_y + j * step
                pin = (px - ox) ** 2 + (py - oy) ** 2 <= rad * rad
                cin = (cx - ox) ** 2 + (cy - oy) ** 2 <= rad * rad
                pop_s = pv[pin].sum()
                cas = cv[cin].sum()
                exp = pop_s * density
                if not (exp <= cas and exp >= 1.0 and cas >= 1.0):
                    continue
                prob = poisson_tail_prob(exp, cas)
                if prob <= threshold:
                    out.append((round(ox, 9), round(oy, 9), round(rad, 9),
                                round(1.0 - prob, 9)))
    return sorted(out)


def test_cluster_gam_vs_brute(pop_case):
    pop, case = pop_case
    kw = dict(min_radius=1.0, max_radius=3.0, radius_increment=1.0)
    pop_ds = ray.data.from_arrow(_mk(*pop, "pop"))
    case_ds = ray.data.from_arrow(_mk(*case, "cases"))
    got = cluster_gam(pop_ds, case_ds, pop_col="pop", case_col="cases",
                      **kw).take_all()
    got_set = sorted((round(r["cx"], 9), round(r["cy"], 9),
                      round(r["radius"], 9), round(r["fitness"], 9))
                     for r in got)
    want = _gam_brute(pop, case, **kw)
    assert len(want) > 0          # the hot cluster must be detected
    assert got_set == want


def test_cluster_besag_newell_vs_brute(pop_case):
    pop, case = pop_case
    (px, py, pv), (cx, cy, cv) = pop, case
    pop_ds = ray.data.from_arrow(_mk(*pop, "pop"))
    case_tab = _mk(*case, "cases")
    got = cluster_besag_newell(pop_ds, case_tab, pop_col="pop",
                               case_col="cases", neighbours=8,
                               min_expected=0.25).take_all()
    # brute
    density = cv.sum() / pv.sum()
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    want = []
    for i in range(len(cx)):
        o = np.argsort(d2[i], kind="stable")[:8]
        rad = np.sqrt(d2[i, o].max())
        cas = cv[o].sum()
        pin = (px - cx[i]) ** 2 + (py - cy[i]) ** 2 <= rad * rad
        pop_s = pv[pin].sum()
        exp = pop_s * density
        if not (exp <= cas and exp >= 0.25 and cas >= 1.0):
            continue
        prob = poisson_tail_prob(exp, cas)
        if prob <= 0.01:
            want.append((round(cx[i], 9), round(cy[i], 9), round(rad, 9)))
    got_set = sorted((round(r["cx"], 9), round(r["cy"], 9),
                      round(r["radius"], 9)) for r in got)
    assert len(want) > 0
    assert got_set == sorted(want)
