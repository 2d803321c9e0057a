"""Rogerson's R vs brute force (exact O(n²) mode)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.ops import hotspot


@pytest.fixture(scope="module")
def casepop():
    rs = np.random.RandomState(13)
    n = 150
    x = rs.uniform(0, 10, n)
    y = rs.uniform(0, 10, n)
    cases = rs.randint(1, 50, n).astype(float)
    pop = rs.randint(100, 1000, n).astype(float)
    t = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(x),
                  "lat": pa.array(y), "cases": pa.array(cases),
                  "pop": pa.array(pop)})
    return ray.data.from_arrow(t).repartition(3), (x, y, cases, pop)


def _aij(x, y, kappa=1.0):
    d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
    with np.errstate(divide="ignore"):
        a = np.where(d <= 1.0, 1.0, 1.0 / d ** kappa)
    return a


def test_local_rogerson(casepop):
    ds, (x, y, cases, pop) = casepop
    out = hotspot.local_rogerson_r(ds, "cases", "pop", id_col="pid",
                                   band=None, round_digits=None).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    r = cases / cases.sum()
    p = pop / pop.sum()
    a = _aij(x, y)  # aii = 1 (d=0 ≤ 1)
    v = (r - p) / np.sqrt(p)
    ls = a @ v
    index = v * ls
    expected = (1 - p) / cases.sum()
    z = index / expected
    np.testing.assert_allclose(out["LRrIndex"].to_numpy(), index, rtol=1e-9)
    np.testing.assert_allclose(out["LRrZScore"].to_numpy(), z, rtol=1e-9)


def test_global_rogerson(casepop):
    ds, (x, y, cases, pop) = casepop
    res = hotspot.global_rogerson_r(ds, "cases", "pop", id_col="pid",
                                    band=None)
    r = cases / cases.sum()
    p = pop / pop.sum()
    a = _aij(x, y)
    np.fill_diagonal(a, 0.0)
    gof = float(np.sum((r - p) ** 2 / p))
    v = (r - p) / np.sqrt(p)
    sa = float(v @ (a @ v))
    m = len(r)
    aij2 = float(np.sqrt(p) @ (a @ np.sqrt(p)))
    expected = (m - 1 - aij2) / cases.sum()
    assert res["gof"] == pytest.approx(gof, rel=1e-9)
    assert res["sa"] == pytest.approx(sa, rel=1e-9)
    assert res["observed"] == pytest.approx(gof + sa, rel=1e-9)
    assert res["expected"] == pytest.approx(expected, rel=1e-9)


def test_global_rogerson_variance_matches_reference_loop(casepop):
    """Round 4: the variance term. Oracle = the reference's LITERAL
    O(n³) loop (GlobalRogersonROperation.java:95-131 + sumKJ),
    transcribed with explicit per-pair sums — our closed-form
    two-pass reduction must reproduce it exactly."""
    ds, (x, y, cases, pop) = casepop
    res = hotspot.global_rogerson_r(ds, "cases", "pop", id_col="pid",
                                    band=None)
    p = pop / pop.sum()
    a = _aij(x, y)
    np.fill_diagonal(a, 0.0)
    n = len(p)
    sqrtp = np.sqrt(p)
    # sumKJ(source=s, pi) = sum_{k != s} a_sk * sqrt(p_k / pi)
    S = a @ sqrtp  # S_s = sum_{k != s} a_sk sqrt(p_k)  (diag already 0)
    yijyji = 0.0
    for i in range(n):
        yij = 0.0
        yji = 0.0
        for j in range(n):
            if j == i:
                continue
            yij += ((1.0 - p[j]) * a[i, j] * np.sqrt(p[j] / p[i])
                    - p[j] * (S[j] / sqrtp[i]))
            yji += ((1.0 - p[i]) * a[i, j] * np.sqrt(p[i] / p[j])
                    - p[i] * (S[i] / sqrtp[j]))
        yijyji += yij * yji
    z_var = (2.0 / cases.sum() ** 2) * yijyji
    assert res["variance"] == pytest.approx(z_var, rel=1e-9)
    assert res["variance"] != 0.0
