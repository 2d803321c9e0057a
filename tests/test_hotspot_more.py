"""Geary's C (local/global) and General G vs brute force."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.ops import hotspot


def _points(n=300, seed=11):
    rs = np.random.RandomState(seed)
    x = rs.uniform(0, 10, n)
    y = rs.uniform(0, 10, n)
    v = rs.uniform(0, 100, n)
    return x, y, v


@pytest.fixture(scope="module")
def pts():
    x, y, v = _points()
    t = pa.table({"pid": pa.array(np.arange(len(x))), "lon": pa.array(x),
                  "lat": pa.array(y), "val": pa.array(v)})
    return ray.data.from_arrow(t).repartition(3), (x, y, v)


def _w(x, y, band):
    d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
    w = (d <= band).astype(float)
    np.fill_diagonal(w, 0.0)
    return w


def test_local_gearys_c(pts):
    ds, (x, y, v) = pts
    band = 1.5
    out = hotspot.local_gearys_c(ds, "val", id_col="pid", band=band,
                                 round_digits=None).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    n = float(len(v))
    mean = v.mean()
    m2 = ((v - mean) ** 2).sum() / (n - 1)
    m4 = ((v - mean) ** 4).sum() / (n - 1)
    b2 = m4 / m2 ** 2
    w = _w(x, y, band)
    dev = (w * (v[:, None] - v[None, :]) ** 2).sum(axis=1)
    index = dev / m2
    ws = w.sum(1)
    w2s = (w * w).sum(1)
    expected = 2 * n * ws / (n - 1)
    var = (n / (n - 1)) * (ws ** 2 + w2s) * (3 + b2) - expected ** 2
    z = (index - expected) / np.sqrt(var)
    np.testing.assert_allclose(out["LcIndex"].to_numpy(), index, rtol=1e-9)
    np.testing.assert_allclose(out["LcZScore"].to_numpy(), z, rtol=1e-9)


def test_global_gearys_c(pts):
    ds, (x, y, v) = pts
    band = 2.0
    res = hotspot.global_gearys_c(ds, "val", id_col="pid", band=band)
    n = float(len(v))
    mean = v.mean()
    m2 = ((v - mean) ** 2).sum() / (n - 1)
    m4 = ((v - mean) ** 4).sum() / (n - 1)
    b2 = m4 / m2 ** 2
    w = _w(x, y, band)
    W = w.sum()
    cij = (w * (v[:, None] - v[None, :]) ** 2).sum()
    observed = cij / (2 * m2 * W)
    s1 = 0.5 * ((w + w.T) ** 2).sum()
    s2 = ((w.sum(1) + w.sum(0)) ** 2).sum()
    n2, W2 = n * n, W * W
    div = n * (n - 2) * (n - 3)
    A = ((n - 1) * s1 * (n2 - 3 * n + 3 - (n - 1) * b2)) / (div * W2)
    B = ((n - 1) * s2 * (n2 + 3 * n - 6 - (n2 - n + 2) * b2)) / (4 * div * W2)
    C = (n2 - 3 - (n - 1) ** 2 * b2) / div
    var = A - B + C
    assert res["observed"] == pytest.approx(observed, rel=1e-9)
    assert res["variance"] == pytest.approx(var, rel=1e-9)
    assert res["z"] == pytest.approx((observed - 1) / np.sqrt(var), rel=1e-9)


def test_global_g(pts):
    ds, (x, y, v) = pts
    band = 2.0
    res = hotspot.global_g(ds, "val", id_col="pid", band=band)
    n = float(len(v))
    w = _w(x, y, band)
    W = w.sum()
    np_sum = (w * np.outer(v, v)).sum()
    tp_sum = v.sum() ** 2 - (v * v).sum()
    observed = np_sum / tp_sum
    expected = W / (n * (n - 1))
    sx, sx2 = v.sum(), (v * v).sum()
    sx3, sx4 = (v ** 3).sum(), (v ** 4).sum()
    s1 = 0.5 * ((w + w.T) ** 2).sum()
    s2 = ((w.sum(1) + w.sum(0)) ** 2).sum()
    W2 = W * W
    b0 = (n ** 2 - 3 * n + 3) * s1 - n * s2 + 3 * W2
    b1 = -((n ** 2 - n) * s1 - 2 * n * s2 + 6 * W2)
    b2_ = -(2 * n * s1 - (n + 3) * s2 + 6 * W2)
    b3 = 4 * (n - 1) * s1 - 2 * (n + 1) * s2 + 8 * W2
    b4 = s1 - s2 + W2
    var = ((b0 * sx2 ** 2 + b1 * sx4 + b2_ * sx ** 2 * sx2 + b3 * sx * sx3
            + b4 * sx ** 4)
           / ((sx ** 2 - sx2) ** 2 * (n * (n - 1) * (n - 2) * (n - 3)))
           ) - expected ** 2
    assert res["observed"] == pytest.approx(observed, rel=1e-9)
    assert res["variance"] == pytest.approx(var, rel=1e-9)
    assert res["z"] == pytest.approx((observed - expected) / np.sqrt(var),
                                     rel=1e-9)
