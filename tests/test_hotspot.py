"""Hotspot stats: distributed cell+halo path vs brute-force O(n²) oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core.ssutils import zprob
from opengxt_ray.ops import hotspot


def _brute_gi_star(x, y, v, band, self_neighbors=True):
    n = float(len(v))
    mean = v.sum() / n
    var = np.sqrt((v ** 2).sum() / n - mean ** 2)
    d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
    w = (d <= band).astype(float)
    if not self_neighbors:
        np.fill_diagonal(w, 0.0)
    ls = w @ v
    ws = w.sum(1)
    w2 = (w * w).sum(1)
    z = (ls - ws * mean) / (var * np.sqrt((n * w2 - ws ** 2) / (n - 1)))
    return z


def _points(n=400, seed=5):
    rs = np.random.RandomState(seed)
    x = rs.uniform(0, 10, n)
    y = rs.uniform(0, 10, n)
    v = rs.uniform(0, 100, n)
    # a hot blob
    x[:40] = rs.uniform(4, 4.5, 40)
    y[:40] = rs.uniform(4, 4.5, 40)
    v[:40] = rs.uniform(200, 300, 40)
    return x, y, v


@pytest.fixture(scope="module")
def pts_ds():
    x, y, v = _points()
    t = pa.table({"pid": pa.array(np.arange(len(x))), "lon": pa.array(x),
                  "lat": pa.array(y), "val": pa.array(v)})
    return ray.data.from_arrow(t).repartition(4), (x, y, v)


def test_gi_star_banded_matches_brute(pts_ds):
    ds, (x, y, v) = pts_ds
    band = 1.0
    out = hotspot.local_gi_star(ds, "val", id_col="pid", band=band,
                                round_digits=None).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    expect = _brute_gi_star(x, y, v, band)
    np.testing.assert_allclose(out["GiZScore"].to_numpy(), expect, rtol=1e-9)
    # p-values via AS-66
    np.testing.assert_allclose(
        out["GiPValue"].to_numpy(), zprob(expect, "both"), rtol=1e-9)


def test_gi_star_exact_mode_matches_brute(pts_ds):
    ds, (x, y, v) = pts_ds
    # exact O(n²) mode with inverse distance (no band)
    out = hotspot.local_gi_star(ds, "val", id_col="pid", band=None,
                                concept=hotspot.INVERSE,
                                round_digits=None).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    n = float(len(v))
    mean = v.sum() / n
    var = np.sqrt((v ** 2).sum() / n - mean ** 2)
    d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
    w = np.where(d <= 1.0, 1.0, 1.0 / np.where(d <= 1.0, 1.0, d))
    ls = w @ v
    ws = w.sum(1)
    w2 = (w * w).sum(1)
    z = (ls - ws * mean) / (var * np.sqrt((n * w2 - ws ** 2) / (n - 1)))
    np.testing.assert_allclose(out["GiZScore"].to_numpy(), z, rtol=1e-8)


def test_lisa_banded_matches_brute(pts_ds):
    ds, (x, y, v) = pts_ds
    band = 1.2
    out = hotspot.local_morans_i(ds, "val", id_col="pid", band=band,
                                 round_digits=None).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    n = float(len(v))
    mean = v.mean()
    m2 = ((v - mean) ** 2).sum() / (n - 1)
    m4 = ((v - mean) ** 4).sum() / (n - 1)
    b2 = m4 / m2 ** 2
    d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
    w = (d <= band).astype(float)
    np.fill_diagonal(w, 0.0)
    zxjw = w @ (v - mean)
    ws = w.sum(1)
    w2s = (w * w).sum(1)
    index = ((v - mean) / m2) * zxjw
    expected = -ws / (n - 1)
    v1 = (w2s * (n - b2)) / (n - 1)
    v2 = ws ** 2 / (n - 1) ** 2
    v3 = (ws ** 2 - w2s) * (2 * b2 - n)
    v4 = (n - 1) * (n - 2)
    zsc = (index - expected) / np.sqrt(v1 + v3 / v4 - v2)
    np.testing.assert_allclose(out["LMiIndex"].to_numpy(), index, rtol=1e-8)
    np.testing.assert_allclose(out["LMiZScore"].to_numpy(), zsc, rtol=1e-8)
    assert set(out["COType"]) <= {"", "HH", "LL", "HL", "LH"}
    assert (out["COType"] == "HH").sum() > 0  # the hot blob


def test_global_moran_matches_brute(pts_ds):
    ds, (x, y, v) = pts_ds
    band = 1.5
    res = hotspot.global_morans_i(ds, "val", id_col="pid", band=band)
    n = float(len(v))
    mean = v.mean()
    z = v - mean
    d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
    w = (d <= band).astype(float)
    np.fill_diagonal(w, 0.0)
    W = w.sum()
    zijw = (w * np.outer(z, z)).sum()
    z2 = (z ** 2).sum() / n
    z4 = (z ** 4).sum() / n
    observed = zijw / (z2 * W)
    s1 = 0.5 * ((w + w.T) ** 2).sum()
    s2 = ((w.sum(1) + w.sum(0)) ** 2).sum()
    expected = -1 / (n - 1)
    b2 = z4 / z2 ** 2
    a = n * ((n ** 2 - 3 * n + 3) * s1 - n * s2 + 3 * W ** 2)
    bb = b2 * ((n ** 2 - n) * s1 - 2 * n * s2 + 6 * W ** 2)
    c = (n - 1) * (n - 2) * (n - 3) * W ** 2
    variance = a / c - bb / c - expected ** 2
    assert res["observed"] == pytest.approx(observed, rel=1e-9)
    assert res["variance"] == pytest.approx(variance, rel=1e-9)
    assert res["z"] == pytest.approx((observed - expected) / np.sqrt(variance), rel=1e-9)
