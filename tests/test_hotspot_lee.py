"""Lee's S/L and FocalLQ vs brute force."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.ops import hotspot


@pytest.fixture(scope="module")
def pts():
    rs = np.random.RandomState(21)
    n = 250
    x = rs.uniform(0, 10, n)
    y = rs.uniform(0, 10, n)
    v = rs.uniform(1, 100, n)
    w = rs.uniform(1, 50, n)
    t = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(x),
                  "lat": pa.array(y), "val": pa.array(v), "pop": pa.array(w)})
    return ray.data.from_arrow(t).repartition(3), (x, y, v, w)


def _wmat(x, y, band, self_n):
    d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
    w = (d <= band).astype(float)
    if not self_n:
        np.fill_diagonal(w, 0.0)
    return w


def test_local_lees_s(pts):
    ds, (x, y, v, _) = pts
    band = 1.5
    out = hotspot.local_lees_s(ds, "val", id_col="pid", band=band,
                               round_digits=None).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    n = float(len(v))
    mu = v.mean()
    mx2 = ((v - mu) ** 2).sum()
    w = _wmat(x, y, band, True)
    ws = w.sum(1)
    zw = w @ (v - mu)
    expect = (n ** 2 / (ws ** 2).sum()) * (zw ** 2 / mx2)
    np.testing.assert_allclose(out["LsIndex"].to_numpy(), expect, rtol=1e-9)


def test_global_lees_s(pts):
    ds, (x, y, v, _) = pts
    band = 2.0
    res = hotspot.global_lees_s(ds, "val", id_col="pid", band=band)
    n = float(len(v))
    mu = v.mean()
    w = _wmat(x, y, band, False)
    ws = w.sum(1)
    zw = w @ (v - mu)
    expect = (n / (ws ** 2).sum()) * ((zw ** 2).sum() / ((v - mu) ** 2).sum())
    assert res["observed"] == pytest.approx(expect, rel=1e-9)


def test_lees_l(pts):
    ds, (x, y, v, p) = pts
    band = 2.0
    n = float(len(v))
    mux, muy = v.mean(), p.mean()
    mx2 = ((v - mux) ** 2).sum()
    my2 = ((p - muy) ** 2).sum()
    w = _wmat(x, y, band, True)
    ws = w.sum(1)
    zxw = w @ (v - mux)
    zyw = w @ (p - muy)
    # local
    out = hotspot.local_lees_l(ds, "val", "pop", id_col="pid", band=band,
                               round_digits=None).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    expect = (n ** 2 / (ws ** 2).sum()) * (zxw * zyw) / (np.sqrt(mx2) * np.sqrt(my2))
    np.testing.assert_allclose(out["LlIndex"].to_numpy(), expect, rtol=1e-9)
    # global
    res = hotspot.global_lees_l(ds, "val", "pop", id_col="pid", band=band)
    gexpect = (n / (ws ** 2).sum()) * (np.abs(zxw * zyw).sum()
                                       / (np.sqrt(mx2) * np.sqrt(my2)))
    assert res["observed"] == pytest.approx(gexpect, rel=1e-9)


def test_focal_lq(pts):
    ds, (x, y, v, p) = pts
    band = 1.5
    out, glq = hotspot.focal_lq(ds, "val", "pop", id_col="pid", band=band,
                                round_digits=None)
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    dxy = v.sum() / p.sum()
    w = _wmat(x, y, band, True)
    sumx = w @ v
    sumy = w @ p
    flq = (p / v) / dxy
    flqd = np.where(sumy == 0, 0, sumx / sumy) / dxy
    fz = (sumy - sumx * dxy) / np.sqrt(sumx * dxy)
    np.testing.assert_allclose(df["flq"].to_numpy(), flq, rtol=1e-9)
    np.testing.assert_allclose(df["flqd"].to_numpy(), flqd, rtol=1e-9)
    np.testing.assert_allclose(df["fz"].to_numpy(), fz, rtol=1e-9)
    assert glq == pytest.approx(np.abs(flqd).sum(), rel=1e-9)
