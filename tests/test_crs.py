"""Parameterized CRS engine (core/crs.py): Snyder tmerc + lcc.

Oracles (no PROJ in the container):
- round-trip lon/lat -> projected -> lon/lat at <2e-8 deg (~2 mm,
  the 6th-order Snyder series truncation floor at zone edges);
- analytic scale-factor invariants: conformal projections have local
  scale k == k0 on the central meridian (tmerc) and k == 1 exactly on
  both standard parallels (lcc) — a wrong parameter or series term
  shifts these immediately;
- parity with the pre-existing geomops.utm_forward for UTM parameters.
"""

import numpy as np
import pytest

from opengxt_ray.core import crs, geomops


def _domain_points(c, rs, n=200):
    """Sample lon/lat points in the CRS's sensible domain."""
    if c.kind == "lcc":
        lat_lo, lat_hi = sorted((c.lat1, c.lat2))
        lats = rs.uniform(lat_lo - 3, lat_hi + 3, n)
        lons = rs.uniform(c.lon0 - 8, c.lon0 + 8, n)
    elif c.kind == "tmerc":
        lats = rs.uniform(max(c.lat0 - 6, -80), min(c.lat0 + 45, 84), n)
        lons = rs.uniform(c.lon0 - 3, c.lon0 + 3, n)
    else:
        lats = rs.uniform(-80, 84, n)
        lons = rs.uniform(-179, 179, n)
    return lons, lats


@pytest.mark.parametrize("code", sorted(crs.CRS_TABLE))
def test_round_trip_table(code):
    c = crs.CRS_TABLE[code]
    rs = np.random.RandomState(hash(code) % (2**31))
    lons, lats = _domain_points(c, rs)
    x, y = crs.forward(c, lons, lats)
    lon2, lat2 = crs.inverse(c, x, y)
    # 2e-8 deg ~ 2 mm: the 6th-order Snyder series' fwd/inv truncation
    # mismatch at the +-3 deg zone edge (exact closed forms need PROJ)
    assert np.max(np.abs(lon2 - lons)) < 2e-8
    assert np.max(np.abs(lat2 - lats)) < 2e-8


def test_round_trip_utm_synthesized():
    for code in ("EPSG:32652", "EPSG:32731"):
        c = crs.parse_crs(code)
        assert c is not None
        rs = np.random.RandomState(7)
        lons, lats = _domain_points(c, rs)
        if code.startswith("EPSG:327"):
            lats = -np.abs(lats)  # southern hemisphere zone
        x, y = crs.forward(c, lons, lats)
        lon2, lat2 = crs.inverse(c, x, y)
        assert np.max(np.abs(lon2 - lons)) < 2e-8
        assert np.max(np.abs(lat2 - lats)) < 2e-8


def _local_scale(c, lon, lat):
    """Numerical local scale factor along the meridian (conformal =>
    isotropic, so the meridian direction suffices)."""
    e2 = c.f * (2 - c.f)
    phi = np.radians(lat)
    # meridional radius of curvature
    M = c.a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    # ~1 m step: big enough that ulp(1e6 m) cancellation noise (~2e-8
    # relative at a 1 cm step) drops below 1e-9, small enough that the
    # curvature truncation term stays ~1e-14
    d = 1e-5  # degrees
    x1, y1 = crs.forward(c, lon, lat - d / 2)
    x2, y2 = crs.forward(c, lon, lat + d / 2)
    ground = M * np.radians(d)
    return np.hypot(x2 - x1, y2 - y1) / ground


def test_tmerc_scale_on_central_meridian():
    for code in ("EPSG:5186", "EPSG:5179", "EPSG:25832"):
        c = crs.CRS_TABLE[code]
        for lat in (20.0, 38.0, 55.0):
            k = _local_scale(c, c.lon0, lat)
            assert k == pytest.approx(c.k0, abs=2e-9), (code, lat)


def test_lcc_scale_on_standard_parallels():
    for code in ("EPSG:2154", "EPSG:3034"):
        c = crs.CRS_TABLE[code]
        for lat in (c.lat1, c.lat2):
            for lon in (c.lon0 - 5.0, c.lon0, c.lon0 + 5.0):
                k = _local_scale(c, lon, lat)
                assert k == pytest.approx(1.0, abs=2e-9), (code, lat, lon)
        # and k > 1 outside the parallels, < 1 between them
        lo, hi = sorted((c.lat1, c.lat2))
        assert _local_scale(c, c.lon0, (lo + hi) / 2) < 1.0
        assert _local_scale(c, c.lon0, hi + 4.0) > 1.0


def test_tmerc_matches_existing_utm_code():
    """crs.py's generalized tmerc must agree with geomops.utm_forward
    (already validated round-2) for UTM parameters at sub-mm level."""
    c = crs.parse_crs("EPSG:32633")
    rs = np.random.RandomState(3)
    lons = rs.uniform(12, 18, 500)
    lats = rs.uniform(-60, 70, 500)
    x1, y1 = crs.forward(c, lons, lats)
    x2, y2 = geomops.utm_forward(lons, lats, 15.0)
    assert np.max(np.abs(x1 - x2)) < 1e-7
    assert np.max(np.abs(y1 - y2)) < 1e-7


def test_cross_crs_transform_consistency():
    """tmerc(Korea) -> lcc(France) -> back == identity (through the
    shared geographic pivot)."""
    src = crs.CRS_TABLE["EPSG:5186"]
    dst = crs.CRS_TABLE["EPSG:2154"]
    rs = np.random.RandomState(11)
    lons = rs.uniform(125, 129, 100)
    lats = rs.uniform(33, 39, 100)
    x, y = crs.forward(src, lons, lats)
    fx, fy = crs.transform(src, dst, x, y)
    bx, by = crs.transform(dst, src, fx, fy)
    # 0.1 mm in projected meters: four series evaluations, two far
    # outside the LCC's domain (Korea through the France cone)
    assert np.max(np.abs(bx - x)) < 1e-4
    assert np.max(np.abs(by - y)) < 1e-4


def test_make_reproject_general_pair(ray_session):
    """Dataset-level reproject 5186 -> 2154 -> 5186 round-trips WKB."""
    import pyarrow as pa
    import ray

    from opengxt_ray.core import wkb as _wkb
    from opengxt_ray.stages.transforms import make_reproject

    rs = np.random.RandomState(4)
    src = crs.CRS_TABLE["EPSG:5186"]
    lons = rs.uniform(126, 128, 50)
    lats = rs.uniform(34, 38, 50)
    x, y = crs.forward(src, lons, lats)
    t = pa.table({"geom": pa.array(
        [_wkb.encode_point(float(a), float(b)) for a, b in zip(x, y)],
        pa.binary())})
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(make_reproject("EPSG:5186", "EPSG:2154"),
                         batch_format="pyarrow") \
        .map_batches(make_reproject("EPSG:2154", "EPSG:5186"),
                     batch_format="pyarrow").take_all()
    fg = _wkb.decode([r["geom"] for r in out])
    got = fg.coords
    assert np.max(np.abs(got[:, 0] - x)) < 1e-4  # same 4-series envelope
    assert np.max(np.abs(got[:, 1] - y)) < 1e-4


def test_raster_reproject_general_crs_marker_cell():
    """Reproject a 4326 raster to UTM 33N via the parameterized CRS
    engine: a marked source cell must land at its forward-mapped
    coordinates, and a constant field stays constant."""
    import pyarrow as pa
    import ray

    from opengxt_ray.core import crs as _crs
    from opengxt_ray.raster.geometry import reproject_raster
    from opengxt_ray.raster.tiles import (RasterMeta, partials_from_coo,
                                          reduce_tiles)

    meta = RasterMeta(12.0, 48.0, 0.01, 100, 100, tile_size=64)
    rows, cols = np.meshgrid(np.arange(100), np.arange(100), indexing="ij")
    vals = np.full(rows.size, 5.0)
    # marker at cell (30, 40)
    vals[(rows.ravel() == 30) & (cols.ravel() == 40)] = 99.0
    part = partials_from_coo(meta, rows.ravel(), cols.ravel(), vals)
    tiles = reduce_tiles(ray.data.from_arrow(part))

    out, new_meta = reproject_raster(tiles, meta, src="EPSG:4326",
                                     dst="EPSG:32633")
    dense = np.full((new_meta.height, new_meta.width), np.nan)
    for r in out.take_all():
        arr = np.frombuffer(r["data"], np.float64)
        h, w = new_meta.tile_shape(r["tx"], r["ty"])
        dense[r["ty"] * new_meta.tile_size:r["ty"] * new_meta.tile_size + h,
              r["tx"] * new_meta.tile_size:r["tx"] * new_meta.tile_size + w] \
            = arr.reshape(h, w)
    # constant region: everything inside maps to 5 or 99
    valid = ~np.isnan(dense)
    assert valid.mean() > 0.8
    assert set(np.unique(dense[valid])) <= {5.0, 99.0}
    # marker cell centre → forward coords → output cell must be 99
    mx, my = meta.cell_center(np.array([40]), np.array([30]))
    utm = _crs.parse_crs("EPSG:32633")
    fx, fy = _crs.forward(utm, mx, my)
    oc, orow = new_meta.world_to_cell(fx, fy)
    assert dense[int(orow[0]), int(oc[0])] == 99.0


def test_reproject_coshuffle_matches_broadcast():
    """The co-shuffled reproject scale path must produce the same grid
    as the broadcast path, NaNs included (nearest sampling)."""
    import pyarrow as pa
    import ray

    from opengxt_ray.raster.geometry import reproject_raster
    from opengxt_ray.raster.tiles import (RasterMeta, partials_from_coo,
                                          reduce_tiles)

    rng = np.random.default_rng(71)
    meta = RasterMeta(5.0, 52.0, 0.02, 120, 90, tile_size=32)
    rows, cols = np.meshgrid(np.arange(90), np.arange(120), indexing="ij")
    vals = rng.uniform(0, 100, rows.size)
    part = partials_from_coo(meta, rows.ravel(), cols.ravel(), vals)
    tiles = reduce_tiles(ray.data.from_arrow(part)).materialize()

    def _dense(out, nm):
        d = np.full((nm.height, nm.width), np.nan)
        for r in out.take_all():
            arr = np.frombuffer(r["data"], np.float64)
            h, w = nm.tile_shape(r["tx"], r["ty"])
            ts = nm.tile_size
            d[r["ty"]*ts:r["ty"]*ts+h, r["tx"]*ts:r["tx"]*ts+w] = \
                arr.reshape(h, w)
        return d

    o1, m1 = reproject_raster(tiles, meta, src="EPSG:4326",
                              dst="EPSG:32632", broadcast=True)
    o2, m2 = reproject_raster(tiles, meta, src="EPSG:4326",
                              dst="EPSG:32632", broadcast=False)
    assert (m1.width, m1.height, m1.origin_x) == \
        (m2.width, m2.height, m2.origin_x)
    d1, d2 = _dense(o1, m1), _dense(o2, m2)
    np.testing.assert_array_equal(d1, d2)
    assert np.isfinite(d1).mean() > 0.5
