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


# ---------------------------------------------------------------------------
# Round 4: Helmert 7-parameter datum shifts
# ---------------------------------------------------------------------------

def test_osgb36_caister_worked_example():
    """OS 'A guide to coordinate systems in Great Britain' TM worked
    example (Caister water tower): OSGB36 52°39'27.2531"N,
    1°43'4.5177"E ↔ National Grid E 651409.903 N 313177.270 — pure
    Airy-1830 projection, mm-tight both ways."""
    from opengxt_ray.core import crs as C

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    bng = C.parse_crs("EPSG:27700")
    e, n = C.forward(bng, np.array([lon]), np.array([lat]))
    assert abs(e[0] - 651409.903) < 0.01
    assert abs(n[0] - 313177.270) < 0.01
    lon2, lat2 = C.inverse(bng, np.array([651409.903]),
                           np.array([313177.270]))
    assert abs(lon2[0] - lon) < 1e-7 and abs(lat2[0] - lat) < 1e-7
    # and through the Helmert: the same point's WGS84 expression moves
    # ~west by the documented ~1.1" lon / ~1.5" lat datum offset, and
    # projecting the shifted coords straight back (shift applied again
    # in reverse) reproduces the grid exactly
    wgs = C.parse_crs("EPSG:4326")
    lon_w, lat_w = C.transform(bng, wgs, np.array([651409.903]),
                               np.array([313177.270]))
    e2, n2 = C.transform(wgs, bng, lon_w, lat_w)
    assert abs(e2[0] - 651409.903) < 0.01
    assert abs(n2[0] - 313177.270) < 0.01
    assert 0.5 / 3600 < abs(lon_w[0] - lon) < 10 / 3600
    assert 0.5 / 3600 < abs(lat_w[0] - lat) < 10 / 3600


def test_osgb36_greenwich_meridian_offset():
    """The Airy transit circle sits ~5.31\" W of the WGS84 zero
    meridian; in OSGB36 its longitude is ~0 by construction. The
    datum shift must absorb the offset."""
    from opengxt_ray.core import crs as C

    wgs = C.parse_crs("EPSG:4326")
    osgb = C.parse_crs("EPSG:4277")
    lon, lat = C.transform(wgs, osgb, np.array([-5.3101 / 3600]),
                           np.array([51 + 28 / 60 + 40.1247 / 3600]))
    assert abs(lon[0]) < 0.0005  # ≈ 35 m — inside single-Helmert band
    # and WITHOUT the shift the offset would remain (sanity: ~5")
    assert abs(-5.3101 / 3600) > 0.001 / 3600


def test_datum_roundtrips_subcentimeter():
    """transform(src→dst→src) closes to sub-cm for every legacy datum
    (the negated-parameter Helmert inverse is 2nd-order exact)."""
    from opengxt_ray.core import crs as C

    wgs = C.parse_crs("EPSG:4326")
    pts = {
        "EPSG:27700": (np.array([-2.0, 0.5, -4.1]),
                       np.array([50.5, 52.0, 57.2])),
        "EPSG:23031": (np.array([0.5, 2.9]), np.array([39.5, 48.0])),
        "EPSG:4301": (np.array([139.7, 135.5]), np.array([35.7, 34.7])),
    }
    for code, (lon, lat) in pts.items():
        crs = C.parse_crs(code)
        x, y = C.transform(wgs, crs, lon, lat)
        lon2, lat2 = C.transform(crs, wgs, x, y)
        # 1e-7 deg ≈ 1 cm
        assert np.abs(lon2 - lon).max() < 2e-7
        assert np.abs(lat2 - lat).max() < 2e-7


def test_datum_shift_magnitudes_match_published_bands():
    """Same physical point expressed in the legacy datum moves by the
    published magnitude: ED50 ~100-250 m in W. Europe, Tokyo
    ~350-500 m in Japan, OSGB36 ~50-120 m in GB."""
    from opengxt_ray.core import crs as C

    wgs = C.parse_crs("EPSG:4326")

    def shift_m(code, lon, lat):
        g = C.CRSDef("longlat", C.parse_crs(code).a, C.parse_crs(code).f,
                     datum=C.parse_crs(code).datum)
        lon2, lat2 = C.transform(wgs, g, np.array([lon]), np.array([lat]))
        return float(np.hypot((lon2[0] - lon) * 111_320 *
                              np.cos(np.radians(lat)),
                              (lat2[0] - lat) * 110_574))

    assert 80 < shift_m("EPSG:4230", 2.35, 48.86) < 250     # ED50, Paris
    assert 350 < shift_m("EPSG:4301", 139.7, 35.7) < 550    # Tokyo
    assert 50 < shift_m("EPSG:4277", -1.0, 52.0) < 130      # OSGB36


def test_ecef_geodetic_roundtrip_vectorized():
    from opengxt_ray.core import crs as C

    a, f = 6_377_563.396, 1 / 299.3249646
    lon = np.linspace(-179, 179, 23)
    lat = np.linspace(-89, 89, 23)
    X, Y, Z = C._geodetic_to_ecef(a, f, lon, lat)
    lon2, lat2 = C._ecef_to_geodetic(a, f, X, Y, Z)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_make_reproject_legacy_datum_pair():
    """The reproject stage resolves the new legacy-datum CRSs and the
    Helmert shift is applied (lon -2 sits ~100 m EAST of the OSGB36
    central meridian once shifted — without the shift it would land at
    exactly E 400000)."""
    import pyarrow as pa

    from opengxt_ray.core import wkb as W
    from opengxt_ray.stages.transforms import make_reproject

    fn = make_reproject("EPSG:4326", "EPSG:27700")
    t = pa.table({"geom": pa.array([W.encode_point(-2.0, 52.0)],
                                   pa.binary())})
    x, y = W.decode(fn(t)["geom"].to_pylist()).geom_coords(0)[0]
    assert 50 < abs(x - 400_000) < 150   # shift visible, sane size
    assert abs(y - 233_500) < 500
    back = make_reproject("EPSG:27700", "EPSG:4326")
    lon, lat = W.decode(back(fn(t))["geom"].to_pylist()).geom_coords(0)[0]
    assert abs(lon - -2.0) < 2e-7 and abs(lat - 52.0) < 2e-7


def test_datum_shift_pole_safe():
    """ECEF→geodetic at the poles: cos(phi)→0 must not emit NaN
    (round-5 fix — pole-safe height branch in _ecef_to_geodetic)."""
    from opengxt_ray.core import crs as C

    wgs = C.parse_crs("EPSG:4326")
    osgb = C.parse_crs("EPSG:4277")
    lon, lat = C.transform(wgs, osgb, np.array([0.0, 13.0, 0.0]),
                           np.array([90.0, -90.0, 89.9999]))
    assert np.isfinite(lon).all() and np.isfinite(lat).all()
    # pole latitude survives the shift to within the Helmert's ~10"
    assert abs(abs(lat[0]) - 90.0) < 0.01
    assert abs(abs(lat[1]) - 90.0) < 0.01
    # and the inverse lands back at the pole
    lon2, lat2 = C.transform(osgb, wgs, lon, lat)
    assert np.isfinite(lat2).all()
    assert abs(lat2[0] - 90.0) < 0.01


# ---------------------------------------------------------------------------
# NTv2-style grid-shift datum corrections (round 5)
# ---------------------------------------------------------------------------

def _linear_grid():
    """Synthetic grid whose shift is a LINEAR field in (lon, lat) —
    bilinear interpolation reproduces a linear field exactly, so the
    expected values are analytic."""
    from opengxt_ray.core.crs import GridShift
    lats = np.arange(49.0, 62.0 + 1e-9, 0.5)
    lons = np.arange(-8.0, 2.0 + 1e-9, 0.5)
    LON, LAT = np.meshgrid(lons, lats)
    # arcseconds: dlon = 1.2 + 0.1·lon − 0.05·lat; dlat = −0.8 + 0.02·lon
    s_lon = 1.2 + 0.1 * LON - 0.05 * LAT
    s_lat = -0.8 + 0.02 * LON
    return GridShift(lat0=49.0, lon0=-8.0, dlat=0.5, dlon=0.5,
                     shift_lat=s_lat, shift_lon=s_lon)


def test_grid_shift_bilinear_exact_on_linear_field():
    g = _linear_grid()
    lon = np.array([-3.17, 0.91, -7.99, 1.99])
    lat = np.array([51.03, 60.47, 49.01, 61.99])
    glon, glat, inside = g.apply(lon, lat)
    assert inside.all()
    exp_lon = lon + (1.2 + 0.1 * lon - 0.05 * lat) / 3600.0
    exp_lat = lat + (-0.8 + 0.02 * lon) / 3600.0
    np.testing.assert_allclose(glon, exp_lon, atol=1e-12)
    np.testing.assert_allclose(glat, exp_lat, atol=1e-12)


def test_grid_shift_inverse_roundtrip():
    g = _linear_grid()
    lon = np.linspace(-7.5, 1.5, 40)
    lat = np.linspace(49.5, 61.5, 40)
    glon, glat, _ = g.apply(lon, lat)
    blon, blat, inside = g.apply_inverse(glon, glat)
    assert inside.all()
    np.testing.assert_allclose(blon, lon, atol=1e-10)   # sub-mm
    np.testing.assert_allclose(blat, lat, atol=1e-10)


def test_grid_consistent_with_helmert_and_fallback():
    """A grid whose nodes are sampled FROM the Helmert shift must
    reproduce the Helmert result (interpolation error only) inside
    the grid, and EXACTLY outside it (fallback path)."""
    from opengxt_ray.core import crs as C
    src = C.parse_crs("EPSG:4277")   # OSGB36 geographic
    dst = C.parse_crs("EPSG:4326")
    lats = np.arange(49.0, 62.0 + 1e-9, 0.05)
    lons = np.arange(-8.0, 2.0 + 1e-9, 0.05)
    LON, LAT = np.meshgrid(lons, lats)
    hl, hp = C._datum_shift(src, dst, LON.ravel(), LAT.ravel())
    s_lon = (hl.reshape(LON.shape) - LON) * 3600.0
    s_lat = (hp.reshape(LAT.shape) - LAT) * 3600.0
    grid = C.GridShift(lat0=49.0, lon0=-8.0, dlat=0.05, dlon=0.05,
                       shift_lat=s_lat, shift_lon=s_lon)
    pts_lon = np.array([-2.33, 0.44, -6.1, 25.0])   # last OUTSIDE
    pts_lat = np.array([53.71, 52.2, 50.9, 40.0])
    ref_lon, ref_lat = C._datum_shift(src, dst, pts_lon, pts_lat)
    C.register_grid_shift("OSGB36", grid)
    try:
        got_lon, got_lat = C._datum_shift(src, dst, pts_lon, pts_lat)
    finally:
        C.unregister_grid_shift("OSGB36")
    # inside: within bilinear error of the 0.05° sampling (≪ 1e-6°)
    np.testing.assert_allclose(got_lon[:3], ref_lon[:3], atol=2e-7)
    np.testing.assert_allclose(got_lat[:3], ref_lat[:3], atol=2e-7)
    # outside: exact Helmert fallback
    assert got_lon[3] == ref_lon[3] and got_lat[3] == ref_lat[3]


def test_grid_shift_through_projected_transform():
    """End-to-end: registering a grid changes EPSG:27700→4326 output
    by the grid correction; unregistering restores the Helmert path."""
    from opengxt_ray.core import crs as C
    src = C.parse_crs("EPSG:27700")
    dst = C.parse_crs("EPSG:4326")
    x = np.array([530_000.0])
    y = np.array([180_000.0])
    base_lon, base_lat = C.transform(src, dst, x, y)
    # constant +1" lon shift grid over Britain
    ones = np.ones((27, 21))
    C.register_grid_shift("OSGB36", C.GridShift(
        lat0=49.0, lon0=-8.0, dlat=0.5, dlon=0.5,
        shift_lat=np.zeros((27, 21)), shift_lon=ones))
    try:
        glon, glat = C.transform(src, dst, x, y)
    finally:
        C.unregister_grid_shift("OSGB36")
    # the grid REPLACES the Helmert shift: output = raw OSGB36
    # geographic + exactly the grid's +1" lon / 0" lat correction
    raw_lon, raw_lat = C.inverse(src, x, y)
    np.testing.assert_allclose(glon, raw_lon + 1.0 / 3600.0, atol=1e-12)
    np.testing.assert_allclose(glat, raw_lat, atol=1e-12)
    assert abs(glon - base_lon) > 1e-6  # grid really took over
    after_lon, after_lat = C.transform(src, dst, x, y)
    assert after_lon == base_lon and after_lat == base_lat


def test_grid_ships_to_workers_via_stage_closure(ray_session):
    """Grids must travel IN the stage closure: driver-side
    register_grid_shift does not exist in Ray worker processes. The
    +1" lon grid must move every output by exactly 1" vs the plain
    Helmert stage."""
    import pyarrow as pa
    import ray

    from opengxt_ray.core import wkb as _wkb
    from opengxt_ray.stages.transforms import make_reproject

    x = np.linspace(420_000, 580_000, 64)
    y = np.linspace(120_000, 280_000, 64)
    t = pa.table({"geom": pa.array(
        [_wkb.encode_point(float(a), float(b)) for a, b in zip(x, y)],
        pa.binary())})
    grid = crs.GridShift(49.0, -8.0, 0.5, 0.5,
                         np.zeros((27, 21)), np.ones((27, 21)))
    ds = ray.data.from_arrow(t).repartition(4)
    base = ds.map_batches(
        make_reproject("EPSG:27700", "EPSG:4326"),
        batch_format="pyarrow").take_all()
    shifted = ds.map_batches(
        make_reproject("EPSG:27700", "EPSG:4326",
                       grids={"OSGB36": grid}),
        batch_format="pyarrow").take_all()
    lon_b, _ = _wkb.decode_points([r["geom"] for r in base])
    lon_s, _ = _wkb.decode_points([r["geom"] for r in shifted])
    # grid REPLACES the Helmert lon shift; vs raw OSGB36 lon it is +1"
    src = crs.parse_crs("EPSG:27700")
    raw_lon, _ = crs.inverse(src, x, y)
    np.testing.assert_allclose(np.sort(lon_s), np.sort(raw_lon + 1 / 3600.0),
                               atol=1e-12)
    assert np.abs(np.sort(lon_s) - np.sort(lon_b)).min() > 1e-6
