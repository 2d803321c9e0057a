"""Per-record transform stages (§2.2) + registry."""

import numpy as np
import pyarrow as pa
import pytest

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.stages import transforms as T


def _batch_polys():
    sq = _wkb.encode_polygon(np.array([[0, 0], [4, 0], [4, 4], [0, 4]]),
                             [np.array([[1, 1], [2, 1], [2, 2], [1, 2]])])
    tri = _wkb.encode_polygon(np.array([[10, 10], [14, 10], [12, 13]]))
    return pa.table({"id": pa.array([1, 2]),
                     "geom": pa.array([sq, tri], pa.binary())})


def _batch_lines():
    l1 = _wkb.encode_linestring(np.array([[0, 0], [3, 4], [3, 10]]))
    l2 = _wkb.encode_linestring(np.array([[5, 5], [5, 6]]))
    return pa.table({"id": pa.array([1, 2]),
                     "geom": pa.array([l1, l2], pa.binary())})


def test_calculate_area_length_xy():
    b = _batch_polys()
    out = T.calculate_area(b)
    np.testing.assert_allclose(out["geom_area"].to_numpy(), [15.0, 6.0])
    out = T.calculate_length(_batch_lines())
    np.testing.assert_allclose(out["geom_len"].to_numpy(), [11.0, 1.0])
    out = T.calculate_xy(_batch_lines())
    assert out["center_x"][0].as_py() == pytest.approx((1.5 * 5 + 3 * 6) / 11)


def test_calculate_field_and_filter():
    b = pa.table({"a": pa.array([1.0, 2.0, 3.0]), "b": pa.array([10.0, 20.0, 30.0])})
    calc = T.make_calculate_field("a * 2 + sqrt(b)", "c")
    out = calc(b)
    np.testing.assert_allclose(out["c"].to_numpy(),
                               [2 + np.sqrt(10), 4 + np.sqrt(20), 6 + np.sqrt(30)])
    flt = T.make_filter("a >= 2")
    assert flt(b).num_rows == 2
    with pytest.raises(ValueError):
        T.make_calculate_field("__import__('os')", "x")


def test_buffer_point_area():
    pts = pa.table({"id": pa.array([1]),
                    "geom": pa.array([_wkb.encode_point(0, 0)], pa.binary())})
    buf = T.make_buffer(2.0, quadrant_segs=64)(pts)
    fg = _wkb.decode(buf["geom"].to_pylist())
    # area of 256-gon ≈ π r²
    assert geomops.areas(fg)[0] == pytest.approx(np.pi * 4, rel=1e-3)


def test_multiple_ring_buffer():
    pts = pa.table({"id": pa.array([1, 2]),
                    "geom": pa.array([_wkb.encode_point(0, 0),
                                      _wkb.encode_point(10, 10)], pa.binary())})
    rings = T.make_multiple_ring_buffer([1.0, 2.0, 3.0])(pts)
    assert rings.num_rows == 6
    assert rings["ring_dist"].to_pylist() == [1.0, 2.0, 3.0] * 2


def test_hulls_envelopes():
    b = _batch_polys()
    env = T.envelope_to_polygon(b)
    fg = _wkb.decode(env["geom"].to_pylist())
    np.testing.assert_allclose(geomops.areas(fg), [16.0, 12.0])
    hull = T.convex_hull_transform(_batch_lines())
    fg = _wkb.decode(hull["geom"].to_pylist())
    assert fg.types[0] == _wkb.POLYGON
    mbr = T.minimum_rectangle(b)
    fg = _wkb.decode(mbr["geom"].to_pylist())
    assert geomops.areas(fg)[0] == pytest.approx(16.0, rel=1e-9)
    mbc = T.minimum_bounding_circle(b, segs=64)
    fg = _wkb.decode(mbc["geom"].to_pylist())
    # circle must contain all vertices
    assert geomops.areas(fg)[0] >= 16.0 * np.pi / 4 * 0.9
    octe = T.octagonal_envelope(b)
    fg = _wkb.decode(octe["geom"].to_pylist())
    assert 12.0 <= geomops.areas(fg)[0] <= 16.0


def test_coordinate_transforms():
    b = _batch_polys()
    off = T.make_offset(10.0, -5.0)(b)
    fg = _wkb.decode(off["geom"].to_pylist())
    np.testing.assert_allclose(geomops.areas(fg), [15.0, 6.0])
    assert fg.coords[:, 0].min() == 10.0
    rot = T.make_rotate(90.0, origin=(0, 0))(b)
    fg = _wkb.decode(rot["geom"].to_pylist())
    np.testing.assert_allclose(geomops.areas(fg), [15.0, 6.0])
    sc = T.make_scale(2.0, 2.0)(b)
    fg = _wkb.decode(sc["geom"].to_pylist())
    np.testing.assert_allclose(geomops.areas(fg), [60.0, 24.0])


def test_simplify_densify_flip():
    line = _wkb.encode_linestring(
        np.array([[0, 0], [1, 0.001], [2, -0.001], [3, 0], [3, 5]]))
    b = pa.table({"geom": pa.array([line], pa.binary())})
    simp = T.make_simplify(0.01)(b)
    fg = _wkb.decode(simp["geom"].to_pylist())
    assert len(fg.geom_coords(0)) == 3
    dens = T.make_densify(0.5)(b)
    fg = _wkb.decode(dens["geom"].to_pylist())
    d = np.diff(fg.geom_coords(0), axis=0)
    assert np.hypot(d[:, 0], d[:, 1]).max() <= 0.5 + 1e-9
    fl = T.flip_line(_batch_lines())
    fg = _wkb.decode(fl["geom"].to_pylist())
    np.testing.assert_allclose(fg.geom_coords(0)[0], [3, 10])


def test_explosions():
    vp = T.vertices_to_points(_batch_polys())
    assert vp.num_rows == 5 + 5 + 4  # shell(5) + hole(5) + tri(4) closed rings
    mp = _wkb.encode_multipolygon([
        (np.array([[0, 0], [1, 0], [1, 1], [0, 1]]), []),
        (np.array([[5, 5], [6, 5], [6, 6], [5, 6]]), []),
    ])
    b = pa.table({"id": pa.array([7]), "geom": pa.array([mp], pa.binary())})
    single = T.multipart_to_singlepart(b)
    assert single.num_rows == 2
    fg = _wkb.decode(single["geom"].to_pylist())
    np.testing.assert_allclose(geomops.areas(fg), [1.0, 1.0])
    seg = T.split_line_at_vertices(_batch_lines())
    assert seg.num_rows == 2 + 1
    pal = T.points_along_lines(_batch_lines(), distance=2.0)
    # line1 len 11 → offsets 0,2,4,6,8,10 (6); line2 len 1 → offset 0 (1)
    assert pal.num_rows == 7


def test_cleanup():
    rh = T.remove_holes(_batch_polys())
    fg = _wkb.decode(rh["geom"].to_pylist())
    np.testing.assert_allclose(geomops.areas(fg), [16.0, 6.0])
    # repair: duplicate consecutive vertices removed
    bad = _wkb.encode_linestring(np.array([[0, 0], [0, 0], [1, 1], [1, 1], [2, 2]]))
    b = pa.table({"geom": pa.array([bad], pa.binary())})
    rep = T.repair_geometry(b)
    fg = _wkb.decode(rep["geom"].to_pylist())
    assert len(fg.geom_coords(0)) == 3


def test_reproject_roundtrip():
    pts = pa.table({"geom": pa.array([_wkb.encode_point(10.0, 45.0)], pa.binary())})
    to3857 = T.make_reproject("EPSG:4326", "EPSG:3857")(pts)
    back = T.make_reproject("EPSG:3857", "EPSG:4326")(to3857)
    fg = _wkb.decode(back["geom"].to_pylist())
    np.testing.assert_allclose(fg.coords[0], [10.0, 45.0], atol=1e-9)
    x, y = _wkb.decode_points(to3857["geom"].to_pylist())
    assert x[0] == pytest.approx(1113194.9, rel=1e-3)


def test_registry_coverage():
    from opengxt_ray import registry

    assert len(registry.names()) >= 70
    cats = registry.by_category()
    for cat in ("join", "aggregate", "hotspot", "distribution", "binning",
                "classify", "transform", "raster", "trainingdata"):
        assert cat in cats and len(cats[cat]) >= 4, cat
    e = registry.get("SpatialJoin")
    assert "SpatialJoinOperation" in e.reference


def test_maximum_inscribed_circle():
    sq = _wkb.encode_polygon(np.array([[0, 0], [10, 0], [10, 10], [0, 10]]))
    tri = _wkb.encode_polygon(np.array([[0, 0], [8, 0], [0, 6]]))
    b = pa.table({"geom": pa.array([sq, tri], pa.binary())})
    out = T.maximum_inscribed_circle(b)
    r = out["mic_radius"].to_pylist()
    assert r[0] == pytest.approx(5.0, rel=2e-3)
    assert r[1] == pytest.approx(2.0, rel=3e-3)  # 3-4-5 inradius
    fg = _wkb.decode(out["geom"].to_pylist())
    # circle fully inside original square
    ring = fg.geom_coords(0)
    orig = _wkb.decode([sq])
    assert geomops.points_in_geom(ring[:, 0], ring[:, 1], orig, 0).all()


def test_split_polygon_by_count_concave():
    L = _wkb.encode_polygon(np.array([[0, 0], [2, 0], [2, 1], [1, 1],
                                      [1, 2], [0, 2]]))
    b = pa.table({"geom": pa.array([L], pa.binary())})
    out = T.split_polygon_by_count(b, parts=3)
    fg = _wkb.decode(out["geom"].to_pylist())
    a = geomops.areas(fg)
    assert len(a) == 3
    np.testing.assert_allclose(a, 1.0, atol=1e-6)
    assert out["part_idx"].to_pylist() == [0, 1, 2]


def test_reproject_utm_zone_roundtrip():
    """4326 ↔ EPSG:32652 (UTM 52N, the reference's home zone) via the
    hand-rolled Snyder TM pair; round trip ≤ 1e-6 deg (~10 cm)."""
    from opengxt_ray.stages.transforms import make_reproject

    rs = np.random.RandomState(8)
    lon = rs.uniform(126, 130, 50)
    lat = rs.uniform(33, 39, 50)
    batch = pa.table({"geom": pa.array(
        [_wkb.encode_point(float(x), float(y)) for x, y in zip(lon, lat)],
        pa.binary())})
    utm = make_reproject("EPSG:4326", "EPSG:32652")(batch)
    fg = _wkb.decode(utm["geom"].to_pylist())
    xs = np.array([fg.geom_coords(i)[0, 0] for i in range(len(fg))])
    assert (xs > 100_000).all() and (xs < 900_000).all()
    back = make_reproject("EPSG:32652", "EPSG:4326")(utm)
    fgb = _wkb.decode(back["geom"].to_pylist())
    for i in range(len(fgb)):
        p = fgb.geom_coords(i)[0]
        assert abs(p[0] - lon[i]) < 1e-6 and abs(p[1] - lat[i]) < 1e-6
    # southern zone: false northing applied
    latS = -lat
    bS = pa.table({"geom": pa.array(
        [_wkb.encode_point(float(x), float(y)) for x, y in zip(lon, latS)],
        pa.binary())})
    utmS = make_reproject("EPSG:4326", "EPSG:32752")(bS)
    fgS = _wkb.decode(utmS["geom"].to_pylist())
    ys = np.array([fgS.geom_coords(i)[0, 1] for i in range(len(fgS))])
    assert (ys > 0).all() and (ys < 10_000_000).all()
    backS = make_reproject("EPSG:32752", "EPSG:4326")(utmS)
    fgbS = _wkb.decode(backS["geom"].to_pylist())
    for i in range(len(fgbS)):
        p = fgbS.geom_coords(i)[0]
        assert abs(p[0] - lon[i]) < 1e-6 and abs(p[1] - latS[i]) < 1e-6
