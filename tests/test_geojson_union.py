"""GeoJSON/WKT codecs + tessellation-union dissolve."""

import json

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.ops.aggregate import dissolve
from opengxt_ray.ops.binning import fishnet
from opengxt_ray.sources.geojson import (dataset_to_geojson, geojson_to_table,
                                         wkb_to_wkt)


FC = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [1.5, 2.5]},
         "properties": {"name": "a", "v": 1}},
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                                      [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]},
         "properties": {"name": "b", "v": 2}},
        {"type": "Feature",
         "geometry": {"type": "LineString",
                      "coordinates": [[0, 0], [3, 4]]},
         "properties": {"name": "c", "v": 3}},
    ],
}


def test_geojson_roundtrip():
    t = geojson_to_table(FC)
    assert t.num_rows == 3
    fg = _wkb.decode(t["geom"].to_pylist())
    np.testing.assert_allclose(geomops.areas(fg), [0.0, 15.0, 0.0])
    ds = ray.data.from_arrow(t)
    back = dataset_to_geojson(ds)
    assert back["type"] == "FeatureCollection"
    got = {f["properties"]["name"]: f["geometry"] for f in back["features"]}
    assert got["a"]["type"] == "Point"
    assert got["a"]["coordinates"] == [1.5, 2.5]
    assert got["b"]["type"] == "Polygon"
    assert len(got["b"]["coordinates"]) == 2  # shell + hole survive
    # JSON-serializable end to end
    json.dumps(back)


def test_wkt():
    assert wkb_to_wkt(_wkb.encode_point(1.5, -2.0)) == "POINT (1.5 -2)"
    assert wkb_to_wkt(_wkb.encode_linestring(
        np.array([[0, 0], [1, 1]]))) == "LINESTRING (0 0, 1 1)"
    w = wkb_to_wkt(_wkb.encode_polygon(np.array([[0, 0], [1, 0], [1, 1], [0, 1]])))
    assert w.startswith("POLYGON ((0 0, 1 0, 1 1, 0 1")


def test_dissolve_union_tessellation():
    # 4x4 fishnet, dissolve into quadrant groups → 4 squares of area 4
    grid = fishnet((0, 0, 4, 4), columns=4, rows=4, parallelism=2)
    tagged = grid.map_batches(
        lambda b: b.append_column("quad", pa.array(
            (b["col"].to_numpy() // 2 + 2 * (b["row"].to_numpy() // 2))
            .astype(np.int32))),
        batch_format="pyarrow")
    out = dissolve(tagged, "quad", union_geom=True).to_pandas()
    assert len(out) == 4
    fg = _wkb.decode(out["geom"].tolist())
    np.testing.assert_allclose(geomops.areas(fg), [4.0] * 4)
    # perimeters exactly 8 (2x2 squares — internal edges cancelled)
    np.testing.assert_allclose(geomops.lengths(fg), [8.0] * 4)


def test_dissolve_union_with_hole():
    # 3x3 grid minus the center cell, single group → donut area 8
    grid = fishnet((0, 0, 3, 3), columns=3, rows=3, parallelism=1)
    ring_cells = grid.filter(lambda r: r["cell_id"] != 4)
    tagged = ring_cells.map_batches(
        lambda b: b.append_column("g", pa.array(np.zeros(len(b), np.int32))),
        batch_format="pyarrow")
    out = dissolve(tagged, "g", union_geom=True).to_pandas()
    fg = _wkb.decode(out["geom"].tolist())
    np.testing.assert_allclose(geomops.areas(fg), [8.0])
    # the hole is real: center point not inside
    assert not geomops.points_in_geom(np.array([1.5]), np.array([1.5]), fg, 0)[0]
    assert geomops.points_in_geom(np.array([0.5]), np.array([0.5]), fg, 0)[0]


def test_dissolve_union_overlapping_members():
    from opengxt_ray.ops.aggregate import dissolve

    t = pa.table({"g": pa.array([0, 0, 0]), "geom": pa.array([
        _wkb.encode_polygon(np.array([[0, 0], [6, 0], [6, 6], [0, 6]])),
        _wkb.encode_polygon(np.array([[4, 0], [10, 0], [10, 6], [4, 6]])),
        _wkb.encode_polygon(np.array([[8, 0], [14, 0], [14, 6], [8, 6]])),
    ], pa.binary()), "v": pa.array([1.0, 1.0, 1.0])})
    out = dissolve(ray.data.from_arrow(t), "g", value_cols=["v"],
                   union_geom=True).to_pandas()
    fg = _wkb.decode(out.geom.tolist())
    assert geomops.areas(fg).sum() == pytest.approx(84.0, abs=1e-9)


def test_linear_los_on_ramp():
    from opengxt_ray.raster import RasterMeta, points_to_raster
    from opengxt_ray.raster.interpolate import linear_los
    from opengxt_ray.raster.tiles import reduce_tiles, partials_from_coo

    # terrain: flat 0 with a wall (z=50) at x≈50
    meta = RasterMeta(0.0, 100.0, 1.0, 100, 100, tile_size=50)
    cols, rows = np.meshgrid(np.arange(100), np.arange(100))
    z = np.zeros((100, 100))
    z[:, 50] = 50.0
    import ray as _ray

    t = partials_from_coo(meta, rows.ravel(), cols.ravel(), z.ravel())
    tiles = reduce_tiles(_ray.data.from_arrow(t)).materialize()
    los = linear_los(tiles, meta, (0.5, 50.5), (99.5, 50.5),
                     observer_height=2.0).to_pandas()
    vis = los.sort_values("station")
    # before the wall: visible; behind the wall: hidden
    before = vis[(vis.x < 49.5)]
    behind = vis[(vis.x > 51.5) & (vis.x < 99)]
    assert before.visible.all()
    assert not behind.visible.any()
    # wall cell itself visible
    wall = vis[(vis.x > 49.5) & (vis.x < 51.5)]
    assert wall.visible.any()
