"""RasterToImage / MapToImage: PNG round-trip + pixel-exact oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import wkb as _wkb
from opengxt_ray.raster.image import (colorize, decode_png, encode_png,
                                      map_to_image, raster_to_image)
from opengxt_ray.raster.tiles import RasterMeta, partials_from_coo, \
    reduce_tiles


def test_png_round_trip():
    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 256, size=(23, 17, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_colorize_stretch_and_nodata():
    grid = np.array([[0.0, 5.0], [10.0, np.nan]])
    rgba = colorize(grid, ramp="gray", transparent=True)
    assert tuple(rgba[0, 0]) == (0, 0, 0, 255)
    assert tuple(rgba[1, 0]) == (255, 255, 255, 255)
    assert rgba[0, 1][0] in (127, 128)
    assert rgba[1, 1][3] == 0  # nodata transparent
    opaque = colorize(grid, ramp="gray", transparent=False,
                      bg_color=(9, 8, 7))
    assert tuple(opaque[1, 1]) == (9, 8, 7, 255)


def _tiles_from_grid(grid, meta):
    rows, cols = np.nonzero(~np.isnan(grid))
    vals = grid[rows, cols]
    part = partials_from_coo(meta, rows, cols, vals)
    return reduce_tiles(ray.data.from_arrow(part))


def test_raster_to_image_pixel_exact():
    # 8x8 raster, tile_size 4 -> 4 tiles; render at native resolution
    grid = np.arange(64, dtype=np.float64).reshape(8, 8)
    meta = RasterMeta(0.0, 8.0, 1.0, 8, 8, tile_size=4)
    tiles = _tiles_from_grid(grid, meta)
    png = raster_to_image(tiles, meta, width=8, height=8, ramp="gray",
                          vmin=0.0, vmax=63.0)
    rgba = decode_png(png)
    want = np.round(grid / 63.0 * 255).astype(np.uint8)
    assert np.array_equal(rgba[:, :, 0], want)
    assert (rgba[:, :, 3] == 255).all()


def test_raster_to_image_bbox_window_and_upsample():
    grid = np.arange(16, dtype=np.float64).reshape(4, 4)
    meta = RasterMeta(0.0, 4.0, 1.0, 4, 4, tile_size=4)
    tiles = _tiles_from_grid(grid, meta)
    # 2x upsample of the top-left 2x2 world window [0,2]x[2,4]
    png = raster_to_image(tiles, meta, width=4, height=4,
                          bbox=(0.0, 2.0, 2.0, 4.0), ramp="gray",
                          vmin=0.0, vmax=15.0)
    rgba = decode_png(png)
    # each source cell covers a 2x2 pixel block: cells (0,0)=0 (0,1)=1
    # (1,0)=4 (1,1)=5
    for (r, c), v in {(0, 0): 0, (0, 2): 1, (2, 0): 4, (2, 2): 5}.items():
        want = round(v / 15.0 * 255)
        block = rgba[r:r + 2, c:c + 2, 0]
        assert (block == want).all()


def test_map_to_image_renders_polygon():
    sq = np.array([[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], float)
    ds = ray.data.from_arrow(pa.table({
        "geom": pa.array([_wkb.encode_polygon(sq)], pa.binary()),
        "v": pa.array([7.0])}))
    png = map_to_image(ds, bbox=(0.0, 0.0, 10.0, 10.0), width=10,
                       height=10, value_col="v", ramp="gray")
    rgba = decode_png(png)
    assert rgba.shape == (10, 10, 4)
    # interior pixels painted, corners outside the square transparent
    assert rgba[5, 5, 3] == 255
    assert rgba[0, 0, 3] == 0 and rgba[9, 9, 3] == 0


def test_raster_to_image_rejects_other_formats():
    meta = RasterMeta(0.0, 1.0, 1.0, 1, 1)
    with pytest.raises(ValueError, match="PNG"):
        raster_to_image(None, meta, width=1, height=1, fmt="jpeg")


def test_registry_has_image_ops():
    from opengxt_ray import registry
    assert registry.get("RasterToImage").build is not None
    assert registry.get("MapToImage").build is not None
