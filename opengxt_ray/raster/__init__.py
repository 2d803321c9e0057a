"""Raster layer — tile-table model over Ray Data.

A raster is a Dataset of tile rows ``{tx:int32, ty:int32, data:binary}``
(row-major float64 tile pixels) plus a small :class:`RasterMeta` carried
out-of-band (broadcast, never shuffled). Mirrors the reference's tiled
``DiskMemImage`` (GT/gridcoverage/RasterProcessingOperation.java:439-498,
64×64 tiles) with Ray's object store replacing the disk tile cache.

Grid convention: pixel (col, row) covers
``x ∈ [origin_x + col·cell, +cell)``, ``y ∈ (origin_y − (row+1)·cell,
origin_y − row·cell]`` — row 0 at the top, like GridCoverage2D.
"""

from .tiles import RasterMeta, points_to_raster, raster_to_points, raster_statistics  # noqa: F401
from .density import kernel_density, line_density  # noqa: F401
from .zonal import zonal_statistics  # noqa: F401
