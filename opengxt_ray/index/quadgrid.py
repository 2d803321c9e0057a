"""S2-style quadtree cell index (Morton/Z-order) — the fallback key.

Cells are squares in lon/lat: level L splits the world into 2^L × 2^L.
Cell id (uint64): ``[5 bits level][59 bits morton(ix, iy)]``. Pure
integer math, hierarchical: parent = child >> 2 on the morton part.
"""

from __future__ import annotations

import numpy as np


def _interleave(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Morton-interleave two ≤29-bit integer arrays → uint64."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return spread(ix) | (spread(iy) << np.uint64(1))


def quad_cell(lon, lat, level: int) -> np.ndarray:
    """Vectorized lon/lat → quad cell id at `level` (≤ 29)."""
    n = np.int64(1) << level
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    ix = np.clip(((x + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((y + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return (np.uint64(level) << np.uint64(59)) | _interleave(ix, iy)


def _deinterleave(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    def compact(v):
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v.astype(np.int64)

    return compact(m), compact(m >> np.uint64(1))


def quad_center(cell) -> tuple[np.ndarray, np.ndarray]:
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    level = (cell >> np.uint64(59)).astype(np.int64)
    m = cell & np.uint64((1 << 59) - 1)
    ix, iy = _deinterleave(m)
    n = (np.int64(1) << level).astype(np.float64)
    lon = (ix + 0.5) / n * 360.0 - 180.0
    lat = (iy + 0.5) / n * 180.0 - 90.0
    return lon, lat


def quad_neighbors(cell: int) -> np.ndarray:
    """8-neighborhood + self of one cell."""
    cell = np.asarray([cell], dtype=np.uint64)
    level = int(cell[0] >> np.uint64(59))
    m = cell & np.uint64((1 << 59) - 1)
    ix, iy = _deinterleave(m)
    n = np.int64(1) << level
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            jx, jy = ix[0] + dx, iy[0] + dy
            if 0 <= jx < n and 0 <= jy < n:
                out.append((jx, jy))
    arr = np.asarray(out, dtype=np.int64)
    return (np.uint64(level) << np.uint64(59)) | _interleave(arr[:, 0], arr[:, 1])
