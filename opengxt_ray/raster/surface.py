"""Focal surface derivatives — slope, aspect, hillshade, TPI/TRI/
roughness — 3×3 windows with 1-pixel halo exchange between tiles.

Reference: GT/gridcoverage/AbstractSurfaceOperation + RasterSlope/
Aspect/Hillshade Operations — Horn's method on the 3×3 window.

Execution (SURVEY.md §2.7 Surface row): each tile flat-maps itself plus
1-pixel edge strips addressed to its 8 neighbors; ``groupby(tile)``
assembles the padded (h+2, w+2) array; the derivative is then a pure
vectorized stencil. One shuffle, halo payload ≈ 4/tile_size of the
raster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .tiles import RasterMeta, _tile_key


def _emit_halo(batch: pa.Table, meta: RasterMeta) -> pa.Table:
    keys, kinds, blobs = [], [], []
    ts = meta.tile_size
    for tx, ty, blob in zip(batch["tx"].to_numpy(), batch["ty"].to_numpy(),
                            batch["data"]):
        h, w = meta.tile_shape(int(tx), int(ty))
        arr = np.frombuffer(blob.as_py(), dtype=np.float64).reshape(h, w)
        # own payload
        keys.append(int(_tile_key(np.asarray([tx]), np.asarray([ty]))[0]))
        kinds.append(4)  # center
        blobs.append(blob.as_py())
        # strips to 8 neighbors: kind encodes which side OF THE RECEIVER
        # the strip pads (0=NW,1=N,2=NE,3=W,5=E,6=SW,7=S,8=SE)
        neighbors = [
            (tx - 1, ty - 1, 8, arr[:1, :1]),    # NW neighbor ← my top-left px (its SE pad)
            (tx, ty - 1, 7, arr[:1, :]),         # N neighbor ← my top row (its S pad)
            (tx + 1, ty - 1, 6, arr[:1, -1:]),   # NE ← my top-right px (its SW pad)
            (tx - 1, ty, 5, arr[:, :1]),         # W ← my left col (its E pad)
            (tx + 1, ty, 3, arr[:, -1:]),        # E ← my right col (its W pad)
            (tx - 1, ty + 1, 2, arr[-1:, :1]),   # SW ← bottom-left (its NE pad)
            (tx, ty + 1, 1, arr[-1:, :]),        # S ← my bottom row (its N pad)
            (tx + 1, ty + 1, 0, arr[-1:, -1:]),  # SE ← bottom-right (its NW pad)
        ]
        for ntx, nty, kind, strip in neighbors:
            if 0 <= ntx < meta.tiles_x and 0 <= nty < meta.tiles_y:
                keys.append(int(_tile_key(np.asarray([ntx]), np.asarray([nty]))[0]))
                kinds.append(kind)
                blobs.append(np.ascontiguousarray(strip).tobytes())
    return pa.table({"tkey": pa.array(keys, pa.int64()),
                     "kind": pa.array(kinds, pa.int8()),
                     "data": pa.array(blobs, pa.binary())})


def _assemble_padded(group: pa.Table, meta: RasterMeta) -> tuple[int, int, np.ndarray]:
    k = int(group["tkey"][0].as_py())
    tx, ty = k >> 32, k & 0xFFFFFFFF
    h, w = meta.tile_shape(tx, ty)
    pad = np.full((h + 2, w + 2), np.nan)
    for kind, blob in zip(group["kind"].to_numpy(), group["data"]):
        arr = np.frombuffer(blob.as_py(), dtype=np.float64)
        if kind == 4:
            pad[1 : h + 1, 1 : w + 1] = arr.reshape(h, w)
        elif kind == 7:  # south pad (bottom edge): neighbor below sent its top row
            pad[h + 1, 1 : 1 + len(arr)] = arr
        elif kind == 1:  # north pad
            pad[0, 1 : 1 + len(arr)] = arr
        elif kind == 5:  # east pad
            pad[1 : 1 + len(arr), w + 1] = arr
        elif kind == 3:  # west pad
            pad[1 : 1 + len(arr), 0] = arr
        elif kind == 0:
            pad[0, 0] = arr[0]
        elif kind == 2:
            pad[0, w + 1] = arr[0]
        elif kind == 6:
            pad[h + 1, 0] = arr[0]
        elif kind == 8:
            pad[h + 1, w + 1] = arr[0]
    # replicate edges where no neighbor (reference edge handling)
    pad[0] = np.where(np.isnan(pad[0]), pad[1], pad[0])
    pad[-1] = np.where(np.isnan(pad[-1]), pad[-2], pad[-1])
    pad[:, 0] = np.where(np.isnan(pad[:, 0]), pad[:, 1], pad[:, 0])
    pad[:, -1] = np.where(np.isnan(pad[:, -1]), pad[:, -2], pad[:, -1])
    return tx, ty, pad


def _focal(tiles, meta: RasterMeta, stencil):
    halo = tiles.map_batches(lambda b: _emit_halo(b, meta),
                             batch_format="pyarrow")

    def _compute(group: pa.Table) -> pa.Table:
        tx, ty, pad = _assemble_padded(group, meta)
        out = stencil(pad, meta.cell_size)
        return pa.table({"tx": pa.array([tx], pa.int32()),
                         "ty": pa.array([ty], pa.int32()),
                         "data": pa.array([out.tobytes()], pa.binary())})

    from .tiles import RasterMeta as _RM  # noqa: F401 (doc)
    from ..core.util import default_shuffle_partitions

    return halo.groupby(
        "tkey", num_partitions=default_shuffle_partitions()).map_groups(
        _compute, batch_format="pyarrow")


def _horn_gradients(pad: np.ndarray, cell: float):
    z = pad
    a = z[:-2, :-2]; b = z[:-2, 1:-1]; c = z[:-2, 2:]
    d = z[1:-1, :-2];                 f = z[1:-1, 2:]
    g = z[2:, :-2];  h = z[2:, 1:-1]; i = z[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * cell)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * cell)
    return dzdx, dzdy


def slope(tiles, meta: RasterMeta, *, unit: str = "degrees"):
    def _s(pad, cell):
        dzdx, dzdy = _horn_gradients(pad, cell)
        rise = np.sqrt(dzdx ** 2 + dzdy ** 2)
        if unit == "percent":
            return rise * 100.0
        return np.degrees(np.arctan(rise))

    return _focal(tiles, meta, _s)


def aspect(tiles, meta: RasterMeta):
    def _a(pad, cell):
        dzdx, dzdy = _horn_gradients(pad, cell)
        asp = np.degrees(np.arctan2(dzdy, -dzdx))
        out = np.where(asp < 0, 90.0 - asp,
                       np.where(asp > 90.0, 360.0 - asp + 90.0, 90.0 - asp))
        flat = (dzdx == 0) & (dzdy == 0)
        return np.where(flat, -1.0, out)

    return _focal(tiles, meta, _a)


def hillshade(tiles, meta: RasterMeta, *, azimuth: float = 315.0,
              altitude: float = 45.0, z_factor: float = 1.0):
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)

    def _h(pad, cell):
        dzdx, dzdy = _horn_gradients(pad * z_factor, cell)
        slope_r = np.arctan(np.sqrt(dzdx ** 2 + dzdy ** 2))
        aspect_r = np.arctan2(dzdy, -dzdx)
        shade = (np.cos(alt) * np.cos(slope_r)
                 + np.sin(alt) * np.sin(slope_r) * np.cos(az - aspect_r))
        return np.clip(shade * 255.0, 0, 255)

    return _focal(tiles, meta, _h)


def tpi(tiles, meta: RasterMeta):
    """Topographic position index: center − mean(8 neighbors)."""

    def _t(pad, cell):
        z = pad
        nbrs = (z[:-2, :-2] + z[:-2, 1:-1] + z[:-2, 2:] + z[1:-1, :-2]
                + z[1:-1, 2:] + z[2:, :-2] + z[2:, 1:-1] + z[2:, 2:]) / 8.0
        return z[1:-1, 1:-1] - nbrs

    return _focal(tiles, meta, _t)


def tri(tiles, meta: RasterMeta):
    """Terrain ruggedness index: mean |center − neighbor|."""

    def _t(pad, cell):
        z = pad
        c = z[1:-1, 1:-1]
        acc = np.zeros_like(c)
        for sl in ((np.s_[:-2, :-2]), (np.s_[:-2, 1:-1]), (np.s_[:-2, 2:]),
                   (np.s_[1:-1, :-2]), (np.s_[1:-1, 2:]), (np.s_[2:, :-2]),
                   (np.s_[2:, 1:-1]), (np.s_[2:, 2:])):
            acc += np.abs(c - z[sl])
        return acc / 8.0

    return _focal(tiles, meta, _t)


def roughness(tiles, meta: RasterMeta):
    """max − min of the 3×3 window."""

    def _r(pad, cell):
        z = pad
        stack = np.stack([z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:], z[1:-1, :-2],
                          z[1:-1, 1:-1], z[1:-1, 2:], z[2:, :-2], z[2:, 1:-1],
                          z[2:, 2:]])
        return stack.max(axis=0) - stack.min(axis=0)

    return _focal(tiles, meta, _r)


def curvature(tiles, meta: RasterMeta):
    """Second-derivative curvature (Zevenbergen-Thorne style): −2(D+E)
    ·100 with D, E from the 3×3 quadratic fit."""

    def _c(pad, cell):
        z = pad
        L2 = cell * cell
        d = ((z[1:-1, :-2] + z[1:-1, 2:]) / 2.0 - z[1:-1, 1:-1]) / L2
        e = ((z[:-2, 1:-1] + z[2:, 1:-1]) / 2.0 - z[1:-1, 1:-1]) / L2
        return -2.0 * (d + e) * 100.0

    return _focal(tiles, meta, _c)


def flow_direction(tiles, meta: RasterMeta):
    """D8 flow direction (ESRI encoding 1,2,4,...,128 = E,SE,S,...,NE):
    steepest downslope neighbor."""

    def _f(pad, cell):
        z = pad
        c = z[1:-1, 1:-1]
        diag = cell * np.sqrt(2.0)
        drops = np.stack([
            (c - z[1:-1, 2:]) / cell,    # E   = 1
            (c - z[2:, 2:]) / diag,      # SE  = 2
            (c - z[2:, 1:-1]) / cell,    # S   = 4
            (c - z[2:, :-2]) / diag,     # SW  = 8
            (c - z[1:-1, :-2]) / cell,   # W   = 16
            (c - z[:-2, :-2]) / diag,    # NW  = 32
            (c - z[:-2, 1:-1]) / cell,   # N   = 64
            (c - z[:-2, 2:]) / diag,     # NE  = 128
        ])
        best = np.argmax(drops, axis=0)
        codes = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.float64)
        out = codes[best]
        return np.where(drops.max(axis=0) <= 0, 0.0, out)  # pits/flats → 0

    return _focal(tiles, meta, _f)


def surface_area(tiles, meta: RasterMeta):
    """Jenness-style 3D surface area per cell (triangulated to the 8
    neighbors), as a ratio-corrected cell area."""

    def _s(pad, cell):
        dzdx, dzdy = _horn_gradients(pad, cell)
        # area scale factor = sqrt(1 + |∇z|²)
        return cell * cell * np.sqrt(1.0 + dzdx ** 2 + dzdy ** 2)

    return _focal(tiles, meta, _s)
