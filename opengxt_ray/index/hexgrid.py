"""H3-style hexagonal cell index — pure numpy, deterministic.

Pointy-top hexagons in lon/lat degree space. Resolution ``res`` ∈
[0, 20] halves the circumradius each step (aperture 2 in linear size):

    size(res) = 45.0 / 2**res   (degrees, hex circumradius)

so res 9 ≈ 0.088° ≈ 9.8 km at the equator — comparable to H3 res 6.

Cell id layout (uint64): ``[5 bits res][29 bits q+OFF][29 bits r+OFF]``
with axial coordinates (q, r), OFF = 2**28. Pure integer math: the same
(lon, lat, res) maps to the same id on every node — a requirement for
co-partitioned shuffles (SURVEY.md §7.3).

The hex assignment math (width √3·s, 1.5·s row step) intentionally
matches the reference's hexagonal binning grid
(GT/pattern/HexagonalBinningVisitor.java:40-130) so bin outputs line up.
"""

from __future__ import annotations

import numpy as np

BASE_SIZE = 45.0
_OFF = 1 << 28
_MASK29 = (1 << 29) - 1
SQRT3 = np.sqrt(3.0)


def hex_size(res: int) -> float:
    """Hex circumradius in degrees at resolution res."""
    return BASE_SIZE / (1 << res)


def _pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (
        (np.uint64(res) << np.uint64(58))
        | ((q.astype(np.int64) + _OFF).astype(np.uint64) << np.uint64(29))
        | (r.astype(np.int64) + _OFF).astype(np.uint64)
    )


def _unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(58)).astype(np.int64)
    q = ((cell >> np.uint64(29)) & np.uint64(_MASK29)).astype(np.int64) - _OFF
    r = (cell & np.uint64(_MASK29)).astype(np.int64) - _OFF
    return res, q, r


def _axial_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-rounding of fractional axial coords (exact nearest center)."""
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_cell(lon, lat, res: int) -> np.ndarray:
    """Vectorized lon/lat → hex cell id (uint64) at resolution res."""
    s = hex_size(res)
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    qf = (SQRT3 / 3.0 * x - y / 3.0) / s
    rf = (2.0 / 3.0 * y) / s
    q, r = _axial_round(qf, rf)
    return _pack(res, q, r)


def hex_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id(s) → center lon/lat."""
    res, q, r = _unpack(cell)
    s = BASE_SIZE / (1 << res).astype(np.float64)
    x = s * SQRT3 * (q + r / 2.0)
    y = s * 1.5 * r
    return x, y


def hex_boundary(cell: int) -> np.ndarray:
    """Closed hexagon ring (7,2) for one cell (pointy-top)."""
    res, q, r = _unpack(np.asarray([cell], dtype=np.uint64))
    s = float(BASE_SIZE / (1 << res[0]))
    cx = s * SQRT3 * (q[0] + r[0] / 2.0)
    cy = s * 1.5 * r[0]
    ang = np.radians(np.arange(7) * 60.0 + 30.0)  # pointy-top: vertices at 30°+k·60°
    return np.column_stack([cx + s * np.cos(ang), cy + s * np.sin(ang)])


_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)


def hex_ring(cell: int, k: int) -> np.ndarray:
    """Cells at exactly hex-distance k (the k-th ring)."""
    if k == 0:
        return np.asarray([cell], dtype=np.uint64)
    res, q0, r0 = _unpack(np.asarray([cell], dtype=np.uint64))
    out_q, out_r = [], []
    q = q0[0] + _DIRS[4][0] * k
    r = r0[0] + _DIRS[4][1] * k
    for i in range(6):
        for _ in range(k):
            out_q.append(q)
            out_r.append(r)
            q += _DIRS[i][0]
            r += _DIRS[i][1]
    return _pack(int(res[0]), np.asarray(out_q), np.asarray(out_r))


def hex_disk(cell, k: int) -> np.ndarray:
    """All cells within hex-distance k of `cell` (vectorized over cells).

    Accepts a scalar or an array of cell ids; returns the unique union.
    Used for neighbor-ring expansion in nearest joins and hotspot
    neighbor sums (SURVEY.md §7.3).
    """
    cells = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    res, q, r = _unpack(cells)
    dq_list, dr_list = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            dq_list.append(dq)
            dr_list.append(dr)
    dq = np.asarray(dq_list, dtype=np.int64)
    dr = np.asarray(dr_list, dtype=np.int64)
    allq = (q[:, None] + dq[None, :]).ravel()
    allr = (r[:, None] + dr[None, :]).ravel()
    rr = np.repeat(res, len(dq))
    packed = (
        (rr.astype(np.uint64) << np.uint64(58))
        | ((allq + _OFF).astype(np.uint64) << np.uint64(29))
        | (allr + _OFF).astype(np.uint64)
    )
    return np.unique(packed)


def disk_per_row(cells: np.ndarray, k: int) -> np.ndarray:
    """(n,) cell ids → (n, m) matrix: the k-disk of each cell (m = number
    of cells in a k-disk, 3k²+3k+1). Used for halo replication."""
    cells = np.asarray(cells, dtype=np.uint64)
    res, q, r = _unpack(cells)
    dq_list, dr_list = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            dq_list.append(dq)
            dr_list.append(dr)
    dq = np.asarray(dq_list, dtype=np.int64)
    dr = np.asarray(dr_list, dtype=np.int64)
    allq = q[:, None] + dq[None, :]
    allr = r[:, None] + dr[None, :]
    rr = np.broadcast_to(res[:, None], allq.shape)
    return (
        (rr.astype(np.uint64) << np.uint64(58))
        | ((allq + _OFF).astype(np.uint64) << np.uint64(29))
        | (allr + _OFF).astype(np.uint64)
    )


def res_for_band(band: float, *, factor: float = 2.0) -> int:
    """Largest resolution whose hex circumradius ≥ factor·band — with
    factor 2 a 1-ring halo provably contains every neighbor within
    ``band`` (worst case: |pq| ≤ band ⇒ cell centers ≤ band+2s apart
    ≤ 2.5s < 2·√3·s ⇒ hex distance ≤ 1)."""
    res = int(np.floor(np.log2(BASE_SIZE / (factor * band)))) if band > 0 else 20
    return max(0, min(20, res))


def cover_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """Superset of cells whose hexes may intersect the bbox.

    Sweep axial rows; pad by one cell each side (hexes overhang their
    center row/col by up to one circumradius). A superset is safe for
    join candidate generation — refinement dedups.
    """
    s = hex_size(res)
    r_min = int(np.floor((2.0 / 3.0 * miny) / s)) - 1
    r_max = int(np.ceil((2.0 / 3.0 * maxy) / s)) + 1
    qs, rs = [], []
    for r in range(r_min, r_max + 1):
        # x = s*sqrt(3)*(q + r/2) → q = x/(s*sqrt3) - r/2
        q_min = int(np.floor(minx / (s * SQRT3) - r / 2.0)) - 1
        q_max = int(np.ceil(maxx / (s * SQRT3) - r / 2.0)) + 1
        qs.append(np.arange(q_min, q_max + 1, dtype=np.int64))
        rs.append(np.full(q_max - q_min + 1, r, dtype=np.int64))
    q = np.concatenate(qs)
    r = np.concatenate(rs)
    return _pack(res, q, r)


def cover_geom(fg, gi: int, res: int) -> np.ndarray:
    """Cells covering geometry gi of a FlatGeoms (bbox sweep + distance
    filter to the hex circumradius envelope). Superset-safe."""
    from ..core import geomops

    pts = fg.geom_coords(gi)
    if len(pts) == 0:
        return np.empty(0, dtype=np.uint64)
    cells = cover_bbox(
        float(pts[:, 0].min()), float(pts[:, 1].min()),
        float(pts[:, 0].max()), float(pts[:, 1].max()), res,
    )
    if len(cells) <= 16:
        return cells
    # filter: keep cells whose center is within circumradius of the geometry
    cx, cy = hex_center(cells)
    d = geomops.points_to_geom_dist(cx, cy, fg, gi)
    return cells[d <= 2.0 * hex_size(res)]
