"""WKB geometry codec — pure numpy, no shapely/GEOS.

The engine's geometry column convention (SURVEY.md §1.2): geometry is a
``binary`` Arrow column holding little-endian ISO WKB; the CRS and the
geometry column name live in ``Schema.metadata``. This module provides

- fully vectorized encode/decode for Point columns (the hot path — the
  primary input is geocoded pages, i.e. points), and
- a flat-array decode for LineString/Polygon/Multi* columns:
  ``coords (M,2) float64`` + offset arrays, the layout every numpy
  kernel in :mod:`opengxt_ray.core.geomops` consumes.

Reference data model: GeoTools ``SimpleFeatureCollection`` rows carry a
JTS geometry attribute (GT/core/FeatureTypes.java:61-84); we replace the
JVM object graph with Arrow binary + flat coordinate arrays.
"""

from __future__ import annotations

import struct

import numpy as np

# WKB geometry type codes (ISO, 2-D)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

_POINT_WKB_LEN = 21  # 1 (byteorder) + 4 (type) + 16 (x, y)

_TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}


# ---------------------------------------------------------------------------
# Point columns — vectorized
# ---------------------------------------------------------------------------

def encode_points(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Encode parallel x/y arrays into an object array of WKB Point bytes.

    Vectorized: builds one (n, 21) uint8 matrix, then splits. Returns a
    numpy object array suitable for ``pa.array(..., type=pa.binary())``.
    """
    n = len(x)
    buf = np.empty((n, _POINT_WKB_LEN), dtype=np.uint8)
    buf[:, 0] = 1  # little-endian
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", POINT), dtype=np.uint8)
    buf[:, 5:13] = np.asarray(x, dtype="<f8").reshape(n, 1).view(np.uint8)
    buf[:, 13:21] = np.asarray(y, dtype="<f8").reshape(n, 1).view(np.uint8)
    raw = buf.tobytes()
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = raw[i * _POINT_WKB_LEN : (i + 1) * _POINT_WKB_LEN]
    return out


def encode_points_arrow(x: np.ndarray, y: np.ndarray):
    """Encode x/y straight into a ``pyarrow.BinaryArray`` of WKB Points
    — zero per-row Python objects (one buffer build + offsets), the hot
    path for geocode stages at scale."""
    import pyarrow as pa

    n = len(x)
    buf = np.empty((n, _POINT_WKB_LEN), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", POINT), dtype=np.uint8)
    buf[:, 5:13] = np.asarray(x, dtype="<f8").reshape(n, 1).view(np.uint8)
    buf[:, 13:21] = np.asarray(y, dtype="<f8").reshape(n, 1).view(np.uint8)
    offsets = np.arange(0, (n + 1) * _POINT_WKB_LEN, _POINT_WKB_LEN,
                        dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())])


def decode_points(wkb: "np.ndarray | list") -> tuple[np.ndarray, np.ndarray]:
    """Decode a column of WKB Points → (x, y) float64 arrays.

    Fast path: every buffer is exactly 21 bytes (plain 2-D points) →
    one ``frombuffer`` + reshape. Falls back to centroid-of-anything for
    mixed geometry columns.
    """
    n = len(wkb)
    if n == 0:
        return np.empty(0), np.empty(0)
    first = wkb[0]
    if isinstance(first, (bytes, bytearray)) and all(
        len(b) == _POINT_WKB_LEN for b in wkb
    ):
        flat = np.frombuffer(b"".join(wkb), dtype=np.uint8).reshape(n, _POINT_WKB_LEN)
        x = flat[:, 5:13].copy().view("<f8").ravel()
        y = flat[:, 13:21].copy().view("<f8").ravel()
        return x, y
    # mixed geometries: centroids
    from .geomops import centroids

    return centroids(wkb)


# ---------------------------------------------------------------------------
# Generic geometries — flat-array decode
# ---------------------------------------------------------------------------

class FlatGeoms:
    """A column of geometries decoded to flat numpy arrays.

    Layout (all int64 offsets, CSR-style):

    - ``coords``: (M, 2) float64 — every vertex of every geometry
    - ``ring_offsets``: (R+1,) — vertex span of each ring/linestring part
    - ``part_offsets``: (G+1,) — ring span of each geometry
    - ``types``: (G,) uint8 — base WKB type per geometry (multi collapsed
      to base, multiplicity captured by part/ring structure)
    - ``num_interior``: for polygons, rings after the first of each
      polygon shell group are holes. We track shell boundaries in
      ``shell_flags``: (R,) bool, True where ring r starts a new shell.
    """

    __slots__ = ("coords", "ring_offsets", "part_offsets", "types", "shell_flags")

    def __init__(self, coords, ring_offsets, part_offsets, types, shell_flags):
        self.coords = coords
        self.ring_offsets = ring_offsets
        self.part_offsets = part_offsets
        self.types = types
        self.shell_flags = shell_flags

    def __len__(self) -> int:
        return len(self.types)

    def geom_coords(self, i: int) -> np.ndarray:
        """All vertices of geometry i as an (m, 2) view."""
        r0, r1 = self.part_offsets[i], self.part_offsets[i + 1]
        c0 = self.ring_offsets[r0]
        c1 = self.ring_offsets[r1]
        return self.coords[c0:c1]

    def rings(self, i: int):
        """Yield (ring_coords (m,2), is_shell) for geometry i."""
        r0, r1 = self.part_offsets[i], self.part_offsets[i + 1]
        for r in range(r0, r1):
            c0, c1 = self.ring_offsets[r], self.ring_offsets[r + 1]
            yield self.coords[c0:c1], bool(self.shell_flags[r])

    def bboxes(self) -> np.ndarray:
        """(G, 4) array of [minx, miny, maxx, maxy] per geometry."""
        g = len(self)
        out = np.empty((g, 4), dtype=np.float64)
        po, ro, co = self.part_offsets, self.ring_offsets, self.coords
        for i in range(g):
            c0 = ro[po[i]]
            c1 = ro[po[i + 1]]
            if c1 > c0:
                seg = co[c0:c1]
                out[i, 0] = seg[:, 0].min()
                out[i, 1] = seg[:, 1].min()
                out[i, 2] = seg[:, 0].max()
                out[i, 3] = seg[:, 1].max()
            else:
                out[i] = np.nan
        return out


def _read_u32(buf: memoryview, off: int, little: bool) -> int:
    return int.from_bytes(buf[off : off + 4], "little" if little else "big")


def _decode_one(buf: bytes, coords: list, ring_offsets: list, shell_flags: list):
    """Decode a single WKB geometry; append to flat accumulators.

    Returns (base_type, n_rings_appended).
    """
    mv = memoryview(buf)
    pos = 0

    def _type_dims(raw: int) -> tuple[int, int]:
        """WKB type word → (base type, coordinate dims). Handles plain
        2-D, EWKB Z/M flags and ISO 100x/200x/300x types (Z/M stripped
        on decode — the engine's geometry model is XY)."""
        dims = 2
        if raw & 0x80000000:
            dims += 1
        if raw & 0x40000000:
            dims += 1
        raw &= 0x3FFFFFFF
        if raw >= 1000:
            k = raw // 1000
            dims = 4 if k == 3 else 3
            raw = raw % 1000
        return raw, dims

    def parse(pos: int):
        little = mv[pos] == 1
        gtype, dims = _type_dims(_read_u32(mv, pos + 1, little))
        pos += 5
        dt = "<f8" if little else ">f8"
        stride = 8 * dims
        if gtype == POINT:
            xy = np.frombuffer(mv[pos : pos + stride],
                               dtype=dt).astype(np.float64)
            coords.append(xy[:2].reshape(1, 2))
            ring_offsets.append(1)
            shell_flags.append(True)
            return POINT, 1, pos + stride
        if gtype == LINESTRING:
            npts = _read_u32(mv, pos, little)
            pos += 4
            arr = np.frombuffer(mv[pos : pos + stride * npts],
                                dtype=dt).astype(np.float64)
            coords.append(arr.reshape(npts, dims)[:, :2])
            ring_offsets.append(npts)
            shell_flags.append(True)
            return LINESTRING, 1, pos + stride * npts
        if gtype == POLYGON:
            nrings = _read_u32(mv, pos, little)
            pos += 4
            for r in range(nrings):
                npts = _read_u32(mv, pos, little)
                pos += 4
                arr = np.frombuffer(mv[pos : pos + stride * npts],
                                    dtype=dt).astype(np.float64)
                coords.append(arr.reshape(npts, dims)[:, :2])
                ring_offsets.append(npts)
                shell_flags.append(r == 0)
                pos += stride * npts
            return POLYGON, nrings, pos
        if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            nparts = _read_u32(mv, pos, little)
            pos += 4
            base = POINT
            total = 0
            for _ in range(nparts):
                base, nr, pos = parse(pos)
                total += nr
            return base, total, pos
        raise ValueError(f"unsupported WKB type {gtype}")

    base, nrings, _ = parse(pos)
    return base, nrings


def decode(wkb_column) -> FlatGeoms:
    """Decode a WKB binary column (iterable of bytes) to FlatGeoms."""
    coords: list = []
    ring_counts: list = []
    shell_flags: list = []
    part_offsets = [0]
    types = []
    for buf in wkb_column:
        if buf is None:
            types.append(0)
            part_offsets.append(len(ring_counts))
            continue
        base, nrings = _decode_one(bytes(buf), coords, ring_counts, shell_flags)
        types.append(base)
        part_offsets.append(len(ring_counts))
    if coords:
        allc = np.concatenate(coords, axis=0)
    else:
        allc = np.empty((0, 2), dtype=np.float64)
    ring_offsets = np.zeros(len(ring_counts) + 1, dtype=np.int64)
    np.cumsum(ring_counts, out=ring_offsets[1:])
    return FlatGeoms(
        allc,
        ring_offsets,
        np.asarray(part_offsets, dtype=np.int64),
        np.asarray(types, dtype=np.uint8),
        np.asarray(shell_flags, dtype=bool),
    )


# ---------------------------------------------------------------------------
# Generic encode (per-geometry; used for small/derived geometry outputs)
# ---------------------------------------------------------------------------

def _hdr(gtype: int) -> bytes:
    return b"\x01" + struct.pack("<I", gtype)


def encode_point(x: float, y: float) -> bytes:
    return _hdr(POINT) + struct.pack("<2d", x, y)


def encode_linestring(coords: np.ndarray) -> bytes:
    coords = np.ascontiguousarray(coords, dtype="<f8")
    return _hdr(LINESTRING) + struct.pack("<I", len(coords)) + coords.tobytes()


def encode_polygon(shell: np.ndarray, holes: list | None = None) -> bytes:
    """Encode a polygon; rings are auto-closed if needed."""
    rings = [shell] + list(holes or [])
    out = [_hdr(POLYGON), struct.pack("<I", len(rings))]
    for r in rings:
        r = np.ascontiguousarray(r, dtype="<f8")
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)))
        out.append(r.tobytes())
    return b"".join(out)


def encode_multipolygon(polys: list) -> bytes:
    """polys: list of (shell, holes) tuples."""
    out = [_hdr(MULTIPOLYGON), struct.pack("<I", len(polys))]
    for shell, holes in polys:
        out.append(encode_polygon(shell, holes))
    return b"".join(out)


def encode_multilinestring(lines: list) -> bytes:
    out = [_hdr(MULTILINESTRING), struct.pack("<I", len(lines))]
    for ln in lines:
        out.append(encode_linestring(ln))
    return b"".join(out)


def encode_multipoint(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    out = [_hdr(MULTIPOINT), struct.pack("<I", len(coords))]
    for x, y in coords:
        out.append(encode_point(float(x), float(y)))
    return b"".join(out)


def geom_type_name(code: int) -> str:
    return _TYPE_NAMES.get(int(code), "Unknown")


def encode_z(fg: "FlatGeoms", i: int, z: float = 0.0) -> bytes:
    """Re-encode geometry i as ISO WKB Z (100x types) with a constant
    z — the ForceDimensionProcess 2D→3D conversion."""
    t = int(fg.types[i])
    rings = list(fg.rings(i))

    def _pts(arr):
        out = np.empty((len(arr), 3))
        out[:, :2] = arr
        out[:, 2] = z
        return out.astype("<f8").tobytes()

    if t == POINT:
        pts = fg.geom_coords(i)
        if len(pts) == 1:
            return (b"\x01" + struct.pack("<I", 1001)
                    + _pts(pts[:1]))
        body = b"".join(b"\x01" + struct.pack("<I", 1001) + _pts(pts[j:j + 1])
                        for j in range(len(pts)))
        return (b"\x01" + struct.pack("<I", 1004)
                + struct.pack("<I", len(pts)) + body)
    if t == LINESTRING:
        parts = [r for r, _ in rings]
        bodies = [b"\x01" + struct.pack("<I", 1002)
                  + struct.pack("<I", len(r)) + _pts(r) for r in parts]
        if len(bodies) == 1:
            return bodies[0]
        return (b"\x01" + struct.pack("<I", 1005)
                + struct.pack("<I", len(bodies)) + b"".join(bodies))
    # polygon(s)
    polys = []
    for r, is_shell in rings:
        if is_shell:
            polys.append([r])
        elif polys:
            polys[-1].append(r)
    bodies = []
    for rs in polys:
        b = (b"\x01" + struct.pack("<I", 1003)
             + struct.pack("<I", len(rs)))
        for r in rs:
            b += struct.pack("<I", len(r)) + _pts(r)
        bodies.append(b)
    if len(bodies) == 1:
        return bodies[0]
    return (b"\x01" + struct.pack("<I", 1006)
            + struct.pack("<I", len(bodies)) + b"".join(bodies))


def reencode_2d(fg: "FlatGeoms", i: int) -> bytes:
    """Re-encode geometry i as plain 2-D WKB (ForceDimension 3D→2D —
    decode already strips Z, this writes the XY form back out)."""
    t = int(fg.types[i])
    rings = list(fg.rings(i))
    if t == POINT:
        pts = fg.geom_coords(i)
        if len(pts) == 1:
            return encode_point(float(pts[0, 0]), float(pts[0, 1]))
        return encode_multipoint(pts)
    if t == LINESTRING:
        parts = [r for r, _ in rings]
        return (encode_linestring(parts[0]) if len(parts) == 1
                else encode_multilinestring(parts))
    polys = []
    for r, is_shell in rings:
        if is_shell:
            polys.append((r, []))
        elif polys:
            polys[-1][1].append(r)
    return (encode_polygon(polys[0][0], polys[0][1]) if len(polys) == 1
            else encode_multipolygon(polys))
