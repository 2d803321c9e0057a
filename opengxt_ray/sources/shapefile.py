"""Minimal ESRI shapefile reader — pure numpy/stdlib.

Read-only support for Point / PolyLine / Polygon (+ M/Z variants'
XY part) and DBF attributes — enough to load the reference's bundled
unit-test fixtures (TEST/resources/.../test-data/*.shp, SURVEY.md §5)
so hotspot/area/join goldens run against the ACTUAL OpenGXT test
geometries. The ESRI shapefile format is public (ESRI Shapefile
Technical Description, 1998); this is an independent implementation.

Reference mapping: GT/storage/DataStoreFactory.java:64-90 (the
reference's shapefile store) — our engine's interchange is Parquet; this
reader exists for fixture ingestion and offline conversion.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..core import wkb as _wkb

SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_POINTZ = 11
SHP_POLYLINEZ = 13
SHP_POLYGONZ = 15
SHP_POINTM = 21
SHP_POLYLINEM = 23
SHP_POLYGONM = 25


def _read_shp(path: str) -> list[bytes | None]:
    """Parse .shp → list of WKB geometries (None for null shapes)."""
    with open(path, "rb") as f:
        data = f.read()
    if struct.unpack(">i", data[:4])[0] != 9994:
        raise ValueError("not a shapefile")
    file_len = struct.unpack(">i", data[24:28])[0] * 2
    out: list[bytes | None] = []
    pos = 100
    while pos < file_len:
        _, content_len = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        rec = data[pos : pos + content_len * 2]
        pos += content_len * 2
        stype = struct.unpack("<i", rec[:4])[0]
        base = stype % 10 if stype else 0
        if stype == 0:
            out.append(None)
        elif base == SHP_POINT % 10 and stype in (SHP_POINT, SHP_POINTZ,
                                                  SHP_POINTM):
            x, y = struct.unpack("<2d", rec[4:20])
            out.append(_wkb.encode_point(x, y))
        elif stype in (SHP_POLYLINE, SHP_POLYLINEZ, SHP_POLYLINEM,
                       SHP_POLYGON, SHP_POLYGONZ, SHP_POLYGONM):
            nparts, npoints = struct.unpack("<2i", rec[36:44])
            parts = np.frombuffer(rec, dtype="<i4", count=nparts, offset=44)
            pts = np.frombuffer(rec, dtype="<f8", count=npoints * 2,
                                offset=44 + 4 * nparts).reshape(npoints, 2)
            bounds = list(parts) + [npoints]
            rings = [pts[bounds[i] : bounds[i + 1]].copy()
                     for i in range(nparts)]
            if stype in (SHP_POLYLINE, SHP_POLYLINEZ, SHP_POLYLINEM):
                out.append(_wkb.encode_linestring(rings[0]) if nparts == 1
                           else _wkb.encode_multilinestring(rings))
            else:
                # shapefile polygons: outer rings CW, holes CCW; group
                # holes under the preceding outer ring (ESRI convention:
                # any hole belongs to the ring that contains it; the
                # common fixture case has them interleaved outer→holes)
                shells: list = []
                cur = None
                for r in rings:
                    x, y = r[:, 0], r[:, 1]
                    signed = 0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
                    if signed <= 0:  # CW = outer
                        if cur:
                            shells.append(cur)
                        cur = (r, [])
                    else:
                        if cur is None:
                            cur = (r, [])
                        else:
                            cur[1].append(r)
                if cur:
                    shells.append(cur)
                out.append(_wkb.encode_polygon(shells[0][0], shells[0][1])
                           if len(shells) == 1
                           else _wkb.encode_multipolygon(shells))
        else:
            raise ValueError(f"unsupported shape type {stype}")
    return out


def _read_dbf(path: str) -> pa.Table:
    """Parse .dbf (dBASE III) attributes."""
    with open(path, "rb") as f:
        data = f.read()
    nrec = struct.unpack("<i", data[4:8])[0]
    header_len, rec_len = struct.unpack("<2h", data[8:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fdec = data[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    cols: dict[str, list] = {n: [] for n, *_ in fields}
    pos = header_len
    for _ in range(nrec):
        rec = data[pos : pos + rec_len]
        pos += rec_len
        if rec[:1] == b"*":  # deleted
            continue
        off = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off : off + flen]
            off += flen
            s = raw.decode("latin-1").strip()
            if ftype == "N" or ftype == "F":
                if not s:
                    cols[name].append(None)
                elif fdec or ("." in s):
                    cols[name].append(float(s))
                else:
                    cols[name].append(int(s))
            elif ftype == "L":
                cols[name].append(s.upper() in ("T", "Y"))
            else:
                cols[name].append(s)
    return pa.table({n: pa.array(v) for n, v in cols.items()})


def read_shapefile_table(path: str) -> pa.Table:
    """.shp (+.dbf) → Arrow table with a WKB ``geom`` column."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    geoms = _read_shp(base + ".shp")
    try:
        attrs = _read_dbf(base + ".dbf")
    except FileNotFoundError:
        attrs = pa.table({})
    cols = {"geom": pa.array(geoms, pa.binary())}
    for name in attrs.column_names:
        cols[name] = attrs[name]
    return pa.table(cols)


def read_shapefile(path: str):
    """Shapefile → Dataset (driver parse; convert to parquet at scale)."""
    import ray

    return ray.data.from_arrow(read_shapefile_table(path))


# ---------------------------------------------------------------------------
# Writer (ShapeExport)
# ---------------------------------------------------------------------------

def _shp_record(fg, i) -> tuple[int, bytes]:
    """FlatGeoms geometry i → (shape_type, shp record content)."""
    t = int(fg.types[i])
    if t == _wkb.POINT:
        pts = fg.geom_coords(i)
        if len(pts) == 1:
            return SHP_POINT, struct.pack("<i2d", SHP_POINT,
                                          float(pts[0, 0]), float(pts[0, 1]))
        # MultiPoint (shape type 8)
        body = struct.pack("<i4d", 8,
                           float(pts[:, 0].min()), float(pts[:, 1].min()),
                           float(pts[:, 0].max()), float(pts[:, 1].max()))
        body += struct.pack("<i", len(pts))
        body += np.ascontiguousarray(pts, dtype="<f8").tobytes()
        return 8, body
    rings = [r for r, _ in fg.rings(i)]
    if t == _wkb.LINESTRING:
        stype = SHP_POLYLINE
    else:
        stype = SHP_POLYGON
        # ESRI convention: outer rings CW, holes CCW
        fixed = []
        for r, is_shell in fg.rings(i):
            area = 0.0
            for j in range(len(r) - 1):
                area += r[j, 0] * r[j + 1, 1] - r[j + 1, 0] * r[j, 1]
            cw = area < 0
            if is_shell != cw:
                r = r[::-1]
            fixed.append(r)
        rings = fixed
    allp = np.vstack(rings)
    body = struct.pack("<i4d", stype,
                       float(allp[:, 0].min()), float(allp[:, 1].min()),
                       float(allp[:, 0].max()), float(allp[:, 1].max()))
    body += struct.pack("<2i", len(rings), len(allp))
    off = 0
    for r in rings:
        body += struct.pack("<i", off)
        off += len(r)
    body += np.ascontiguousarray(allp, dtype="<f8").tobytes()
    return stype, body


def _dbf_write(table: pa.Table, path: str):
    """Write attributes as dBASE III (C strings, N numerics)."""
    import datetime

    names = [n for n in table.column_names if n != "geom"]
    specs = []
    texts: dict[str, list[str]] = {}
    for n in names:
        col = table[n]
        vals = col.to_pylist()
        if pa.types.is_floating(col.type):
            strs = ["" if v is None else f"{v:.6f}" for v in vals]
            flen = max(max((len(s) for s in strs), default=1), 1)
            specs.append((n[:10], "N", min(flen, 30), 6))
        elif pa.types.is_integer(col.type):
            strs = ["" if v is None else str(v) for v in vals]
            flen = max(max((len(s) for s in strs), default=1), 1)
            specs.append((n[:10], "N", min(flen, 18), 0))
        elif pa.types.is_boolean(col.type):
            strs = ["" if v is None else ("T" if v else "F") for v in vals]
            specs.append((n[:10], "L", 1, 0))
        else:
            strs = ["" if v is None else str(v) for v in vals]
            flen = max(max((len(s) for s in strs), default=1), 1)
            specs.append((n[:10], "C", min(flen, 254), 0))
        texts[n] = strs
    rec_len = 1 + sum(f for _, _, f, _ in specs)
    header_len = 32 + 32 * len(specs) + 1
    n_rec = table.num_rows
    today = datetime.date(2026, 1, 1)  # fixed: deterministic output
    out = bytearray()
    out += struct.pack("<4Bi2h20x", 3, today.year - 1900, today.month,
                       today.day, n_rec, header_len, rec_len)
    for name, ftype, flen, fdec in specs:
        out += name.encode("ascii").ljust(11, b"\x00")
        out += ftype.encode("ascii")
        out += b"\x00" * 4
        out += bytes([flen, fdec])
        out += b"\x00" * 14
    out += b"\x0D"
    for ri in range(n_rec):
        out += b" "
        for (name, ftype, flen, fdec), n in zip(specs, names):
            s = texts[n][ri][:flen]
            if ftype == "N":
                out += s.rjust(flen).encode("latin-1")
            else:
                out += s.ljust(flen).encode("latin-1")
    out += b"\x1A"
    open(path, "wb").write(bytes(out))


def write_shapefile(table: pa.Table, path: str, *, geom_col: str = "geom"):
    """ShapeExport (GT/ShapeExportProcess) — write .shp/.shx/.dbf from a
    feature table (Point/MultiPoint/PolyLine/Polygon; ESRI ring
    orientation applied). Minimal, deterministic, round-trips through
    this module's reader."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    fg = _wkb.decode(table[geom_col].to_pylist())
    records = [_shp_record(fg, i) for i in range(len(fg))]
    stype = records[0][0] if records else SHP_POINT
    contents = bytearray()
    shx = bytearray()
    offset_words = 50
    for idx, (st, body) in enumerate(records):
        clen_words = len(body) // 2
        contents += struct.pack(">2i", idx + 1, clen_words)
        contents += body
        shx += struct.pack(">2i", offset_words, clen_words)
        offset_words += 4 + clen_words
    allb = []
    for i in range(len(fg)):
        pts = fg.geom_coords(i)
        if len(pts):
            allb.append([pts[:, 0].min(), pts[:, 1].min(),
                         pts[:, 0].max(), pts[:, 1].max()])
    bb = (np.array(allb) if allb else np.zeros((1, 4)))
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    for payload, fname in ((contents, base + ".shp"), (shx, base + ".shx")):
        flen_words = (100 + len(payload)) // 2
        hdr = header + struct.pack(">i", flen_words)
        hdr += struct.pack("<2i", 1000, stype)
        hdr += struct.pack("<4d", float(bb[:, 0].min()), float(bb[:, 1].min()),
                           float(bb[:, 2].max()), float(bb[:, 3].max()))
        hdr += struct.pack("<4d", 0, 0, 0, 0)
        open(fname, "wb").write(hdr + bytes(payload))
    _dbf_write(table, base + ".dbf")
    return base + ".shp"
