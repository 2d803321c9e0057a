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
