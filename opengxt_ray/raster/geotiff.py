"""Minimal GeoTIFF reader — pure numpy + stdlib zlib.

Reads single-band striped or tiled TIFFs with no/DEFLATE compression
(uint8/16/32, int, float32/64) plus GeoTIFF georeferencing
(ModelPixelScale + ModelTiepoint) — enough to ingest the reference's
``sfdem.tif`` DEM fixture into the engine's tile-table model. TIFF 6.0
and the GeoTIFF spec are public; independent implementation.

Reference mapping: GT/storage (GeoTIFF via GeoTools gridcoverage
readers); our engine ingests rasters to Parquet tile tables — this
reader is for fixture ingestion / offline conversion.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .tiles import RasterMeta

_SAMPLE_DTYPES = {
    (1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
    (2, 8): np.int8, (2, 16): np.int16, (2, 32): np.int32,
    (3, 32): np.float32, (3, 64): np.float64,
}
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8, 17: 8}


def _read_tag_values(data, endian, typ, cnt, raw):
    size = _TYPE_SIZES.get(typ, 1) * cnt
    if size <= 4:
        buf = raw
    else:
        off = struct.unpack(endian + "I", raw)[0]
        buf = data[off : off + size]
    if typ == 3:
        return list(struct.unpack(endian + "H" * cnt, buf[: 2 * cnt]))
    if typ == 4:
        return list(struct.unpack(endian + "I" * cnt, buf[: 4 * cnt]))
    if typ == 12:
        return list(struct.unpack(endian + "d" * cnt, buf[: 8 * cnt]))
    if typ == 2:
        return buf[:cnt].split(b"\x00")[0].decode("latin-1")
    if typ == 11:
        return list(struct.unpack(endian + "f" * cnt, buf[: 4 * cnt]))
    return buf


def read_geotiff(path: str) -> tuple[np.ndarray, RasterMeta]:
    """→ (dense (H, W) float64 array with NaN nodata, RasterMeta)."""
    data = open(path, "rb").read()
    endian = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(endian + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a TIFF")
    ntags = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])[0]
    tags: dict = {}
    for i in range(ntags):
        e = data[ifd_off + 2 + i * 12 : ifd_off + 14 + i * 12]
        tag, typ, cnt = struct.unpack(endian + "HHI", e[:8])
        tags[tag] = _read_tag_values(data, endian, typ, cnt, e[8:12])
    width = tags[256][0]
    height = tags[257][0]
    bits = tags[258][0]
    comp = tags.get(259, [1])[0]
    sfmt = tags.get(339, [1])[0]
    dtype = _SAMPLE_DTYPES.get((sfmt, bits))
    if dtype is None:
        raise ValueError(f"unsupported sample format {sfmt}/{bits}")
    if comp not in (1, 8, 32946):
        raise ValueError(f"unsupported compression {comp} "
                         "(only none/DEFLATE)")
    dt = np.dtype(dtype).newbyteorder(endian)
    out = np.full((height, width), np.nan, dtype=np.float64)

    def _decode(buf):
        return zlib.decompress(buf) if comp in (8, 32946) else buf

    if 322 in tags:  # tiled
        tw = tags[322][0]
        th = tags[323][0]
        offs = tags[324]
        cnts = tags[325]
        tpr = (width + tw - 1) // tw
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            raw = _decode(data[o : o + c])
            arr = np.frombuffer(raw, dtype=dt,
                                count=tw * th).reshape(th, tw).astype(np.float64)
            ty, tx = divmod(ti, tpr)
            y0, x0 = ty * th, tx * tw
            h = min(th, height - y0)
            w = min(tw, width - x0)
            out[y0 : y0 + h, x0 : x0 + w] = arr[:h, :w]
    else:  # strips
        rps = tags.get(278, [height])[0]
        offs = tags[273]
        cnts = tags[279]
        for si, (o, c) in enumerate(zip(offs, cnts)):
            y0 = si * rps
            h = min(rps, height - y0)
            raw = _decode(data[o : o + c])
            arr = np.frombuffer(raw, dtype=dt, count=h * width).reshape(h, width)
            out[y0 : y0 + h] = arr.astype(np.float64)
    # nodata (GDAL tag 42113, ASCII)
    nod = tags.get(42113)
    if nod is not None:
        try:
            nv = float(str(nod).strip())
            out[out == nv] = np.nan
        except ValueError:
            pass
    # georeferencing
    scale = tags.get(33550, [1.0, 1.0, 0.0])
    tie = tags.get(33922, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    cell = float(scale[0])
    origin_x = float(tie[3]) - float(tie[0]) * cell
    origin_y = float(tie[4]) + float(tie[1]) * float(scale[1])
    meta = RasterMeta(origin_x, origin_y, cell, width, height, tile_size=256)
    return out, meta


def geotiff_to_tiles(path: str, *, tile_size: int = 256):
    """GeoTIFF → (tile Dataset, RasterMeta) in the engine model."""
    import ray

    dense, meta = read_geotiff(path)
    meta = RasterMeta(meta.origin_x, meta.origin_y, meta.cell_size,
                      meta.width, meta.height, tile_size)
    rows = []
    for ty in range(meta.tiles_y):
        for tx in range(meta.tiles_x):
            h, w = meta.tile_shape(tx, ty)
            tile = dense[ty * tile_size : ty * tile_size + h,
                         tx * tile_size : tx * tile_size + w]
            rows.append({"tx": tx, "ty": ty,
                         "data": np.ascontiguousarray(tile).tobytes()})
    t = pa.table({
        "tx": pa.array([r["tx"] for r in rows], pa.int32()),
        "ty": pa.array([r["ty"] for r in rows], pa.int32()),
        "data": pa.array([r["data"] for r in rows], pa.binary()),
    })
    return ray.data.from_arrow(t), meta


def write_geotiff(tiles, meta: RasterMeta, path: str, *,
                  dtype: str = "float32", nodata: float | None = None,
                  compress: bool = True):
    """Minimal GeoTIFF WRITER — single band, striped, optional DEFLATE
    (RasterExport: GT/RasterExportProcess; the reference writes via
    GeoTools' GeoTIFF writer, we emit TIFF 6.0 + GeoTIFF tags directly).

    NaN cells are written as ``nodata`` (default: NaN for float types,
    which GDAL and this module's reader both honor via tag 42113).
    Gathers the raster dense on the driver — the export path is for
    fixture-sized rasters; big rasters stay Parquet tile tables
    (SURVEY §2.1 interchange note)."""
    from .geometry import _gather_dense

    dense = _gather_dense(tiles, meta)
    dt = np.dtype({"float32": "<f4", "float64": "<f8"}[dtype])
    if nodata is None:
        nodata = float("nan")
    arr = np.where(np.isnan(dense), nodata, dense).astype(dt)

    rows_per_strip = max(1, min(meta.height, 8192 // max(meta.width, 1) + 1))
    strips = []
    for y0 in range(0, meta.height, rows_per_strip):
        raw = np.ascontiguousarray(
            arr[y0 : y0 + rows_per_strip]).tobytes()
        strips.append(zlib.compress(raw) if compress else raw)

    bits = dt.itemsize * 8
    nodata_ascii = (f"{nodata!r}" if nodata == nodata else "nan").encode() \
        + b"\x00"
    scale = struct.pack("<3d", meta.cell_size, meta.cell_size, 0.0)
    tie = struct.pack("<6d", 0.0, 0.0, 0.0, meta.origin_x, meta.origin_y, 0.0)

    # layout: header(8) | IFD | out-of-line tag data | strip data
    tags = []  # (tag, type, count, value_bytes_or_int, is_offset_data)

    def _short(v):
        return struct.pack("<HH", v, 0)

    def _long(v):
        return struct.pack("<I", v)

    ntags = 13
    ifd_off = 8
    ifd_size = 2 + ntags * 12 + 4
    extra_off = ifd_off + ifd_size
    extra = bytearray()

    def _extra(buf: bytes) -> int:
        off = extra_off + len(extra)
        extra.extend(buf)
        return off

    nstrips = len(strips)
    if nstrips == 1:
        strip_off_val = None   # patched after extra is final
        strip_cnt_val = _long(len(strips[0]))
        off_inline = True
    else:
        off_inline = False

    # out-of-line payloads first (offsets resolved as appended)
    scale_off = _extra(scale)
    tie_off = _extra(tie)
    nod_off = _extra(nodata_ascii) if len(nodata_ascii) > 4 else None
    if not off_inline:
        offs_pos = _extra(b"\x00" * 4 * nstrips)   # patched later
        cnts_off = _extra(struct.pack(f"<{nstrips}I",
                                      *[len(s) for s in strips]))
    data_off = extra_off + len(extra)
    strip_offsets = []
    p = data_off
    for s_ in strips:
        strip_offsets.append(p)
        p += len(s_)
    if not off_inline:
        extra[offs_pos - extra_off : offs_pos - extra_off + 4 * nstrips] = \
            struct.pack(f"<{nstrips}I", *strip_offsets)

    sample_format = 3  # IEEE float
    compression = 8 if compress else 1

    def T(tag, typ, cnt, val4):
        tags.append(struct.pack("<HHI", tag, typ, cnt) + val4)

    T(256, 4, 1, _long(meta.width))
    T(257, 4, 1, _long(meta.height))
    T(258, 3, 1, _short(bits))
    T(259, 3, 1, _short(compression))
    T(262, 3, 1, _short(1))                       # photometric
    if off_inline:
        T(273, 4, 1, _long(strip_offsets[0]))
    else:
        T(273, 4, nstrips, _long(offs_pos))
    T(277, 3, 1, _short(1))                       # samples/pixel
    T(278, 4, 1, _long(rows_per_strip))
    if off_inline:
        T(279, 4, 1, strip_cnt_val)
    else:
        T(279, 4, nstrips, _long(cnts_off))
    T(339, 3, 1, _short(sample_format))
    T(33550, 12, 3, _long(scale_off))             # ModelPixelScale
    T(33922, 12, 6, _long(tie_off))               # ModelTiepoint
    if nod_off is not None:
        T(42113, 2, len(nodata_ascii), _long(nod_off))
    else:
        T(42113, 2, len(nodata_ascii),
          nodata_ascii.ljust(4, b"\x00")[:4])
    tags.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    assert len(tags) == ntags, len(tags)

    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_off))
        f.write(struct.pack("<H", ntags))
        for t_ in tags:
            f.write(t_)
        f.write(struct.pack("<I", 0))             # next IFD
        f.write(bytes(extra))
        for s_ in strips:
            f.write(s_)
    return path
