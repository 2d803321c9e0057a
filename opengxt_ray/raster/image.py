"""RasterToImage / MapToImage — render a tiled raster or a feature
layer to a PNG.

Reference: GT/RasterToImageProcess.java:56-140 (coverage + bbox +
width/height + style/transparent/bgColor → image) and
GT/MapToImageProcess.java (feature layer render). The reference
delegates to the GeoTools streaming renderer with SLD styles; this
implementation renders with a color ramp over the value grid — the
data path (bbox windowing, nearest-neighbour resampling to the
requested width×height, min/max stretch, nodata transparency,
background color) is the same. SLD cartography (per-rule symbolizers,
labels) is out of scope — documented envelope.

PNG encoding is pure stdlib (zlib/struct, 8-bit RGBA, filter 0) — no
imaging library exists in this environment and none is needed for a
correct PNG byte stream.

Scale: the output is bounded by width×height pixels regardless of
raster size. Tiles map their covered output pixels independently
(``map_batches``; each output pixel samples exactly one source cell,
so partials are disjoint) and only (pixel, value) pairs for the ≤W×H
window cross the wire to the final assembly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .tiles import RasterMeta, raster_statistics


# ---------------------------------------------------------------------------
# PNG codec (encode + a decode used by tests)
# ---------------------------------------------------------------------------

def encode_png(rgba: np.ndarray) -> bytes:
    """(H, W, 4) uint8 → PNG bytes (8-bit RGBA, no interlace)."""
    if rgba.dtype != np.uint8 or rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("encode_png expects (H, W, 4) uint8")
    h, w = rgba.shape[:2]
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def decode_png_any(data: bytes) -> np.ndarray:
    """Full baseline PNG decoder — stdlib ``zlib``/``struct`` only.

    Supports bit depths 8 and 16 with all five scanline filters
    (None/Sub/Up/Average/Paeth — filtering operates on BYTES per the
    spec, so the same unfilter covers both depths), all five color
    types (grayscale, RGB, palette, gray+alpha, RGBA), and Adam7
    interlacing (seven independently filtered sub-images scattered
    back on the pass lattice). Returns ``(H, W)`` / ``(H, W, C)``
    uint8, or uint16 for 16-bit files (big-endian samples per spec). This is the real
    decode path behind ``textops.multimodal.ImageFeatureExtractor``
    (de-stubs the round-3 media-decode envelope for PNG payloads).
    """
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG byte stream")
    pos = 8
    w = h = depth = ctype = interlace = None
    idat = []
    plte = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13])
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} (8 or 16)")
    if depth == 16 and ctype == 3:
        raise ValueError("palette PNG cannot be 16-bit")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    bpp = channels * (depth // 8)
    stride = w * bpp
    if not interlace:
        out, _ = _png_unfilter(raw, 0, h, stride, bpp)
    else:  # Adam7: seven independently-filtered sub-images
        out = np.zeros((h, stride), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            sub, pos = _png_unfilter(raw, pos, ph, pw * bpp, bpp)
            cols = (x0 + dx * np.arange(pw)) * bpp
            byte_idx = (cols[:, None] + np.arange(bpp)[None, :]).ravel()
            out[y0::dy][:ph][:, byte_idx] = sub
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[out.reshape(h, w)]
    if depth == 16:
        px16 = out.reshape(h, -1).view(">u2").astype(np.uint16)
        return px16.reshape(h, w) if channels == 1 \
            else px16.reshape(h, w, channels)
    if channels == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, channels)


def _png_unfilter(raw: bytes, pos: int, h: int, stride: int,
                  bpp: int) -> tuple[np.ndarray, int]:
    """Unfilter ``h`` scanlines of ``stride`` bytes starting at byte
    ``pos`` of the decompressed stream → ((h, stride) uint8, new pos).
    Filters are byte-oriented per spec (depth 16 uses bpp =
    channels·2)."""
    need = h * (stride + 1)
    if len(raw) - pos < need:
        raise ValueError("truncated PNG pixel data")
    rows = np.frombuffer(raw, np.uint8, count=need,
                         offset=pos).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = rows[y, 1:]
        ft = int(ftypes[y])
        if ft == 0:  # None
            cur = line.copy()
        elif ft == 1:  # Sub — prefix sum per channel column (mod 256)
            cur = line.copy()
            for c in range(bpp):
                cur[c::bpp] = np.cumsum(cur[c::bpp],
                                        dtype=np.uint64).astype(np.uint8)
        elif ft == 2:  # Up
            cur = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ft == 3:  # Average — sequential in x, vectorized over bpp
            cur = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(0, stride, bpp):
                seg = (line[x:x + bpp]
                       + ((left + prev[x:x + bpp]) >> 1)).astype(np.uint8)
                cur[x:x + bpp] = seg
                left = seg.astype(np.uint16)
        elif ft == 4:  # Paeth — sequential in x, vectorized over bpp
            cur = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.int16)
            ul = np.zeros(bpp, dtype=np.int16)
            for x in range(0, stride, bpp):
                up = prev[x:x + bpp].astype(np.int16)
                p = left + up - ul
                pa_ = np.abs(p - left)
                pb_ = np.abs(p - up)
                pc_ = np.abs(p - ul)
                pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                                np.where(pb_ <= pc_, up, ul))
                seg = (line[x:x + bpp].astype(np.int16) + pred).astype(
                    np.uint8)
                cur[x:x + bpp] = seg
                left = seg.astype(np.int16)
                ul = up
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur
        prev = cur
    return out, pos + need


def png_to_gray(img: np.ndarray) -> np.ndarray:
    """Decoded PNG array → (H, W) uint8 luma (ITU-R 601 weights for
    color; alpha ignored; 16-bit samples take their high byte)."""
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    if img.ndim == 2:
        return img
    c = img.shape[2]
    if c == 2:  # gray + alpha
        return img[..., 0]
    rgb = img[..., :3].astype(np.float64)
    return np.clip(np.round(rgb @ np.array([0.299, 0.587, 0.114])),
                   0, 255).astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Minimal reader for PNGs produced by :func:`encode_png`
    (filter-0 RGBA only) — the round-trip oracle."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 6
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 4 + 1
    rows = []
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        assert line[0] == 0, "only filter 0 supported"
        rows.append(np.frombuffer(line[1:], dtype=np.uint8))
    return np.stack(rows).reshape(h, w, 4)


# ---------------------------------------------------------------------------
# color ramps
# ---------------------------------------------------------------------------

def _ramp_table(name: str) -> np.ndarray:
    """(256, 3) uint8 lookup. 'gray' and a blue→green→yellow→red
    'heat' ramp (piecewise linear, public-knowledge stops)."""
    t = np.linspace(0.0, 1.0, 256)
    if name == "gray":
        g = np.round(t * 255).astype(np.uint8)
        return np.stack([g, g, g], axis=1)
    if name == "heat":
        stops = np.array([[0, 0, 255], [0, 255, 255], [0, 255, 0],
                          [255, 255, 0], [255, 0, 0]], dtype=np.float64)
        pos = np.linspace(0, 1, len(stops))
        out = np.stack([np.interp(t, pos, stops[:, c]) for c in range(3)],
                       axis=1)
        return np.round(out).astype(np.uint8)
    raise ValueError(f"unknown ramp {name!r} (gray, heat)")


def colorize(grid: np.ndarray, *, ramp: str = "heat",
             vmin: float | None = None, vmax: float | None = None,
             transparent: bool = True,
             bg_color: tuple = (255, 255, 255)) -> np.ndarray:
    """float grid (NaN = nodata) → (H, W, 4) uint8 via min/max stretch."""
    valid = ~np.isnan(grid)
    if vmin is None:
        vmin = float(grid[valid].min()) if valid.any() else 0.0
    if vmax is None:
        vmax = float(grid[valid].max()) if valid.any() else 1.0
    span = vmax - vmin if vmax > vmin else 1.0
    idx = np.clip((grid - vmin) / span, 0.0, 1.0)
    idx = np.where(valid, idx, 0.0)
    lut = _ramp_table(ramp)
    rgb = lut[np.round(idx * 255).astype(np.int64)]
    alpha = np.where(valid, 255, 0 if transparent else 255).astype(np.uint8)
    if not transparent:
        bg = np.asarray(bg_color, dtype=np.uint8)
        rgb = np.where(valid[..., None], rgb, bg)
    return np.concatenate([rgb, alpha[..., None]], axis=2).astype(np.uint8)


# ---------------------------------------------------------------------------
# renderers
# ---------------------------------------------------------------------------

def _window(meta: RasterMeta, bbox, width: int, height: int):
    """Output-pixel centres → source (row, col) arrays."""
    if bbox is None:
        bbox = (meta.origin_x, meta.origin_y - meta.height * meta.cell_size,
                meta.origin_x + meta.width * meta.cell_size, meta.origin_y)
    minx, miny, maxx, maxy = bbox
    xs = minx + (np.arange(width) + 0.5) * (maxx - minx) / width
    ys = maxy - (np.arange(height) + 0.5) * (maxy - miny) / height
    col = np.floor((xs - meta.origin_x) / meta.cell_size).astype(np.int64)
    row = np.floor((meta.origin_y - ys) / meta.cell_size).astype(np.int64)
    return row, col


def raster_to_image(tiles, meta: RasterMeta, *, width: int, height: int,
                    bbox=None, ramp: str = "heat",
                    vmin: float | None = None, vmax: float | None = None,
                    transparent: bool = True,
                    bg_color: tuple = (255, 255, 255),
                    fmt: str = "png") -> bytes:
    """RasterToImageProcess — nearest-neighbour resample of the tiled
    raster into a width×height window, stretch, colorize, encode."""
    if fmt.lower().removeprefix("image/") != "png":
        raise ValueError("only PNG output is implemented (no imaging "
                         "libs in this environment) — documented")
    if vmin is None or vmax is None:
        st = raster_statistics(tiles, meta)
        vmin = st["min"] if vmin is None else vmin
        vmax = st["max"] if vmax is None else vmax

    row, col = _window(meta, bbox, width, height)
    ts = meta.tile_size
    # pixel (r, c) of the OUTPUT samples source cell (row[r], col[c]);
    # group output columns/rows by source tile on the fly per tile row
    def _sample(batch: pa.Table) -> pa.Table:
        out_pix, out_val = [], []
        txs = batch["tx"].to_numpy()
        tys = batch["ty"].to_numpy()
        for i in range(batch.num_rows):
            tx, ty = int(txs[i]), int(tys[i])
            th, tw = meta.tile_shape(tx, ty)
            tile = np.frombuffer(
                batch["data"][i].as_py(), dtype=np.float64).reshape(th, tw)
            ri = np.nonzero((row >= ty * ts) & (row < ty * ts + th))[0]
            ci = np.nonzero((col >= tx * ts) & (col < tx * ts + tw))[0]
            if len(ri) == 0 or len(ci) == 0:
                continue
            sub = tile[np.ix_(row[ri] - ty * ts, col[ci] - tx * ts)]
            rr, cc = np.meshgrid(ri, ci, indexing="ij")
            out_pix.append((rr * width + cc).ravel())
            out_val.append(sub.ravel())
        if not out_pix:
            return pa.table({"pix": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64())})
        return pa.table({"pix": pa.array(np.concatenate(out_pix)),
                         "val": pa.array(np.concatenate(out_val))})

    pairs = tiles.map_batches(_sample, batch_format="pyarrow").to_pandas()
    grid = np.full(height * width, np.nan)
    if len(pairs):
        grid[pairs["pix"].to_numpy()] = pairs["val"].to_numpy()
    nodata = meta.nodata
    if nodata is not None and not np.isnan(nodata):
        grid[grid == nodata] = np.nan
    rgba = colorize(grid.reshape(height, width), ramp=ramp, vmin=vmin,
                    vmax=vmax, transparent=transparent, bg_color=bg_color)
    return encode_png(rgba)


def map_to_image(ds, *, bbox, width: int, height: int,
                 value_col: str | None = None, geom_col: str = "geom",
                 ramp: str = "heat", transparent: bool = True,
                 bg_color: tuple = (255, 255, 255)) -> bytes:
    """MapToImageProcess analogue — rasterize the feature layer onto
    the output pixel grid (one cell per pixel) and colorize. SLD
    symbology is out of scope (documented); the value ramp plays the
    role of the style."""
    from .rasterize import rasterize_features

    minx, miny, maxx, maxy = bbox
    cell = (maxx - minx) / width
    meta = RasterMeta(minx, maxy, cell, width,
                      max(int(np.ceil((maxy - miny) / cell)), height))
    tiles = rasterize_features(ds, meta, value_col=value_col,
                               geom_col=geom_col)
    return raster_to_image(tiles, meta, width=width, height=height,
                           bbox=bbox, ramp=ramp, transparent=transparent,
                           bg_color=bg_color)
