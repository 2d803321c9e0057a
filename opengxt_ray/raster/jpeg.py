"""Baseline JPEG codec — pure stdlib/numpy (no PIL/cv2 in this
container).

Decoder: baseline sequential DCT (SOF0), 8-bit, 1-4 components,
arbitrary chroma sampling factors (4:4:4 / 4:2:2 / 4:2:0 …), restart
markers, byte-stuffed Huffman entropy stream. The per-symbol Huffman
loop is Python (entropy decode is inherently sequential); everything
after — dequantize, zigzag, IDCT, upsample, color convert — is
vectorized numpy over all blocks at once.

Encoder (used by tests and ``synth_media_batch(kind="jpeg")``):
baseline, Annex-K quantization tables scaled by ``quality``, Annex-K
Huffman tables, optional 4:2:0 subsampling and restart intervals —
enough to produce real interchange-format files that any decoder
reads.

Reference: ITU-T T.81 (public spec). De-stubs the multimodal image
envelope for JPEG payloads (``textops/multimodal.py``); the reference
engine inherits image I/O from the JVM (GT/RasterToImageProcess.java),
so this is engine-extension surface, not a port.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.float64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.float64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8×8 DCT-II matrix: IDCT is D.T @ X @ D, FDCT is D @ x @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) samples."""
    return np.einsum("ki,nkl,lj->nij", _D, coefs, _D)


def _fdct_blocks(samples: np.ndarray) -> np.ndarray:
    return np.einsum("ik,nkl,jl->nij", _D, samples, _D)


# ---------------------------------------------------------------------------
# Huffman helpers
# ---------------------------------------------------------------------------

def _build_codes(bits, values):
    """(bits[1..16], values) → {symbol: (code, length)} (canonical)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical-code decoder: per length, first code + symbol offset."""

    def __init__(self, bits, values):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.values = list(values)
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br) -> int:
        code = br.read_bit()
        ln = 1
        while code > self.maxcode[ln]:
            code = (code << 1) | br.read_bit()
            ln += 1
            if ln > 16:
                raise ValueError("corrupt JPEG Huffman stream")
        return self.values[self.valptr[ln] + code - self.mincode[ln]]


class _BitReader:
    """MSB-first reader over the byte-stuffed entropy segment."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1          # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    raise _RestartMarker(nxt)
                else:
                    # marker: synthesize zero-fill (spec: decoder pads)
                    self.pos -= 1
                    b = 0
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_after_restart(self):
        self.pos += 2  # skip the 0xFF 0xDx pair
        self.cur = 0
        self.nbits = 0


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map n-bit magnitude to signed value."""
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W) uint8 grayscale or (H, W, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps = None  # list of dicts per component
    w = h = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec = body[i] >> 4
                tid = body[i] & 0x0F
                i += 1
                if prec:
                    tab = np.frombuffer(body[i:i + 128], ">u2").astype(
                        np.float64)
                    i += 128
                else:
                    tab = np.frombuffer(body[i:i + 64], np.uint8).astype(
                        np.float64)
                    i += 64
                qt[tid] = tab
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}); only "
                "baseline sequential DCT (SOF0) is implemented")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc = body[i] >> 4
                th = body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            pos += seg_len
            return _decode_scan(data, pos, w, h, comps, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += seg_len
    raise ValueError("JPEG truncated before SOS")


def _decode_scan(data, pos, w, h, comps, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]           # blocks per row
        c["bh"] = mcuy * c["v"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), np.float64)
        c["pred"] = 0
    br = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    mcu = 0
    while mcu < n_mcu:
        if restart_interval and mcu and mcu % restart_interval == 0:
            # skip to the restart marker, reset DC predictions.
            # read_bit zero-fills at a non-restart marker WITHOUT
            # advancing pos (spec padding) — a truncated/corrupt
            # stream would loop forever here, so cap no-progress.
            last_pos, stalls = br.pos, 0
            while True:
                try:
                    br.read_bit()
                except _RestartMarker:
                    break
                except IndexError:
                    raise ValueError(
                        "missing restart marker (truncated stream)")
                if br.pos >= len(data):
                    raise ValueError("missing restart marker")
                if br.pos == last_pos:
                    stalls += 1
                    if stalls > 64:
                        raise ValueError(
                            "missing restart marker (hit a non-restart "
                            "marker in the entropy stream)")
                else:
                    last_pos, stalls = br.pos, 0
            br.pos -= 1
            br.align_after_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mcu, mcux)
        try:
            for comp, td, ta in scan:
                dcd, acd = huff_dc[td], huff_ac[ta]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = np.zeros(64, np.float64)
                        t = dcd.decode(br)
                        diff = _extend(br.receive(t), t) if t else 0
                        comp["pred"] += diff
                        blk[0] = comp["pred"]
                        k = 1
                        while k < 64:
                            rs = acd.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        comp["blocks"][row * comp["bw"] + col] = blk
        except _RestartMarker:
            raise ValueError("unexpected restart marker mid-MCU")
        mcu += 1
    # dequantize + IDCT per component, vectorized over all blocks
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        coef = np.zeros((len(c["blocks"]), 64), np.float64)
        coef[:, ZIGZAG] = c["blocks"] * q[None, :]
        sam = _idct_blocks(coef.reshape(-1, 8, 8)) + 128.0
        plane = sam.reshape(c["bh"], c["bw"], 8, 8).transpose(
            0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full resolution (sample replication)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    Y, Cb, Cr = planes
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, ln: int):
        for i in range(ln - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)
                self.cur = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * s + 50) / 100), 1, 255)


def _encode_block(bw, blk, qtab, dc_codes, ac_codes, pred):
    zz = np.round(blk[ZIGZAG] / qtab[ZIGZAG]).astype(np.int64)
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    mag = int(abs(diff)).bit_length()
    code, ln = dc_codes[mag]
    bw.write(code, ln)
    if mag:
        bw.write(diff if diff > 0 else diff + (1 << mag) - 1, mag)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = (last_nz[-1] + 1) if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l2 = ac_codes[0xF0]
            bw.write(c, l2)
            run -= 16
        mag = abs(v).bit_length()
        c, l2 = ac_codes[(run << 4) | mag]
        bw.write(c, l2)
        bw.write(v if v > 0 else v + (1 << mag) - 1, mag)
        run = 0
    if last < 63:
        c, l2 = ac_codes[0x00]
        bw.write(c, l2)
    return pred


def encode_jpeg_baseline(img: np.ndarray, *, quality: int = 85,
                         subsample: str = "444",
                         restart_interval: int = 0) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → baseline JPEG bytes."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qtl = _scale_qt(QT_LUMA, quality)
    qtc = _scale_qt(QT_CHROMA, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        rgb = img.astype(np.float64)
        Y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        Cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        Cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            # box-filter 2×2 chroma
            He, We = h + (h & 1), w + (w & 1)
            def _box(p):
                pp = np.pad(p, ((0, He - h), (0, We - w)), mode="edge")
                return pp.reshape(He // 2, 2, We // 2, 2).mean(axis=(1, 3))
            planes = [Y, _box(Cb), _box(Cr)]
        elif subsample == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [Y, Cb, Cr]
        else:
            raise ValueError("subsample must be '444' or '420'")
        qids = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to its MCU-aligned block grid and pre-DCT everything
    comp_blocks = []
    for p, (sh, sv) in zip(planes, samp):
        bw_, bh_ = mcux * sh, mcuy * sv
        pp = np.full((bh_ * 8, bw_ * 8), 128.0)
        pp[:p.shape[0], :p.shape[1]] = p
        # edge-replicate padding (reduces ringing at borders)
        pp[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        pp[:p.shape[0], p.shape[1]:] = p[:, -1:]
        pp[p.shape[0]:, p.shape[1]:] = p[-1, -1]
        blocks = pp.reshape(bh_, 8, bw_, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        comp_blocks.append(_fdct_blocks(blocks - 128.0).reshape(-1, 64))
    dc_l = _build_codes(*HT_DC_LUMA)
    ac_l = _build_codes(*HT_AC_LUMA)
    dc_c = _build_codes(*HT_DC_CHROMA)
    ac_c = _build_codes(*HT_AC_CHROMA)

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2)
                   + body)

    seg(0xDB, bytes([0]) + bytes(qtl.astype(np.uint8)[ZIGZAG]))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(qtc.astype(np.uint8)[ZIGZAG]))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
    seg(0xC0, sof)
    for tc, th, (bits, vals) in ((0, 0, HT_DC_LUMA), (1, 0, HT_AC_LUMA),
                                 (0, 1, HT_DC_CHROMA),
                                 (1, 1, HT_AC_CHROMA)):
        if gray and th == 1:
            continue
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | td])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * nc
    qtabs = [qtl if q == 0 else qtc for q in qids]
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            bw.out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            preds = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            bw_blocks = mcux * sh
            dc = dc_l if ci == 0 else dc_c
            ac = ac_l if ci == 0 else ac_c
            for by in range(sv):
                for bx in range(sh):
                    row = my * sv + by
                    col = mx * sh + bx
                    blk = comp_blocks[ci][row * bw_blocks + col]
                    preds[ci] = _encode_block(bw, blk, qtabs[ci], dc, ac,
                                              preds[ci])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
