"""JPEG codec — pure stdlib/numpy (no PIL/cv2 in this container).

Decoder: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
spectral selection + successive approximation, DC/AC first and
refinement scans, EOB runs), 8-bit, 1-4 components, arbitrary chroma
sampling factors (4:4:4 / 4:2:2 / 4:2:0 …), restart markers,
byte-stuffed Huffman entropy stream. The per-symbol Huffman loop is
Python (entropy decode is inherently sequential); everything after —
dequantize, zigzag, IDCT, upsample, color convert — is vectorized
numpy over all blocks at once.

Encoders (used by tests and ``synth_media_batch(kind="jpeg")``):
baseline (Annex-K quantization tables scaled by ``quality``, Annex-K
Huffman tables, optional 4:2:0 subsampling and restart intervals) and
progressive (the standard luma/chroma scan script with successive
approximation, per-scan optimal Huffman tables built by the Annex-K.2
code-length procedure) — enough to produce real interchange-format
files that any decoder reads.

Reference: ITU-T T.81 (public spec); scan-script and refinement-pass
semantics follow the published libjpeg behavior. De-stubs the
multimodal image envelope for JPEG payloads
(``textops/multimodal.py``); the reference engine inherits image I/O
from the JVM (GT/RasterToImageProcess.java), so this is
engine-extension surface, not a port.
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

def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes (baseline SOF0 or progressive SOF2) → (H, W) uint8
    grayscale or (H, W, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps = None  # list of dicts per component
    w = h = None
    restart_interval = 0
    progressive = False
    geom = None           # (hmax, vmax, mcux, mcuy) once SOF is seen
    scans_done = 0
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                geom = (hmax, vmax, mcux, mcuy)
                for c in comps:
                    c["bw"] = mcux * c["h"]
                    c["bh"] = mcuy * c["v"]
                    c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
                    # non-interleaved scans cover the component's TRUE
                    # block grid, not the MCU-padded one (T.81 A.2.2)
                    cw = -(-(w * c["h"]) // hmax)
                    ch = -(-(h * c["v"]) // vmax)
                    c["nbx"] = -(-cw // 8)
                    c["nby"] = -(-ch // 8)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0x{marker:02X}); baseline "
                "sequential (SOF0) and progressive (SOF2) are implemented")
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
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            pos += seg_len
            if not progressive:
                return _decode_scan(data, pos, w, h, comps, scan, qt,
                                    huff_dc, huff_ac, restart_interval)
            pos = _decode_progressive_scan(
                data, pos, comps, scan, ss, se, ahal >> 4, ahal & 0x0F,
                huff_dc, huff_ac, restart_interval, geom)
            scans_done += 1
            continue
        pos += seg_len
    if progressive and scans_done:
        hmax, vmax, _, _ = geom
        return _idct_assemble([c["coef"].astype(np.float64) for c in comps],
                              comps, qt, w, h, hmax, vmax)
    raise ValueError("JPEG truncated before SOS")


# backwards-compatible name (pre-round-5 the decoder was baseline-only)
decode_jpeg_baseline = decode_jpeg


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
    return _idct_assemble([c["blocks"] for c in comps], comps, qt, w, h,
                          hmax, vmax)


def _idct_assemble(zz_arrays, comps, qt, w, h, hmax, vmax) -> np.ndarray:
    """Per-component (nblocks, 64) zigzag coefficient arrays → image.

    Dequantize + IDCT + upsample + color convert, vectorized over all
    blocks at once; shared by the baseline and progressive decoders.
    """
    planes = []
    for c, zz in zip(comps, zz_arrays):
        q = qt[c["tq"]]
        coef = np.zeros((len(zz), 64), np.float64)
        coef[:, ZIGZAG] = zz * q[None, :]
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
# progressive decoding (SOF2): per-scan coefficient accumulation
# ---------------------------------------------------------------------------

def _sync_restart(br: _BitReader, data: bytes):
    """Skip to the next restart marker and align past it.

    Mirrors the baseline restart-skip: read_bit zero-fills at a
    non-restart marker WITHOUT advancing pos, so cap no-progress to
    fail on truncated/corrupt streams instead of hanging.
    """
    last_pos, stalls = br.pos, 0
    while True:
        try:
            br.read_bit()
        except _RestartMarker:
            break
        except IndexError:
            raise ValueError("missing restart marker (truncated stream)")
        if br.pos >= len(data):
            raise ValueError("missing restart marker")
        if br.pos == last_pos:
            stalls += 1
            if stalls > 64:
                raise ValueError(
                    "missing restart marker (hit a non-restart marker "
                    "in the entropy stream)")
        else:
            last_pos, stalls = br.pos, 0
    br.pos -= 1
    br.align_after_restart()


def _ac_first(br, acd, blk, ss, se, al, eobrun):
    """Progressive AC initial scan for one block (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = acd.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, acd, blk, ss, se, al, eobrun):
    """Progressive AC refinement scan for one block (T.81 G.1.2.3).

    Correction bits for already-nonzero coefficients are interleaved
    with run/newly-nonzero symbols (published libjpeg semantics).
    """
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = acd.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: pass over 16 zero-history coefficients
                s = 0
            else:
                s = p1 if br.read_bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if br.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = s
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0:
                if br.read_bit() and (v & p1) == 0:
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(data, pos, comps, scan, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval, geom):
    """Decode one SOF2 scan into the components' coefficient arrays.

    Returns the byte position of the next marker after the entropy
    data so the segment parser can continue (progressive files carry
    many scans, with DHT redefinitions in between).
    """
    hmax, vmax, mcux, mcuy = geom
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands")
    if ss != 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    br = _BitReader(data, pos)
    for comp, _, _ in scan:
        comp["pred"] = 0
    eobrun = 0
    interleaved = len(scan) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        comp0 = scan[0][0]
        n_units = comp0["nbx"] * comp0["nby"]
    unit = 0
    while unit < n_units:
        if restart_interval and unit and unit % restart_interval == 0:
            _sync_restart(br, data)
            for comp, _, _ in scan:
                comp["pred"] = 0
            eobrun = 0
        try:
            if ss == 0:  # DC band
                if interleaved:
                    my, mx = divmod(unit, mcux)
                    blocks = []
                    for comp, td, _ in scan:
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                row = my * comp["v"] + by
                                col = mx * comp["h"] + bx
                                blocks.append(
                                    (comp, td,
                                     comp["coef"][row * comp["bw"] + col]))
                else:
                    comp, td, _ = scan[0]
                    row, col = divmod(unit, comp["nbx"])
                    blocks = [(comp, td,
                               comp["coef"][row * comp["bw"] + col])]
                for comp, td, blk in blocks:
                    if ah == 0:
                        t = huff_dc[td].decode(br)
                        diff = _extend(br.receive(t), t) if t else 0
                        comp["pred"] += diff
                        blk[0] = comp["pred"] << al
                    elif br.read_bit():
                        blk[0] = int(blk[0]) | (1 << al)
            else:  # AC band, single component
                comp, _, ta = scan[0]
                row, col = divmod(unit, comp["nbx"])
                blk = comp["coef"][row * comp["bw"] + col]
                if ah == 0:
                    eobrun = _ac_first(br, huff_ac[ta], blk, ss, se, al,
                                       eobrun)
                else:
                    eobrun = _ac_refine(br, huff_ac[ta], blk, ss, se, al,
                                        eobrun)
        except _RestartMarker:
            raise ValueError("unexpected restart marker mid-unit")
        except IndexError:
            raise ValueError("truncated progressive JPEG scan")
        unit += 1
    # locate the next marker after the entropy data (skip stray RSTs
    # and stuffed bytes the bit reader did not consume)
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF) and not (
                0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return len(data)


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


def _prepare_components(img: np.ndarray, quality: int, subsample: str):
    """Shared encoder front: color convert, subsample, pad, FDCT.

    Returns (gray, h, w, samp, qids, qtl, qtc, comp_blocks, mcux,
    mcuy) where comp_blocks[i] is the (nblocks, 64) natural-order DCT
    coefficient array of component i over its MCU-padded block grid.
    """
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
    return gray, h, w, samp, qids, qtl, qtc, comp_blocks, mcux, mcuy


def encode_jpeg_baseline(img: np.ndarray, *, quality: int = 85,
                         subsample: str = "444",
                         restart_interval: int = 0) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → baseline JPEG bytes."""
    (gray, h, w, samp, qids, qtl, qtc, comp_blocks, mcux,
     mcuy) = _prepare_components(img, quality, subsample)
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


# ---------------------------------------------------------------------------
# progressive encoder (SOF2)
# ---------------------------------------------------------------------------

def _optimal_huffman(freq: dict[int, int]):
    """Symbol frequencies → (bits[1..16], values), T.81 Annex K.2.

    Standard optimal code-length procedure with the reserved 257th
    code point (guarantees no all-ones code) and the 16-bit limit
    adjustment.
    """
    f = [0] * 257
    for s, n in freq.items():
        f[s] = n
    f[256] = 1  # reserved
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, None
        for i in range(257):
            if f[i] and (v is None or f[i] <= v):
                v, c1 = f[i], i
        c2, v = -1, None
        for i in range(257):
            if f[i] and i != c1 and (v is None or f[i] <= v):
                v, c2 = f[i], i
        if c2 < 0:
            break
        f[c1] += f[c2]
        f[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1  # drop the reserved code point
    vals = []
    for size in range(1, 33):
        for sym in range(256):
            if codesize[sym] == size:
                vals.append(sym)
    return bits[1:17], vals


class _FreqEmitter:
    """Pass-1 emitter: counts Huffman symbols per table key."""

    def __init__(self):
        self.freq: dict[tuple, dict[int, int]] = {}

    def sym(self, key, s):
        tbl = self.freq.setdefault(key, {})
        tbl[s] = tbl.get(s, 0) + 1

    def bits(self, v, n):
        pass

    def restart(self, idx):
        pass


class _CodeEmitter:
    """Pass-2 emitter: writes codes/bits into a _BitWriter."""

    def __init__(self, bw: "_BitWriter", codes: dict):
        self.bw = bw
        self.codes = codes

    def sym(self, key, s):
        code, ln = self.codes[key][s]
        self.bw.write(code, ln)

    def bits(self, v, n):
        if n:
            self.bw.write(v & ((1 << n) - 1), n)

    def restart(self, idx):
        self.bw.flush()
        self.bw.out.extend(bytes([0xFF, 0xD0 + (idx & 7)]))


class _AcFirstEnc:
    """Progressive AC initial-scan entropy state (EOB-run coding)."""

    def __init__(self, em, key, ss, se, al):
        self.em, self.key, self.ss, self.se, self.al = em, key, ss, se, al
        self.eobrun = 0

    def block(self, zz):
        em, key, al = self.em, self.key, self.al
        r = 0
        for k in range(self.ss, self.se + 1):
            temp = int(zz[k])
            if temp < 0:
                temp = (-temp) >> al
                temp2 = ~temp
            else:
                temp >>= al
                temp2 = temp
            if temp == 0:
                r += 1
                continue
            if self.eobrun:
                self.flush()
            while r > 15:
                em.sym(key, 0xF0)
                r -= 16
            nbits = temp.bit_length()
            em.sym(key, (r << 4) | nbits)
            em.bits(temp2, nbits)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush()

    def flush(self):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            self.em.sym(self.key, nbits << 4)
            if nbits:
                self.em.bits(self.eobrun, nbits)
            self.eobrun = 0


class _AcRefineEnc:
    """Progressive AC refinement entropy state (buffered correction
    bits behind pending EOB runs, published libjpeg semantics)."""

    def __init__(self, em, key, ss, se, al):
        self.em, self.key, self.ss, self.se, self.al = em, key, ss, se, al
        self.eobrun = 0
        self.be: list[int] = []  # correction bits pending with eobrun

    def block(self, zz):
        em, key, al = self.em, self.key, self.al
        ss, se = self.ss, self.se
        absv = [0] * (se + 1)
        eob = ss - 1  # index of the last newly-nonzero coefficient
        for k in range(ss, se + 1):
            t = int(zz[k])
            t = (-t if t < 0 else t) >> al
            absv[k] = t
            if t == 1:
                eob = k
        r = 0
        br_bits: list[int] = []
        for k in range(ss, se + 1):
            temp = absv[k]
            if temp == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self.flush()
                em.sym(key, 0xF0)
                r -= 16
                for b in br_bits:
                    em.bits(b, 1)
                br_bits = []
            if temp > 1:
                br_bits.append(temp & 1)
                continue
            self.flush()
            em.sym(key, (r << 4) | 1)
            em.bits(1 if int(zz[k]) >= 0 else 0, 1)
            for b in br_bits:
                em.bits(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            self.eobrun += 1
            self.be.extend(br_bits)
            if self.eobrun == 0x7FFF or len(self.be) > 900:
                self.flush()

    def flush(self):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            self.em.sym(self.key, nbits << 4)
            if nbits:
                self.em.bits(self.eobrun, nbits)
            self.eobrun = 0
            for b in self.be:
                self.em.bits(b, 1)
            self.be = []


def _run_progressive_scan(em, qz, scan_ids, ss, se, ah, al, samp,
                          mcux, mcuy, grids, restart_interval):
    """Emit one scan's entropy symbols through `em` (count or write).

    grids[ci] = (nbx, nby) true block grid for non-interleaved scans.
    """
    preds = {ci: 0 for ci in scan_ids}
    rst = 0
    if ss == 0:
        def dc_one(ci, key, zz_row):
            v = int(zz_row[0])
            if ah:
                em.bits((v >> al) & 1, 1)
                return
            t = v >> al
            diff = t - preds[ci]
            preds[ci] = t
            mag = abs(diff).bit_length()
            em.sym(key, mag)
            if mag:
                em.bits(diff if diff > 0 else diff + (1 << mag) - 1, mag)

        if len(scan_ids) > 1:
            for mcu in range(mcux * mcuy):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    em.restart(rst)
                    rst += 1
                    for ci in preds:
                        preds[ci] = 0
                my, mx = divmod(mcu, mcux)
                for ci in scan_ids:
                    sh, sv = samp[ci]
                    bwb = mcux * sh
                    key = ("dc", 0 if ci == 0 else 1)
                    for by in range(sv):
                        for bx in range(sh):
                            row = my * sv + by
                            col = mx * sh + bx
                            dc_one(ci, key, qz[ci][row * bwb + col])
        else:
            ci = scan_ids[0]
            nbx, nby = grids[ci]
            bwb = mcux * samp[ci][0]
            key = ("dc", 0 if ci == 0 else 1)
            for unit in range(nbx * nby):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    em.restart(rst)
                    rst += 1
                    preds[ci] = 0
                row, col = divmod(unit, nbx)
                dc_one(ci, key, qz[ci][row * bwb + col])
        return
    # AC scan: single component over its true block grid
    ci = scan_ids[0]
    nbx, nby = grids[ci]
    bwb = mcux * samp[ci][0]
    key = ("ac", 0 if ci == 0 else 1)
    enc_cls = _AcFirstEnc if ah == 0 else _AcRefineEnc
    enc = enc_cls(em, key, ss, se, al)
    for unit in range(nbx * nby):
        if restart_interval and unit and unit % restart_interval == 0:
            enc.flush()
            em.restart(rst)
            rst += 1
            enc = enc_cls(em, key, ss, se, al)
        row, col = divmod(unit, nbx)
        enc.block(qz[ci][row * bwb + col])
    enc.flush()


def encode_jpeg_progressive(img: np.ndarray, *, quality: int = 85,
                            subsample: str = "444",
                            restart_interval: int = 0) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → progressive JPEG.

    Uses the standard luma/chroma progression (DC first at Al=1 +
    refinement; AC spectral bands with successive approximation);
    per-scan Huffman tables are frequency-optimal (two-pass), as
    progressive files in the wild are. Final coefficient precision
    equals the baseline encoder's, so decode(progressive) is
    bit-identical to decode(baseline) at the same quality/subsampling.
    """
    (gray, h, w, samp, qids, qtl, qtc, comp_blocks, mcux,
     mcuy) = _prepare_components(img, quality, subsample)
    nc = 1 if gray else 3
    qtabs = [qtl if q == 0 else qtc for q in qids]
    # zigzag-order integer coefficients per component
    qz = [np.round(cb[:, ZIGZAG] / qt[ZIGZAG][None, :]).astype(np.int32)
          for cb, qt in zip(comp_blocks, qtabs)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    grids = []
    for sh, sv in samp:
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        grids.append((-(-cw // 8), -(-ch // 8)))
    if gray:
        script = [((0,), 0, 0, 0, 1), ((0,), 1, 5, 0, 2),
                  ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
                  ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0)]
    else:
        script = [((0, 1, 2), 0, 0, 0, 1),
                  ((0,), 1, 5, 0, 2), ((1,), 1, 63, 0, 1),
                  ((2,), 1, 63, 0, 1), ((0,), 6, 63, 0, 2),
                  ((0,), 1, 63, 2, 1), ((0, 1, 2), 0, 0, 1, 0),
                  ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
                  ((0,), 1, 63, 1, 0)]

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2)
                   + body)

    seg(0xDB, bytes([0]) + bytes(qtl.astype(np.uint8)[ZIGZAG]))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(qtc.astype(np.uint8)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
    seg(0xC2, sof)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    for scan_ids, ss, se, ah, al in script:
        # pass 1: symbol frequencies → optimal per-scan tables
        fe = _FreqEmitter()
        _run_progressive_scan(fe, qz, scan_ids, ss, se, ah, al, samp,
                              mcux, mcuy, grids, restart_interval)
        codes = {}
        for key, freq in fe.freq.items():
            bits, vals = _optimal_huffman(freq)
            codes[key] = _build_codes(bits, vals)
            cls = 0 if key[0] == "dc" else 1
            seg(0xC4, bytes([(cls << 4) | key[1]]) + bytes(bits)
                + bytes(vals))
        sos = bytes([len(scan_ids)])
        for ci in scan_ids:
            td = ta = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        bw = _BitWriter()
        _run_progressive_scan(_CodeEmitter(bw, codes), qz, scan_ids, ss,
                              se, ah, al, samp, mcux, mcuy, grids,
                              restart_interval)
        bw.flush()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
