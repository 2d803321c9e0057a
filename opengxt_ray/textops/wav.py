"""WAV (RIFF PCM) audio codec — pure stdlib/numpy.

Decoder: RIFF/WAVE container, PCM integer (8/16/24/32-bit) and IEEE
float32/64 sample formats, any channel count, arbitrary chunk order
(fmt/data plus skipped LIST/fact/etc.). Returns float64 samples in
[-1, 1). Encoder emits PCM16/PCM8 for synthesis and tests.

This de-stubs ``textops/multimodal.py AudioFrameSampler`` for WAV
payloads — the dominant uncompressed interchange format in audio
training pipelines. Compressed codecs (MP3/AAC/…) remain stubbed (no
media libraries in this container). Public spec: RIFF WAVE (Microsoft
multimedia formats, format tags 0x0001 PCM / 0x0003 IEEE float).
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, channels) float64 in [-1, 1), sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE byte stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            (wtag, nch, rate, _bps, _align,
             bits) = struct.unpack("<HHIIHH", body[:16])
            fmt = (wtag, nch, rate, bits)
        elif tag == b"data":
            raw = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    wtag, nch, rate, bits = fmt
    if wtag == 0x0001:  # integer PCM
        if bits == 8:
            s = (np.frombuffer(raw, np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 16:
            s = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8)
            n = len(b) // 3
            v = (b[0:n * 3:3].astype(np.int64)
                 | (b[1:n * 3:3].astype(np.int64) << 8)
                 | (b[2:n * 3:3].astype(np.int64) << 16))
            v = np.where(v >= (1 << 23), v - (1 << 24), v)
            s = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            s = np.frombuffer(raw, "<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits}")
    elif wtag == 0x0003:  # IEEE float
        s = np.frombuffer(raw, "<f4" if bits == 32 else "<f8").astype(
            np.float64)
    else:
        raise NotImplementedError(
            f"WAV format tag 0x{wtag:04X} (only PCM and IEEE float)")
    n = len(s) // nch
    return s[:n * nch].reshape(n, nch), rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000,
               bits: int = 16) -> bytes:
    """float samples in [-1, 1) (n,) or (n, ch) → PCM WAV bytes."""
    s = np.asarray(samples, np.float64)
    if s.ndim == 1:
        s = s[:, None]
    nch = s.shape[1]
    if bits == 16:
        pcm = np.clip(np.round(s * 32768.0), -32768, 32767).astype("<i2")
    elif bits == 8:
        pcm = np.clip(np.round(s * 128.0 + 128.0), 0, 255).astype(np.uint8)
    else:
        raise NotImplementedError("encoder emits PCM16 or PCM8")
    raw = pcm.reshape(-1).tobytes()
    bps = sample_rate * nch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, nch, sample_rate, bps,
                      nch * bits // 8, bits)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body
