"""AVI (RIFF) container with MJPEG frames — pure stdlib/numpy.

Motion-JPEG-in-AVI is the simplest real interchange video format: the
container is plain RIFF chunking and every frame is an independent
baseline JPEG, which ``raster/jpeg.py`` already decodes. This de-stubs
``textops/multimodal.py VideoFrameSampler`` for AVI/MJPEG payloads;
inter-frame codecs (H.264/VP9/…) remain stubbed (no media libraries in
this container). Public spec: Microsoft RIFF AVI file format.
"""

from __future__ import annotations

import struct

import numpy as np

from ..raster.jpeg import decode_jpeg_baseline, encode_jpeg_baseline


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames, *, fps: int = 10, quality: int = 85) -> bytes:
    """List of (H, W[, 3]) uint8 frames → AVI/MJPEG bytes."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg_baseline(f, quality=quality) for f in frames]
    usec = 1_000_000 // fps
    maxbuf = max(len(j) for j in jpegs)
    avih = struct.pack("<14I", usec, maxbuf * fps, 0, 0x10, len(jpegs), 0,
                       1, maxbuf, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<I", 0)
            + struct.pack("<HHI", 0, 0, 0)
            + struct.pack("<IIIIIIII", 1, fps, 0, len(jpegs), maxbuf,
                          0xFFFFFFFF, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> list[np.ndarray]:
    """AVI/MJPEG bytes → list of decoded (H, W[, 3]) uint8 frames."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI byte stream")
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
            if tag == b"LIST":
                kind = data[pos + 8:pos + 12]
                if kind in (b"movi", b"rec "):
                    walk(pos + 12, pos + 8 + ln)
            elif tag[2:4] in (b"dc", b"db") and ln > 2:
                body = data[pos + 8:pos + 8 + ln]
                if body[:2] == b"\xff\xd8":
                    frames.append(decode_jpeg_baseline(body))
            pos += 8 + ln + (ln & 1)

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI contains no MJPEG frames")
    return frames
