"""Multimodal columns — image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

DECODE IS REAL for the self-describing interchange formats, all with
pure-stdlib codecs, used whenever the payload carries the matching
signature regardless of the ``fake`` flag:
- image: PNG (``raster/image.py decode_png_any`` — all five filters,
  all five 8-bit color types) and JPEG, both baseline (SOF0) and
  progressive (SOF2 — spectral selection + successive approximation)
  (``raster/jpeg.py`` — Huffman + DCT, chroma sampling, restart
  markers);
- audio: WAV RIFF PCM/float (``textops/wav.py`` — 8/16/24/32-bit,
  multi-channel, mono-mixed for framing);
- video: AVI/MJPEG (``textops/avi.py`` — RIFF walk + per-frame JPEG).
Compressed/inter-frame codecs (MP3, H.264, …)
remain STUBBED (no media libraries here):
they raise ``NotImplementedError`` unless ``fake=True``, in which case
a deterministic fake decoder (seeded from the payload hash) produces
arrays of the declared shape. Everything around the decode — schema
convention, batch sizing for large payloads, actor-pool signature,
broadcast model ref, output layout — is real and tested.

Schema convention:
- payload: ``binary``
- metadata struct columns: ``media_type:string``, ``width/height:int32``
  (images) or ``sample_rate/num_samples:int32`` (audio)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..core.fid import hash_strings
from ..core.util import default_concurrency


def synth_media_batch(batch: pa.Table, *, kind: str = "image") -> pa.Table:
    """Deterministic media payloads from an ``id`` column (for
    tests/benches). ``kind="png"`` emits REAL encoded PNG bytes
    (seeded RGBA noise through the stdlib codec — exercises the real
    decode path); other kinds emit a seeded opaque byte pattern for
    the fake-decode stubs."""
    ids = batch["id"].to_numpy()
    payloads = []
    w = np.full(len(ids), 64, dtype=np.int32)
    h = np.full(len(ids), 48, dtype=np.int32)
    for i in ids:
        rs = np.random.RandomState(int(i) % (2 ** 31))
        if kind == "png":
            from ..raster.image import encode_png

            rgba = rs.randint(0, 256, size=(48, 64, 4)).astype(np.uint8)
            rgba[..., 3] = 255
            payloads.append(encode_png(rgba))
        elif kind == "jpeg":
            from ..raster.jpeg import encode_jpeg_baseline

            rgb = rs.randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
            payloads.append(encode_jpeg_baseline(rgb, quality=90))
        elif kind == "wav":
            from .wav import encode_wav

            t = np.arange(4000) / 16_000.0
            sig = 0.5 * np.sin(2 * np.pi * (200 + int(i) % 200) * t)
            payloads.append(encode_wav(sig, 16_000))
        elif kind == "avi":
            from .avi import encode_avi_mjpeg

            frames = [rs.randint(0, 256, size=(24, 32)).astype(np.uint8)
                      for _ in range(8)]
            payloads.append(encode_avi_mjpeg(frames, quality=95))
        else:
            payloads.append(rs.bytes(256))
    return pa.table({
        "media_id": pa.array(ids),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array([kind] * len(ids), pa.string()),
        "width": pa.array(w), "height": pa.array(h),
    })


def _fake_decode(payload: bytes, shape: tuple[int, ...]) -> np.ndarray:
    seed = int(hash_strings([payload])[0] % np.uint64(2 ** 31))
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=shape).astype(np.uint8)


class ImageFeatureExtractor:
    """Actor-pool stage: decode → resize → feature-extract.

    Real pipeline shape: the "model" (a deterministic projection
    matrix standing in for a CNN embedding head) is built ONCE per
    actor in ``__init__`` from a broadcast ref; per batch the work is
    vectorized over decoded frames. Set ``fake=False`` once a real
    decoder (PIL/cv2) is installed — only ``_decode`` changes.
    """

    def __init__(self, *, out_dim: int = 32, resize: tuple[int, int] = (16, 16),
                 fake: bool = True, payload_col: str = "payload"):
        self.resize = resize
        self.fake = fake
        self.payload_col = payload_col
        rs = np.random.RandomState(1234)  # deterministic "model load"
        self.proj = rs.standard_normal((resize[0] * resize[1], out_dim))

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        # REAL decode paths (stdlib codecs) — used regardless of
        # `fake`; the declared w/h metadata is advisory, the decoded
        # dimensions win
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            from ..raster.image import decode_png_any, png_to_gray

            return png_to_gray(decode_png_any(payload))
        if payload[:2] == b"\xff\xd8":
            from ..raster.image import png_to_gray
            from ..raster.jpeg import decode_jpeg

            return png_to_gray(decode_jpeg(payload))
        if not self.fake:
            raise NotImplementedError(
                "image decode beyond PNG/JPEG (baseline + progressive) "
                "requires PIL/cv2 (not in this container); run with "
                "fake=True for the deterministic stub")
        return _fake_decode(payload, (h, w))

    def _resize(self, img: np.ndarray) -> np.ndarray:
        th, tw = self.resize
        ys = (np.arange(th) * img.shape[0] // th)
        xs = (np.arange(tw) * img.shape[1] // tw)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        ws = batch["width"].to_numpy()
        hs = batch["height"].to_numpy()
        frames = np.stack([
            self._resize(self._decode(p, int(w), int(h)))
            for p, w, h in zip(payloads, ws, hs)
        ]).astype(np.float64)
        flat = frames.reshape(len(payloads), -1) / 255.0
        emb = flat @ self.proj  # batched "inference"
        out = batch.drop_columns([self.payload_col])  # payload stays out of downstream shuffles
        return out.append_column(
            "embedding", pa.array(list(emb), pa.list_(pa.float64(),
                                                      emb.shape[1])))


class AudioFrameSampler:
    """Actor-pool stage: decode audio → frame-sample → per-frame RMS.

    Same stub pattern: structure real, decode fake-deterministic.
    """

    def __init__(self, *, frame_len: int = 400, hop: int = 200,
                 fake: bool = True, payload_col: str = "payload"):
        self.frame_len = frame_len
        self.hop = hop
        self.fake = fake
        self.payload_col = payload_col

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            # REAL decode path (stdlib RIFF/PCM codec) — mono-mix
            from .wav import decode_wav

            samples, _rate = decode_wav(payload)
            return samples.mean(axis=1)
        if not self.fake:
            raise NotImplementedError(
                "compressed audio decode requires soundfile/ffmpeg; WAV "
                "payloads decode for real, or run with fake=True for "
                "the deterministic stub")
        return (_fake_decode(payload, (4000,)).astype(np.float64) - 128) / 128

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_idx, rms = [], [], []
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        for i, p in zip(ids, batch[self.payload_col].to_pylist()):
            sig = self._decode(p)
            n_frames = max(0, (len(sig) - self.frame_len) // self.hop + 1)
            idx = (np.arange(n_frames)[:, None] * self.hop
                   + np.arange(self.frame_len)[None, :])
            frames = sig[idx]
            r = np.sqrt((frames ** 2).mean(axis=1))
            ids_out.append(np.full(n_frames, i))
            frame_idx.append(np.arange(n_frames, dtype=np.int32))
            rms.append(r)
        return pa.table({
            "media_id": pa.array(np.concatenate(ids_out)),
            "frame": pa.array(np.concatenate(frame_idx)),
            "rms": pa.array(np.concatenate(rms)),
        })


class VideoFrameSampler:
    """Actor-pool stage: decode video → sample every Nth frame →
    resized per-frame features (mean/std per grid cell).

    Same stub pattern as image/audio: the Ray-side plumbing (actor
    signature, small batch sizing for large payloads, typed output
    schema) is real and tested; the codec itself is a deterministic
    fake behind ``fake=True`` (no ffmpeg/PyAV in this container —
    ``fake=False`` raises).
    """

    def __init__(self, *, n_frames: int = 16, frame_shape=(24, 32),
                 every: int = 4, grid: int = 4, fake: bool = True,
                 payload_col: str = "payload"):
        self.n_frames = n_frames
        self.frame_shape = tuple(frame_shape)
        self.every = every
        self.grid = grid
        self.fake = fake
        self.payload_col = payload_col

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            # REAL decode path (stdlib AVI/MJPEG container + baseline
            # JPEG frames) — grayscale (T, H, W) in [0, 1]
            from ..raster.image import png_to_gray
            from .avi import decode_avi_mjpeg

            frames = [png_to_gray(f) for f in decode_avi_mjpeg(payload)]
            return np.stack(frames).astype(np.float64) / 255.0
        if not self.fake:
            raise NotImplementedError(
                "inter-frame video decode requires ffmpeg/PyAV; "
                "AVI/MJPEG payloads decode for real, or run with "
                "fake=True for the deterministic stub")
        h, w = self.frame_shape
        return _fake_decode(payload, (self.n_frames, h, w)).astype(
            np.float64) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        ids_out, frame_idx, feats = [], [], []
        g = self.grid
        for i, p in zip(ids, batch[self.payload_col].to_pylist()):
            vid = self._decode(p)                       # (T, H, W)
            sampled = vid[:: self.every]
            t, h, w = sampled.shape
            # g×g grid-cell means per frame — vectorized reshape
            hh, ww = (h // g) * g, (w // g) * g
            cells = sampled[:, :hh, :ww].reshape(
                t, g, hh // g, g, ww // g).mean(axis=(2, 4))
            feats.append(cells.reshape(t, g * g))
            ids_out.append(np.full(t, i))
            frame_idx.append(np.arange(t, dtype=np.int32) * self.every)
        f = np.concatenate(feats) if feats else np.empty((0, g * g))
        return pa.table({
            "media_id": pa.array(np.concatenate(ids_out)
                                 if ids_out else np.array([], np.int64)),
            "frame": pa.array(np.concatenate(frame_idx)
                              if frame_idx else np.array([], np.int32)),
            "features": pa.array(list(f), pa.list_(pa.float64(), g * g)),
        })


def video_frame_features(ds, *, every: int = 4, batch_size: int = 16,
                         concurrency=None):
    """Video pipeline: even smaller batches than images (payloads are
    frames × image size) — SURVEY 'Memory-aware'."""
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs=dict(every=every),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def image_embeddings(ds, *, out_dim=32, batch_size: int = 64,
                     concurrency=None):
    """Image pipeline: small batches (large binary payloads — SURVEY
    'Memory-aware'), actor pool, payload dropped after decode."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs=dict(out_dim=out_dim),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def audio_frames(ds, *, batch_size: int = 64, concurrency=None):
    return ds.map_batches(
        AudioFrameSampler,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
