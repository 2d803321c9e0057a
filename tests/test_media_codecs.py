"""WAV (RIFF PCM) and AVI/MJPEG codec tests + the real (non-stub)
audio/video actor-pool paths."""

import struct

import numpy as np
import pytest
import ray

from opengxt_ray.textops.avi import decode_avi_mjpeg, encode_avi_mjpeg
from opengxt_ray.textops.wav import decode_wav, encode_wav


def test_wav_pcm16_roundtrip():
    t = np.arange(5000) / 16_000.0
    sig = 0.7 * np.sin(2 * np.pi * 440 * t)
    out, rate = decode_wav(encode_wav(sig, 16_000))
    assert rate == 16_000 and out.shape == (5000, 1)
    assert np.abs(out[:, 0] - sig).max() < 1.0 / 32768 + 1e-9


def test_wav_pcm8_and_stereo():
    rs = np.random.RandomState(1)
    sig = rs.uniform(-0.9, 0.9, size=(1000, 2))
    out, rate = decode_wav(encode_wav(sig, 8000, bits=8))
    assert out.shape == (1000, 2) and rate == 8000
    assert np.abs(out - sig).max() < 1.0 / 128 + 1e-9


def test_wav_24bit_and_float():
    # hand-build a 24-bit PCM file: value 2^23-1 → ~1.0, -2^23 → -1.0
    vals = [(1 << 23) - 1, -(1 << 23), 0, 1 << 22]
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out, _ = decode_wav(data)
    np.testing.assert_allclose(
        out[:, 0], [((1 << 23) - 1) / (1 << 23), -1.0, 0.0, 0.5])
    # IEEE float32 file
    f = np.array([0.25, -0.5, 0.125], "<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", f.nbytes) + f.tobytes())
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out, _ = decode_wav(data)
    np.testing.assert_allclose(out[:, 0], f.astype(np.float64))


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")


def test_avi_mjpeg_roundtrip():
    rs = np.random.RandomState(5)
    x = np.linspace(0, 255, 32)
    base = ((np.linspace(0, 255, 24)[:, None] + x[None, :]) / 2)
    frames = [np.clip(base + 10 * k, 0, 255).astype(np.uint8)
              for k in range(6)]
    got = decode_avi_mjpeg(encode_avi_mjpeg(frames, quality=95))
    assert len(got) == 6
    for f, g in zip(frames, got):
        assert g.shape == f.shape
        mse = np.mean((f.astype(float) - g.astype(float)) ** 2)
        assert mse < 4.0  # q=95 smooth gradient: near-lossless


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


def test_audio_frames_real_wav_path():
    """End-to-end actor-pool audio framing over real WAV payloads: the
    per-frame RMS of a pure sine must be ~A/sqrt(2)."""
    from opengxt_ray.textops.multimodal import (audio_frames,
                                                synth_media_batch)

    ds = ray.data.range(8, override_num_blocks=2).map_batches(
        lambda b: synth_media_batch(b, kind="wav"), batch_format="pyarrow")
    out = audio_frames(ds, concurrency=2).to_pandas()
    # 4000 samples, frame 400 hop 200 → 19 frames per clip
    assert len(out) == 8 * 19
    rms = out["rms"].to_numpy()
    assert np.abs(rms - 0.5 / np.sqrt(2)).max() < 0.02


def test_video_frames_real_avi_path():
    """End-to-end actor-pool video sampling over real AVI payloads:
    frame indices follow `every`, features equal the grid means of the
    DECODED frames."""
    from opengxt_ray.raster.image import png_to_gray
    from opengxt_ray.textops.avi import decode_avi_mjpeg
    from opengxt_ray.textops.multimodal import (VideoFrameSampler,
                                                synth_media_batch,
                                                video_frame_features)

    ds = ray.data.range(6, override_num_blocks=2).map_batches(
        lambda b: synth_media_batch(b, kind="avi"), batch_format="pyarrow")
    out = video_frame_features(ds, every=4).to_pandas() \
        .sort_values(["media_id", "frame"]).reset_index(drop=True)
    # 8 frames sampled every 4th → frames 0 and 4 per clip
    assert len(out) == 6 * 2
    assert sorted(out["frame"].unique().tolist()) == [0, 4]
    # independent expectation for media_id 2, frame 4
    rs = np.random.RandomState(2)
    frames = [rs.randint(0, 256, size=(24, 32)).astype(np.uint8)
              for _ in range(8)]
    payload = encode_avi_mjpeg(frames, quality=95)
    dec = decode_avi_mjpeg(payload)[4].astype(np.float64) / 255.0
    g = 4
    cells = dec[:24, :32].reshape(g, 24 // g, g, 32 // g).mean(axis=(1, 3))
    got = np.asarray(out.loc[(out.media_id == 2) & (out.frame == 4),
                             "features"].iloc[0])
    np.testing.assert_allclose(got, cells.reshape(-1), rtol=1e-12)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(1, 3000), ch=st.integers(1, 3),
           rate=st.sampled_from([8000, 16000, 44100]),
           seed=st.integers(0, 2 ** 31 - 1))
    def test_wav_pcm16_roundtrip_property(n, ch, rate, seed):
        rs = np.random.RandomState(seed)
        sig = rs.uniform(-0.999, 0.999, size=(n, ch))
        out, r = decode_wav(encode_wav(sig, rate))
        assert r == rate and out.shape == (n, ch)
        assert np.abs(out - sig).max() < 1.0 / 32768 + 1e-9
except ImportError:  # pragma: no cover
    pass
