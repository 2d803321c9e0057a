"""JPEG codec tests (raster/jpeg.py): encoder↔decoder round trips
across quality / subsampling / restart intervals / odd sizes,
progressive (SOF2) scans bit-equal to baseline, spec-edge behavior,
and the real (non-stub) embedding path."""

import numpy as np
import pytest
import ray

from opengxt_ray.raster.jpeg import (decode_jpeg_baseline,
                                     encode_jpeg_baseline,
                                     encode_jpeg_progressive)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    return ((y[:, None] + x[None, :]) / 2).astype(np.uint8)


@pytest.mark.parametrize("q,floor", [(50, 40), (85, 48), (95, 55)])
def test_gray_roundtrip_quality(q, floor):
    img = _gradient(48, 64)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=q))
    assert out.shape == img.shape
    assert _psnr(img, out) > floor


@pytest.mark.parametrize("ss,floor", [("444", 40), ("420", 28)])
def test_rgb_roundtrip_subsampling(ss, floor):
    g = _gradient(48, 64)
    rgb = np.stack([g, g[::-1], np.roll(g, 7, axis=1)], axis=2)
    out = decode_jpeg_baseline(
        encode_jpeg_baseline(rgb, quality=90, subsample=ss))
    assert out.shape == rgb.shape
    assert _psnr(rgb, out) > floor


def test_odd_dimensions_and_constant_exact():
    c = np.full((17, 23), 77, np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(c, quality=90))
    assert out.shape == (17, 23)
    assert int(np.abs(out.astype(int) - 77).max()) == 0
    g = _gradient(19, 31)  # non-multiple of 8 both axes
    rgb = np.stack([g, g, g], axis=2)
    out = decode_jpeg_baseline(
        encode_jpeg_baseline(rgb, quality=90, subsample="420"))
    assert out.shape == (19, 31, 3)  # 4:2:0 MCU padding trimmed


def test_restart_markers():
    g = _gradient(48, 64)
    rgb = np.stack([g, g[::-1], np.roll(g, 7, axis=1)], axis=2)
    plain = decode_jpeg_baseline(encode_jpeg_baseline(rgb, quality=90))
    rst = decode_jpeg_baseline(
        encode_jpeg_baseline(rgb, quality=90, restart_interval=2))
    # restart only resets DC prediction — pixel output identical
    assert (plain == rst).all()


def test_noise_q100_near_lossless():
    """q=100 quantizers are mostly 1s → the full AC path (ZRL, EOB,
    long runs, every magnitude category) round-trips dense noise."""
    rs = np.random.RandomState(9)
    img = rs.randint(0, 256, size=(40, 56)).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
    assert _psnr(img, out) > 40


def test_unsupported_sof_raises():
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg_baseline(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # lossless sequential: not implemented
    with pytest.raises(NotImplementedError):
        decode_jpeg_baseline(bytes(data))
    # SOF2 is supported, but a combined DC+AC scan inside a
    # progressive frame is malformed → ValueError, not a wrong image
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_baseline(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\x00\x01not a jpeg")


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,sub,q", [
    ((32, 32), "444", 85), ((17, 23), "444", 50),
    ((32, 32, 3), "444", 95), ((33, 47, 3), "420", 85),
    ((9, 9, 3), "420", 50), ((8, 8), "444", 95),
])
def test_progressive_decode_bit_equals_baseline(shape, sub, q):
    """The standard progression (DC Al=1 + refinement, AC spectral
    bands with successive approximation) restores the exact quantized
    coefficients, so decode(progressive) == decode(baseline)."""
    rs = np.random.RandomState(7)
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    base = (yy * 3 + xx * 2) % 256
    img = base if len(shape) == 2 else np.stack(
        [base, (xx * 5) % 256, (yy + xx * 2) % 256], axis=2)
    img = np.clip(img + rs.randint(-20, 20, shape), 0, 255).astype(np.uint8)
    b = decode_jpeg_baseline(
        encode_jpeg_baseline(img, quality=q, subsample=sub))
    p = decode_jpeg_baseline(
        encode_jpeg_progressive(img, quality=q, subsample=sub))
    assert np.array_equal(b, p)


def test_progressive_restart_intervals_and_noise():
    """Dense noise (max-entropy AC: every EOB-run / ZRL / refinement
    branch) with restart markers in every scan."""
    rs = np.random.RandomState(11)
    img = rs.randint(0, 256, size=(40, 40, 3)).astype(np.uint8)
    b = decode_jpeg_baseline(
        encode_jpeg_baseline(img, quality=75, subsample="420"))
    p = decode_jpeg_baseline(encode_jpeg_progressive(
        img, quality=75, subsample="420", restart_interval=2))
    assert np.array_equal(b, p)


def test_progressive_truncation_raises_not_hangs():
    rs = np.random.RandomState(13)
    img = rs.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    enc = encode_jpeg_progressive(img, quality=85, restart_interval=2)
    for cut in (len(enc) // 4, len(enc) // 2, len(enc) - 20):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg_baseline(enc[:cut])


def test_image_extractor_mixed_baseline_progressive_batch():
    """ImageFeatureExtractor handles a batch mixing baseline and
    progressive payloads; identical pixels → identical embeddings."""
    import pyarrow as pa

    from opengxt_ray.textops.multimodal import ImageFeatureExtractor

    rs = np.random.RandomState(5)
    rgb = rs.randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
    pays = [encode_jpeg_baseline(rgb, quality=90),
            encode_jpeg_progressive(rgb, quality=90)]
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(pays, pa.binary()),
        "width": pa.array([64, 64], pa.int32()),
        "height": pa.array([48, 48], pa.int32()),
    })
    out = ImageFeatureExtractor()(batch)
    embs = out["embedding"].to_pylist()
    np.testing.assert_allclose(embs[0], embs[1], rtol=1e-12)


def test_image_embeddings_real_jpeg_path():
    """End-to-end actor-pool stage on real JPEG payloads: embeddings
    equal the projection of the DECODED pixels."""
    from opengxt_ray.raster.image import png_to_gray
    from opengxt_ray.textops.multimodal import (ImageFeatureExtractor,
                                                image_embeddings,
                                                synth_media_batch)

    ds = ray.data.range(16, override_num_blocks=2).map_batches(
        lambda b: synth_media_batch(b, kind="jpeg"), batch_format="pyarrow")
    out = image_embeddings(ds, concurrency=2).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert len(out) == 16
    rs = np.random.RandomState(3)
    rgb = rs.randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
    ex = ImageFeatureExtractor()
    gray = png_to_gray(decode_jpeg_baseline(
        encode_jpeg_baseline(rgb, quality=90)))
    exp = (ex._resize(gray).astype(np.float64).reshape(-1) / 255.0) @ ex.proj
    got = np.asarray(out.loc[out.media_id == 3, "embedding"].iloc[0])
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_truncated_restart_stream_raises_not_hangs():
    """Round-5 fix: a corrupt stream whose restart marker is replaced
    by EOI must raise (no-progress cap), not spin forever zero-filling
    at the marker."""
    g = _gradient(48, 64)
    data = bytearray(encode_jpeg_baseline(g, quality=90,
                                          restart_interval=1))
    # find the first restart marker in the entropy stream (FFD0..FFD7,
    # after SOS) and turn it into EOI
    sos = bytes(data).find(b"\xff\xda")
    i = sos + 2
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            data[i + 1] = 0xD9
            break
        i += 1
    else:
        raise AssertionError("no restart marker found in fixture")
    with pytest.raises(ValueError):
        decode_jpeg_baseline(bytes(data))
