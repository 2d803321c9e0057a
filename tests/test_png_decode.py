"""Baseline PNG decoder tests — all five scanline filters, all five
8-bit color types, and the real (non-stub) image-embedding path."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.raster.image import (decode_png_any, encode_png,
                                      png_to_gray)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body +
            struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a, b, c):
    p = a.astype(np.int16) + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                    np.where(pb_ <= pc_, b, c)).astype(np.uint8)


def _filter_row(cur, prev, bpp, ftype):
    """Forward PNG filter (the encoder side — independent reference)."""
    cur16 = cur.astype(np.int16)
    left = np.concatenate([np.zeros(bpp, np.int16), cur16[:-bpp]])
    up = prev.astype(np.int16)
    ul = np.concatenate([np.zeros(bpp, np.int16), up[:-bpp]])
    if ftype == 0:
        out = cur16
    elif ftype == 1:
        out = cur16 - left
    elif ftype == 2:
        out = cur16 - up
    elif ftype == 3:
        out = cur16 - ((left + up) >> 1)
    elif ftype == 4:
        out = cur16 - _paeth(left.astype(np.uint8), up.astype(np.uint8),
                             ul.astype(np.uint8))
    return (out % 256).astype(np.uint8)


def _make_png(pixels: np.ndarray, ctype: int, filters,
              plte: np.ndarray | None = None) -> bytes:
    """Encode `pixels` (H, stride) channel-interleaved bytes with a
    chosen per-row filter list — exercises every decoder branch."""
    h = pixels.shape[0]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = pixels.shape[1]
    w = stride // channels
    raw = bytearray()
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = filters[y % len(filters)]
        raw.append(ft)
        raw.extend(_filter_row(pixels[y], prev, channels, ft).tobytes())
        prev = pixels[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    return out + _chunk(b"IEND", b"")


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_all_filters_rgba(filters):
    rs = np.random.RandomState(11)
    h, w = 13, 17
    px = rs.randint(0, 256, size=(h, w * 4)).astype(np.uint8)
    img = decode_png_any(_make_png(px, 6, filters))
    assert img.shape == (h, w, 4)
    assert (img.reshape(h, w * 4) == px).all()


@pytest.mark.parametrize("ctype,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_color_types(ctype, channels):
    rs = np.random.RandomState(5 + ctype)
    h, w = 9, 7
    px = rs.randint(0, 256, size=(h, w * channels)).astype(np.uint8)
    img = decode_png_any(_make_png(px, ctype, [4, 2, 1]))
    flat = img.reshape(h, w * channels) if img.ndim > 1 else img
    assert (flat.reshape(h, w * channels) == px).all()


def test_palette_png():
    rs = np.random.RandomState(3)
    plte = rs.randint(0, 256, size=(16, 3)).astype(np.uint8)
    h, w = 6, 10
    idx = rs.randint(0, 16, size=(h, w)).astype(np.uint8)
    img = decode_png_any(_make_png(idx, 3, [0, 1], plte=plte))
    assert img.shape == (h, w, 3)
    assert (img == plte[idx]).all()


def test_roundtrip_with_repo_encoder():
    rs = np.random.RandomState(21)
    rgba = rs.randint(0, 256, size=(20, 30, 4)).astype(np.uint8)
    assert (decode_png_any(encode_png(rgba)) == rgba).all()


ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _make_png_adam7(pixels: np.ndarray, channels: int,
                    ctype: int) -> bytes:
    """Independent Adam7 encoder: extract each pass lattice, filter-0
    scanlines, concatenate — the decoder must scatter them back."""
    h = pixels.shape[0]
    w = pixels.shape[1] // channels
    raw = bytearray()
    for x0, y0, dx, dy in ADAM7:
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw <= 0 or ph <= 0:
            continue
        px3 = pixels.reshape(h, w, channels)
        sub = px3[y0::dy][:ph][:, x0::dx][:, :pw]
        for y in range(ph):
            raw.append(0)
            raw.extend(sub[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("h,w", [(13, 17), (1, 1), (3, 9), (8, 8)])
def test_adam7_interlaced_decode(h, w):
    rs = np.random.RandomState(h * 100 + w)
    px = rs.randint(0, 256, size=(h, w * 4)).astype(np.uint8)
    img = decode_png_any(_make_png_adam7(px, 4, 6))
    assert img.shape == (h, w, 4)
    assert (img.reshape(h, w * 4) == px).all()
    g = rs.randint(0, 256, size=(h, w)).astype(np.uint8)
    img = decode_png_any(_make_png_adam7(g, 1, 0))
    assert (img == g).all()


def test_16bit_png_decode():
    """16-bit grayscale and RGB: big-endian samples, byte-level
    filters (filter 0 and Up here), uint16 output."""
    rs = np.random.RandomState(6)
    for channels, ctype in ((1, 0), (3, 2)):
        h, w = 5, 9
        vals = rs.randint(0, 65536, size=(h, w * channels)).astype(">u2")
        raw = bytearray()
        prev = np.zeros(w * channels * 2, np.uint8)
        for y in range(h):
            line = np.frombuffer(vals[y].tobytes(), np.uint8)
            if y % 2 == 0:
                raw.append(0)
                raw.extend(line.tobytes())
            else:  # Up filter over bytes
                raw.append(2)
                raw.extend(((line.astype(np.int16) - prev) % 256)
                           .astype(np.uint8).tobytes())
            prev = line
        import struct as _st
        import zlib as _zl
        ihdr = _st.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", _zl.compress(bytes(raw)))
                + _chunk(b"IEND", b""))
        img = decode_png_any(data)
        assert img.dtype == np.uint16
        flat = img.reshape(h, w * channels)
        assert (flat == vals.astype(np.uint16)).all()


def test_png_to_gray_luma():
    img = np.zeros((1, 2, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    img[0, 1] = (0, 255, 0)
    g = png_to_gray(img)
    assert g[0, 0] == round(0.299 * 255)
    assert g[0, 1] == round(0.587 * 255)
    assert png_to_gray(np.array([[7]], np.uint8))[0, 0] == 7


def test_image_embeddings_real_png_path():
    """End-to-end: real PNG payloads through the actor-pool stage; the
    embedding must equal the projection of the DECODED pixels (i.e.
    the real codec ran, not the fake)."""
    from opengxt_ray.raster.image import encode_png as _enc
    from opengxt_ray.textops.multimodal import (ImageFeatureExtractor,
                                                image_embeddings,
                                                synth_media_batch)

    ds = ray.data.range(32, override_num_blocks=4).map_batches(
        lambda b: synth_media_batch(b, kind="png"), batch_format="pyarrow")
    out = image_embeddings(ds, concurrency=2).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert len(out) == 32
    # independent expectation for media_id 5
    rs = np.random.RandomState(5)
    rgba = rs.randint(0, 256, size=(48, 64, 4)).astype(np.uint8)
    rgba[..., 3] = 255
    ex = ImageFeatureExtractor()
    gray = png_to_gray(decode_png_any(_enc(rgba)))
    exp = (ex._resize(gray).astype(np.float64).reshape(-1) / 255.0) @ ex.proj
    got = np.asarray(out.loc[out.media_id == 5, "embedding"].iloc[0])
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_non_png_fake_false_raises():
    from opengxt_ray.textops.multimodal import ImageFeatureExtractor

    ex = ImageFeatureExtractor(fake=False)
    with pytest.raises(NotImplementedError):
        ex._decode(b"GIF87a not-a-png-or-jpeg", 8, 8)


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        ctype=st.sampled_from([0, 2, 4, 6]),
        seed=st.integers(0, 2 ** 31 - 1),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    )
    def test_png_decode_roundtrip_property(h, w, ctype, seed, filters):
        channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        rs = np.random.RandomState(seed)
        px = rs.randint(0, 256, size=(h, w * channels)).astype(np.uint8)
        img = decode_png_any(_make_png(px, ctype, filters))
        assert (img.reshape(h, w * channels) == px).all()
except ImportError:  # pragma: no cover
    pass
