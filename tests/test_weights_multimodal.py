"""Contiguity/KNN weights, JoinCount, pair-driven hotspot, multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import wkb as _wkb
from opengxt_ray.ops import hotspot, weights
from opengxt_ray.ops.binning import fishnet
from opengxt_ray.textops import multimodal as MM


@pytest.fixture(scope="module")
def grid_polys():
    """5×5 grid of unit squares with known adjacency."""
    ds = fishnet((0, 0, 5, 5), columns=5, rows=5, parallelism=2)
    return ds.materialize()


def test_contiguity_rook_queen(grid_polys):
    rook = weights.contiguity_pairs(grid_polys, fid_col="cell_id",
                                    mode="rook").to_pandas()
    # directed rook joins in a 5×5 grid: 2 * 2*5*4 = 80
    assert len(rook) == 80
    queen = weights.contiguity_pairs(grid_polys, fid_col="cell_id",
                                     mode="queen").to_pandas()
    # queen adds 2 diagonals per interior vertex: 80 + 2*2*16 = 144
    assert len(queen) == 144
    # spot-check: corner cell 0 has rook neighbors {1, 5}
    n0 = set(rook[rook.src == 0].dst)
    assert n0 == {1, 5}
    q0 = set(queen[queen.src == 0].dst)
    assert q0 == {1, 5, 6}


def test_bishops(grid_polys):
    b = weights.contiguity_pairs(grid_polys, fid_col="cell_id",
                                 mode="bishops").to_pandas()
    assert len(b) == 144 - 80
    assert set(b[b.src == 0].dst) == {6}


def test_knn_pairs():
    rs = np.random.RandomState(2)
    n = 100
    t = pa.table({"pid": pa.array(np.arange(n)),
                  "lon": pa.array(rs.uniform(0, 10, n)),
                  "lat": pa.array(rs.uniform(0, 10, n))})
    ds = ray.data.from_arrow(t)
    pairs = weights.knn_pairs(ds, id_col="pid", k=4).to_pandas()
    assert len(pairs) == n * 4
    assert (pairs.src != pairs.dst).all()


def test_gi_star_with_knn_weights():
    rs = np.random.RandomState(5)
    n = 120
    x = rs.uniform(0, 10, n)
    y = rs.uniform(0, 10, n)
    v = rs.uniform(0, 100, n)
    t = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(x),
                  "lat": pa.array(y), "val": pa.array(v)})
    ds = ray.data.from_arrow(t).materialize()
    pairs = weights.knn_pairs(ds, id_col="pid", k=6).materialize()
    sums = weights.sums_from_pairs(pairs, ds, "val", id_col="pid")
    out = hotspot.local_gi_star(ds, "val", id_col="pid", sums=sums,
                                round_digits=None).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    # brute: w = knn(6) binary, no self
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    w = np.zeros((n, n))
    for i in range(n):
        order = np.lexsort((np.arange(n), d2[i]))[:6]
        w[i, order] = 1.0
    nf = float(n)
    mean = v.sum() / nf
    var = np.sqrt((v ** 2).sum() / nf - mean ** 2)
    ls = w @ v
    ws = w.sum(1)
    w2 = (w * w).sum(1)
    z = (ls - ws * mean) / (var * np.sqrt((nf * w2 - ws ** 2) / (nf - 1)))
    np.testing.assert_allclose(out["GiZScore"].to_numpy(), z, rtol=1e-9)


def test_join_count(grid_polys):
    # black = even cells (checkerboard): rook joins are all BW
    cells = grid_polys.map_batches(
        lambda b: b.append_column(
            "black", pa.array(((b["cell_id"].to_numpy() % 5
                                + b["cell_id"].to_numpy() // 5) % 2 == 0))),
        batch_format="pyarrow").materialize()
    pairs = weights.contiguity_pairs(cells, fid_col="cell_id", mode="rook")
    res = weights.join_count_statistics(pairs, cells, id_col="cell_id",
                                        black_col="black")
    assert res["observed_bb"] == 0 and res["observed_ww"] == 0
    assert res["observed_bw"] == 80
    assert res["joins"] == 80
    assert res["black"] == 13 and res["white"] == 12
    assert res["z_bw"] > 3  # strong negative autocorrelation


def test_multimodal_image_pipeline():
    ds = ray.data.range(50).map_batches(
        lambda b: MM.synth_media_batch(b), batch_format="pyarrow")
    emb = MM.image_embeddings(ds, out_dim=8).to_pandas()
    assert len(emb) == 50
    assert "payload" not in emb.columns  # payload dropped before shuffle
    v = np.stack(emb["embedding"].to_numpy())
    assert v.shape == (50, 8)
    # deterministic: same ids → same embeddings across runs
    emb2 = MM.image_embeddings(
        ray.data.range(50).map_batches(lambda b: MM.synth_media_batch(b),
                                       batch_format="pyarrow"),
        out_dim=8).to_pandas()
    v2 = np.stack(emb2.sort_values("media_id")["embedding"].to_numpy())
    np.testing.assert_array_equal(
        np.stack(emb.sort_values("media_id")["embedding"].to_numpy()), v2)


def test_multimodal_audio_frames():
    ds = ray.data.range(10).map_batches(
        lambda b: MM.synth_media_batch(b, kind="audio"), batch_format="pyarrow")
    frames = MM.audio_frames(ds).to_pandas()
    # 4000 samples, frame 400 hop 200 → 19 frames per item
    assert len(frames) == 10 * 19
    assert (frames["rms"] > 0).all()


def test_real_decode_raises():
    ex = MM.ImageFeatureExtractor(fake=False)
    with pytest.raises(NotImplementedError):
        ex._decode(b"xx", 4, 4)


def test_multimodal_video_frames():
    ds = ray.data.range(8).map_batches(
        lambda b: MM.synth_media_batch(b, kind="video"),
        batch_format="pyarrow")
    out = MM.video_frame_features(ds, every=4).to_pandas()
    # 16 synthetic frames sampled every 4th → 4 rows per item
    assert len(out) == 8 * 4
    assert set(out["frame"]) == {0, 4, 8, 12}
    f = np.stack(out["features"].to_numpy())
    assert f.shape == (32, 16)  # 4x4 grid-cell means
    assert ((f >= 0) & (f <= 1)).all()
    # deterministic across runs
    out2 = MM.video_frame_features(
        ray.data.range(8).map_batches(
            lambda b: MM.synth_media_batch(b, kind="video"),
            batch_format="pyarrow"), every=4).to_pandas()
    key = ["media_id", "frame"]
    np.testing.assert_array_equal(
        np.stack(out.sort_values(key)["features"].to_numpy()),
        np.stack(out2.sort_values(key)["features"].to_numpy()))


def test_multimodal_video_real_decode_raises():
    import pyarrow as pa
    import pytest as _pytest

    s = MM.VideoFrameSampler(fake=False)
    tbl = pa.table({"media_id": pa.array([1]),
                    "payload": pa.array([b"xx"], pa.binary())})
    with _pytest.raises(NotImplementedError):
        s(tbl)
