"""WARC source/sink (sources/warc.py): round trips (plain + per-record
gzip), HTTP stripping, Ray Dataset reads with column pruning, and
malformed-input behavior."""

import gzip

import numpy as np
import pytest

from opengxt_ray.sources import warc as W


def _recs(n, tag=""):
    return [{"url": f"https://host{i % 7}.example/p{tag}{i}",
             "date": f"2025-06-0{1 + i % 9}T00:00:0{i % 10}Z",
             "payload": (f"<html><body>doc {tag}{i} "
                         + "x" * (i * 13 % 400)
                         + "</body></html>").encode()}
            for i in range(n)]


@pytest.mark.parametrize("suffix", [".warc", ".warc.gz"])
def test_roundtrip(tmp_path, suffix):
    path = str(tmp_path / f"shard{suffix}")
    recs = _recs(25)
    assert W.write_warc(path, recs) == 25
    back = list(W.iter_warc(path))
    assert len(back) == 25
    for r, b in zip(recs, back):
        assert b["url"] == r["url"]
        assert b["date"] == r["date"]
        status, body = W.strip_http(b["payload"])
        assert status == 200
        assert body == r["payload"]


def test_gzip_is_per_record_members(tmp_path):
    """Common-Crawl layout: each record is its own gzip member —
    decompressing only the first member yields exactly one record."""
    path = str(tmp_path / "s.warc.gz")
    W.write_warc(path, _recs(5))
    with open(path, "rb") as f:
        data = f.read()
    # one gzip magic per record
    assert data.count(b"\x1f\x8b\x08") == 5
    first = gzip.decompress(data)  # stdlib reads ALL members
    assert first.count(b"WARC/1.0") == 5


def test_want_payload_false_skips_bodies(tmp_path):
    path = str(tmp_path / "s.warc")
    W.write_warc(path, _recs(10))
    back = list(W.iter_warc(path, want_payload=False))
    assert len(back) == 10
    assert all(b["payload"] == b"" for b in back)
    assert back[3]["url"].endswith("/p3")


def test_truncated_raises(tmp_path):
    path = str(tmp_path / "s.warc")
    W.write_warc(path, _recs(3))
    with open(path, "rb") as f:
        data = f.read()
    cut = str(tmp_path / "cut.warc")
    with open(cut, "wb") as f:
        f.write(data[:len(data) - 60])
    with pytest.raises(ValueError):
        list(W.iter_warc(cut))
    junk = str(tmp_path / "junk.warc")
    with open(junk, "wb") as f:
        f.write(b"NOT A WARC FILE\r\n")
    with pytest.raises(ValueError):
        list(W.iter_warc(junk))


def test_warc_dataset_multi_shard_and_pruning(tmp_path, ray_session):
    paths = []
    for s in range(3):
        p = str(tmp_path / f"shard{s}.warc.gz")
        W.write_warc(p, _recs(20, tag=f"s{s}-"))
        paths.append(p)
    ds = W.warc_dataset(paths)
    df = ds.to_pandas()
    assert len(df) == 60
    assert set(df.columns) == {"url", "date", "rec_type", "status",
                               "payload"}
    assert (df["status"] == 200).all()
    assert df["payload"].str.len().min() > 0
    # pruned read: no payload/status columns requested
    slim = W.warc_dataset(paths, columns=["url", "date"]).to_pandas()
    assert list(slim.columns) == ["url", "date"]
    assert sorted(slim["url"]) == sorted(df["url"])
    with pytest.raises(ValueError, match="unknown WARC columns"):
        W.warc_dataset(paths, columns=["nope"])


def test_warc_feeds_html_extract(tmp_path, ray_session):
    """End-to-end: WARC shard → warc_dataset → html_to_text — the
    ingest path a real crawl pipeline runs."""
    import pyarrow as pa

    from opengxt_ray.textops.htmlops import html_to_text

    p = str(tmp_path / "s.warc.gz")
    W.write_warc(p, _recs(12))
    ds = W.warc_dataset([p], columns=["url", "payload"]).map_batches(
        lambda b: pa.table({"url": b["url"], "html": b["payload"]}),
        batch_format="pyarrow")
    out = html_to_text(ds, html_col="html", out_col="text").to_pandas()
    assert len(out) == 12
    assert out["text"].str.contains("doc ").all()
    assert "html" not in out.columns  # payload projected out by default
