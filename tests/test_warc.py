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


# ---------------------------------------------------------------------------
# CDX index + random access + charset decode (round 5)
# ---------------------------------------------------------------------------

def test_surt_key():
    from opengxt_ray.sources.warc import surt_key
    assert surt_key("https://www.Example.co.uk/A?q=1") == \
        "uk,co,example)/a?q=1"
    assert surt_key("http://host.com:80/x") == "com,host)/x"
    assert surt_key("http://host.com:8080/") == "com,host:8080)/"
    assert surt_key("https://www.org/") == "org,www)/"  # www IS the host


def test_cdx_roundtrip_and_random_access(tmp_path):
    from opengxt_ray.sources import warc as W
    p = str(tmp_path / "s.warc.gz")
    recs = [{"url": f"https://site{i % 3}.example/p/{i}",
             "payload": f"content {i}".encode()} for i in range(25)]
    W.write_warc(p, recs, gzip_per_record=True)
    cdx = W.build_cdx(p)
    assert len(cdx) == 25
    # offsets tile the file exactly (member lengths sum to file size)
    import os
    assert cdx[-1]["offset"] + cdx[-1]["length"] == os.path.getsize(p)
    for i, e in enumerate(cdx):
        rec = W.read_warc_at(p, e["offset"], e["length"])
        _, body = W.strip_http(rec["payload"])
        assert body == f"content {i}".encode()
    import base64
    import hashlib
    assert cdx[7]["digest"] == base64.b32encode(
        hashlib.sha1(b"content 7").digest()).decode()
    assert cdx[0]["timestamp"] == "20250601000000"


def test_cdx_dataset_parallel(tmp_path, ray_session):
    from opengxt_ray.sources import warc as W
    paths = []
    for s in range(3):
        p = str(tmp_path / f"shard-{s}.warc.gz")
        W.write_warc(p, [{"url": f"https://h/{s}/{i}",
                          "payload": b"x" * (i + 1)}
                         for i in range(10)], gzip_per_record=True)
        paths.append(p)
    ds = W.cdx_dataset(paths)
    rows = ds.take_all()
    assert len(rows) == 30
    assert {r["filename"] for r in rows} == {
        "shard-0.warc.gz", "shard-1.warc.gz", "shard-2.warc.gz"}
    # the index is actually usable for fetch
    r = [x for x in rows if x["url"] == "https://h/2/4"][0]
    rec = W.read_warc_at(str(tmp_path / r["filename"]),
                         r["offset"], r["length"])
    _, body = W.strip_http(rec["payload"])
    assert body == b"xxxxx"


def test_charset_sniffing_precedence():
    from opengxt_ray.sources.warc import sniff_charset
    assert sniff_charset(b"\xef\xbb\xbfabc") == "utf-8-sig"
    assert sniff_charset(b"\xff\xfea\x00") == "utf-16-le"
    assert sniff_charset(b"x", "text/html; charset=ISO-8859-1") == \
        "iso-8859-1"
    assert sniff_charset(b'<META CHARSET="Shift_JIS">') == "shift_jis"
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1251">') == "windows-1251"
    assert sniff_charset("héllo".encode()) == "utf-8"
    assert sniff_charset(b"\xe9\xe9") == "latin-1"


def test_decode_payloads_never_raises(ray_session):
    import pyarrow as pa
    import ray

    from opengxt_ray.sources.warc import decode_payloads
    batch = pa.table({"payload": [
        b"caf\xe9",                        # latin-1
        "naïve".encode("utf-8"),           # utf-8
        b"",                               # empty
        b'<meta charset="nosuch-enc">x',   # bogus declared charset
        "日本".encode("utf-8"),             # multibyte
    ]})
    out = decode_payloads(ray.data.from_arrow(batch)).take_all()
    texts = [r["text"] for r in out]
    assert texts[0] == "café" and texts[1] == "naïve"
    assert texts[4] == "日本"
    assert all(isinstance(t, str) for t in texts)


def test_warc_dataset_indexed_matches_plain(tmp_path, ray_session):
    """CDX-driven byte-range reads return EXACTLY the rows of the
    plain shard reader, with record-bounded task parallelism."""
    paths = []
    for s in range(2):
        p = str(tmp_path / f"ix{s}.warc.gz")
        W.write_warc(p, [{"url": f"https://x/{s}/{i}",
                          "payload": f"body {s}-{i}".encode() * (i + 1)}
                         for i in range(40)], gzip_per_record=True)
        paths.append(p)
    cdx = [r for p in paths for r in W.build_cdx(p)]
    plain = sorted((r["url"], r["payload"]) for r in W.warc_dataset(
        paths, columns=["url", "payload"]).take_all())
    # tiny target_bytes → MANY spans (record-bounded parallelism)
    import os
    bypath = {os.path.basename(p): p for p in paths}
    spans = W.cdx_spans(bypath, cdx, target_bytes=512)
    assert len(spans) > 10        # far more tasks than 2 shards
    ds = W.warc_dataset_indexed(paths, cdx,
                                columns=["url", "payload"],
                                target_bytes=512)
    indexed = sorted((r["url"], r["payload"]) for r in ds.take_all())
    assert indexed == plain
    # status column parses through the indexed path too
    st = W.warc_dataset_indexed(paths, cdx,
                                columns=["url", "status"]).take_all()
    assert all(r["status"] == 200 for r in st)
