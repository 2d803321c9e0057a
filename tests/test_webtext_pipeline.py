"""End-to-end crawl curation pipeline (pipelines/webtext.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from opengxt_ray.pipelines.webtext import curate_crawl
from opengxt_ray.sources import warc as W

ROBOTS = "User-agent: *\nDisallow: /private/\n"


def _mk_shards(tmp_path, n_shards=2):
    rs = np.random.RandomState(3)
    vocab = [f"word{i}" for i in range(60)]
    paths = []
    rows = {}
    k = 0
    for s in range(n_shards):
        recs = []
        for i in range(30):
            body = " ".join(rs.choice(vocab, 60))
            if i % 10 == 0:
                body = "dup " + " ".join(vocab[:59])  # exact dup text
            if i % 7 == 0:
                url = f"https://site{s}.example/private/{i}"
            else:
                url = f"https://site{s}.example/doc/{i}"
            html = (f"<html><head><meta charset='utf-8'></head><body>"
                    f"<h1>T</h1><p>{body}</p>"
                    f"<script>skip()</script></body></html>")
            recs.append({"url": url, "payload": html.encode(),
                         "content_type": "text/html"})
            rows[url] = body
            k += 1
        p = str(tmp_path / f"s{s}.warc.gz")
        W.write_warc(p, recs, gzip_per_record=True)
        paths.append(p)
    return paths, rows


def test_curate_crawl_end_to_end(tmp_path, ray_session):
    paths, rows = _mk_shards(tmp_path)
    out = curate_crawl(paths, robots_txt=ROBOTS, min_bigrams=20,
                       ttr_num=1, ttr_den=10).take_all()
    urls = [r["url"] for r in out]
    # robots: /private/ urls dropped
    assert not any("/private/" in u for u in urls)
    # dedup: the exact-dup text survives exactly once, min url wins
    dup_urls = [u for u in urls
                if rows.get(u, "").startswith("dup ")]
    all_dup_urls = [u for u, t in rows.items()
                    if t.startswith("dup ") and "/private/" not in u]
    assert len(dup_urls) == 1
    assert dup_urls[0] == min(all_dup_urls)
    # extraction + normalization: text is the body, lowercased,
    # script dropped, "t" heading folded in front
    r0 = [r for r in out if not rows[r["url"]].startswith("dup ")][0]
    assert "skip()" not in r0["text"]
    assert rows[r0["url"]].lower().split(" ")[0] in r0["text"]
    # metrics present and integer
    assert r0["n_words"] > 0 and r0["n_bigrams"] > 0


def test_curate_crawl_checkpointed_and_resumable(tmp_path, ray_session):
    paths, _ = _mk_shards(tmp_path, n_shards=1)
    out_dir = str(tmp_path / "curated")
    ds1 = curate_crawl(paths, out_dir=out_dir, nbuckets=4,
                       min_bigrams=20, ttr_num=1, ttr_den=10)
    n1 = ds1.count()
    assert n1 > 0
    import glob
    assert len(glob.glob(f"{out_dir}/_manifest/bucket-*.json")) == 4
    # re-run: all buckets skipped, same rows
    ds2 = curate_crawl(paths, out_dir=out_dir, nbuckets=4,
                       min_bigrams=20, ttr_num=1, ttr_den=10)
    assert ds2.count() == n1


def test_curate_crawl_scratch_and_reference_lm(tmp_path, ray_session):
    """The single-pass production shape: reference LM + funnel stage
    checkpoint — results identical to the default two-pass run."""
    from opengxt_ray.textops.charlm import bigram_frequency_table
    paths, _ = _mk_shards(tmp_path, n_shards=1)
    base = sorted((r["url"], r["text"]) for r in curate_crawl(
        paths, min_bigrams=20, ttr_num=1, ttr_den=10).take_all())
    # reference LM changes only sum_freq (not membership at threshold 0)
    ref = ray.data.from_arrow(pa.table(
        {"text": ["word1 word2 " * 40]}))
    freq = bigram_frequency_table(ref)
    got = sorted((r["url"], r["text"]) for r in curate_crawl(
        paths, min_bigrams=20, ttr_num=1, ttr_den=10,
        charlm_freq=freq,
        scratch_dir=str(tmp_path / "scratch")).take_all())
    assert got == base
    import glob
    assert glob.glob(str(tmp_path / "scratch" / "_manifest" / "*.json"))
