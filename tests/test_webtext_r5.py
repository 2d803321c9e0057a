"""Round-5 webtext operators: char-LM scoring, incremental
(crawl-delta) dedup with Bloom prefilter, robots.txt filtering."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray

from opengxt_ray.textops.charlm import (bigram_frequency_table,
                                        charlm_score)
from opengxt_ray.textops.dedup import (build_bloom, incremental_dedup,
                                       word_bag_key_batch)
from opengxt_ray.textops.urlops import (match_robots_batch, parse_robots,
                                        robots_filter)


# ---------------------------------------------------------------------------
# charlm
# ---------------------------------------------------------------------------

def _brute_charlm(texts):
    cnt = Counter()
    for t in texts:
        for i in range(len(t) - 1):
            cnt[t[i:i + 2]] += 1
    return {
        d: (max(len(t) - 1, 0),
            sum(cnt[t[i:i + 2]] for i in range(len(t) - 1)))
        for d, t in enumerate(texts)
    }


def test_charlm_matches_brute_force(ray_session):
    texts = ["hello world", "h", "", "hello hello", "xyzzy",
             "ab" * 50, "the quick brown fox", "the quick brown fox"]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(len(texts))), "text": texts})).repartition(3)
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_freq"])
           for r in charlm_score(ds).take_all()}
    assert got == _brute_charlm(texts)


def test_charlm_unicode_and_reference_freq(ray_session):
    # non-ASCII code points survive the utf-32 packing
    texts = ["héllo wörld", "héllo", "日本語のテキスト"]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": [0, 1, 2], "text": texts}))
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_freq"])
           for r in charlm_score(ds).take_all()}
    assert got == _brute_charlm(texts)
    # CCNet shape: score target docs under a separate reference LM
    ref = ray.data.from_arrow(pa.table(
        {"doc_id": [0], "text": ["hello hello hello"]}))
    freq = bigram_frequency_table(ref)
    tgt = ray.data.from_arrow(pa.table(
        {"doc_id": [0, 1], "text": ["hello", "zzzz"]}))
    rows = {r["doc_id"]: r["sum_freq"]
            for r in charlm_score(tgt, freq=freq).take_all()}
    assert rows[0] > 0 and rows[1] == 0  # 'zz' unseen in reference


def test_charlm_vocab_cap(ray_session):
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": [0], "text": ["abcdefgh"]}))
    with pytest.raises(ValueError, match="vocabulary"):
        bigram_frequency_table(ds, max_vocab=3)


# ---------------------------------------------------------------------------
# incremental dedup
# ---------------------------------------------------------------------------

def test_incremental_dedup_exact_vs_brute(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    old_texts = [" ".join(rng.choice(vocab, 4)) for _ in range(60)]
    new_texts = [" ".join(rng.choice(vocab, 4)) for _ in range(60)]
    old = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(1000, 1060)),
         "text": old_texts})).repartition(4)
    new = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(60)), "text": new_texts})).repartition(4)
    out = sorted(r["doc_id"] for r in
                 incremental_dedup(new, old).take_all())
    old_set = set(old_texts)
    exp = sorted(i for i, t in enumerate(new_texts) if t not in old_set)
    assert out == exp
    assert len(exp) < 60  # the fixture really collides


def test_incremental_dedup_bag_key(ray_session):
    old = ray.data.from_arrow(pa.table(
        {"doc_id": [10, 11], "text": ["b a c", "q r"]}))
    new = ray.data.from_arrow(pa.table(
        {"doc_id": [0, 1, 2], "text": ["a b c", "a c b b", "x y"]}))
    bag = lambda d: d.map_batches(word_bag_key_batch,
                                  batch_format="pyarrow")
    out = sorted(r["doc_id"] for r in incremental_dedup(
        bag(new), bag(old), key_col="bag_key").take_all())
    # both word-permuted/duplicated variants of {a,b,c} collide with old
    assert out == [2]


def test_bloom_no_false_negatives(ray_session):
    texts = [f"doc number {i}" for i in range(500)]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(500)), "text": texts})).repartition(5)
    bm = build_bloom(ds, key_col="text", bloom_bits=1 << 16)
    from opengxt_ray.core.fid import hash_strings
    from opengxt_ray.textops.dedup import _bloom_positions
    h = hash_strings(texts)
    lo, hi = _bloom_positions(h, 1 << 16)
    hit = (((bm[lo >> 3] >> (lo & 7)) & 1)
           & ((bm[hi >> 3] >> (hi & 7)) & 1))
    assert hit.all()  # a Bloom filter NEVER misses a member


# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------

ROBOTS = """
# comments are ignored
User-agent: googlebot
Disallow: /g/

User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow: /cgi-bin/
Allow: /static/
Disallow: /static/img/
Allow: /tmp/
Disallow: /tmp/
Disallow: /*.pdf$
Disallow:
"""


def test_parse_robots_group_selection():
    assert parse_robots(ROBOTS, "googlebot-news") == [("/g/", False)]
    star = parse_robots(ROBOTS, "otherbot")
    assert ("/private/", False) in star and ("/*.pdf$", False) in star
    # empty Disallow (allow-all idiom) dropped
    assert ("", False) not in star and ("", True) not in star


def test_match_robots_semantics():
    rules = parse_robots(ROBOTS)
    paths = ["/", "/private/data/1", "/private/pub/x.html",
             "/cgi-bin/run", "/static/img/a.png", "/static/css/a.css",
             "/tmp/x", "/docs/file.pdf", "/docs/file.pdfx"]
    out = match_robots_batch(pa.table({"path": paths}), rules)
    assert out["allowed"].to_pylist() == [
        True, False, True, False, False, True,
        True,   # equal-length Allow/Disallow tie → Allow (RFC 9309)
        False,  # '*.pdf$' wildcard + anchor
        True,   # anchor prevents prefix overreach
    ]
    assert out["match_len"].to_pylist()[0] == 0  # no rule matched '/'


def test_robots_filter_dataset(ray_session):
    ds = ray.data.from_arrow(pa.table(
        {"path": ["/private/a", "/ok", "/cgi-bin/x", "/static/s.css"]}))
    kept = sorted(r["path"] for r in
                  robots_filter(ds, ROBOTS).take_all())
    assert kept == ["/ok", "/static/s.css"]
    audit = robots_filter(ds, ROBOTS, keep_denied=True)
    assert audit.count() == 4


def test_charlm_keep_cols_pass_through(ray_session):
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": [0, 1], "text": ["ab ab", "cd"],
         "extra": [7, 9]}))
    rows = sorted(charlm_score(ds, keep_cols=("extra",)).take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["extra"] for r in rows] == [7, 9]
    assert set(rows[0]) == {"doc_id", "n_bigrams", "sum_freq", "extra"}


# ---------------------------------------------------------------------------
# term statistics / keywords
# ---------------------------------------------------------------------------

def test_top_terms_and_keywords_brute(ray_session):
    from collections import Counter

    from opengxt_ray.textops.terms import doc_keywords, top_terms
    texts = ["a b b c", "b c c d", "a a a", "", "x y z z"]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(5)), "text": texts})).repartition(3)
    tt = top_terms(ds, k=3)
    cnt = Counter(w for t in texts for w in (t.split(" ") if t else []))
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(tt["term"].to_pylist(), tt["cnt"].to_pylist())) == exp
    # keywords: doc 0 → tf b=2 then (a,c tf=1; df a=2 < c=2? a==c → term)
    df = Counter(w for t in texts for w in set(t.split(" ") if t else []))
    rows = doc_keywords(ds, k=2).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"]))
    for d, t in enumerate(texts):
        ws = t.split(" ") if t else []
        tfs = Counter(ws)
        exp_rank = sorted(((term, tf, df[term]) for term, tf in
                           tfs.items()),
                          key=lambda x: (-x[1], x[2], x[0]))[:2]
        got = sorted(by_doc.get(d, []),
                     key=lambda x: (-x[1], x[2], x[0]))
        assert got == exp_rank, (d, got, exp_rank)
    assert 3 not in by_doc  # empty doc yields no keywords


# ---------------------------------------------------------------------------
# sketches: count-min + HyperLogLog
# ---------------------------------------------------------------------------

def _skewed_words(n):
    """Zipf-ish corpus: word w{i} appears with frequency ∝ 1/(i+1)."""
    rng = np.random.default_rng(13)
    z = rng.zipf(1.5, size=n)
    return [f"w{min(int(v), 500)}" for v in z]


def test_cms_never_undercounts_and_bounded(ray_session):
    from collections import Counter

    from opengxt_ray.textops.sketch import cms_build, cms_query
    words = _skewed_words(30_000)
    true = Counter(words)
    ds = ray.data.from_arrow(pa.table({"w": words})).repartition(6)
    cms = cms_build(ds, col="w", width=4096, depth=4)
    items = list(true)
    est = cms_query(cms, items)
    t = np.array([true[w] for w in items])
    assert (est >= t).all()                      # CMS guarantee
    # ε·N bound with ε = e/width, failure prob δ = e^-depth per item;
    # allow the expected handful of tail misses
    eps_n = np.e / 4096 * len(words)
    assert (est - t <= eps_n).mean() > 0.95
    assert cms.sum() == 4 * len(words)           # mass conservation


def test_cms_sharded_build_is_exact_merge(ray_session):
    from opengxt_ray.textops.sketch import cms_build
    words = _skewed_words(5_000)
    t = pa.table({"w": words})
    one = cms_build(ray.data.from_arrow(t), col="w", width=512, depth=3)
    many = cms_build(ray.data.from_arrow(t).repartition(11),
                     col="w", width=512, depth=3)
    assert (one == many).all()   # addition merge is exact


def test_cms_weighted(ray_session):
    from opengxt_ray.textops.sketch import cms_build, cms_query
    t = pa.table({"w": ["a", "b", "a"], "n": [5, 7, 1]})
    cms = cms_build(ray.data.from_arrow(t), col="w", weight_col="n",
                    width=256, depth=4)
    est = cms_query(cms, ["a", "b"])
    assert est[0] >= 6 and est[1] >= 7
    assert cms.sum() == 4 * 13


def test_hll_accuracy_and_merge(ray_session):
    from opengxt_ray.textops.sketch import (hll_build, hll_distinct,
                                            hll_estimate)
    n_distinct = 30_000
    vals = [f"item-{i % n_distinct}" for i in range(60_000)]
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    est = hll_distinct(ds, col="v", p=12)
    # 1.04/sqrt(4096) ≈ 1.6% std error; allow 5%
    assert abs(est - n_distinct) / n_distinct < 0.05
    # merge law: max of shard registers == whole-corpus registers
    a = hll_build(ray.data.from_arrow(pa.table({"v": vals[:30_000]})),
                  col="v", p=10)
    b = hll_build(ray.data.from_arrow(pa.table({"v": vals[30_000:]})),
                  col="v", p=10)
    whole = hll_build(ray.data.from_arrow(pa.table({"v": vals})),
                      col="v", p=10)
    assert (np.maximum(a, b) == whole).all()
    # small-range correction: tiny sets are near-exact
    small = hll_build(ray.data.from_arrow(
        pa.table({"v": [f"x{i}" for i in range(100)]})), col="v", p=12)
    assert abs(hll_estimate(small) - 100) < 3


def test_normalize_texts(ray_session):
    from opengxt_ray.textops.normalize import normalize_texts
    raw = ["CAFÉ  x\tY ", "", "A B", "nfkc ﬁ"]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": [0, 1, 2, 3], "text": raw}))
    rows = sorted(normalize_texts(ds).take_all(),
                  key=lambda r: r["doc_id"])
    assert rows[0]["text"] == "café x y"
    assert rows[1]["text"] == ""
    assert rows[2]["text"] == "a b"      # NBSP is \s in Python re
    assert rows[3]["text"] == "nfkc ﬁ"   # NFC keeps the ligature...
    rows = sorted(normalize_texts(ds, form="NFKC").take_all(),
                  key=lambda r: r["doc_id"])
    assert rows[3]["text"] == "nfkc fi"  # ...NFKC folds it


def test_cap_per_key_matches_brute(ray_session):
    from opengxt_ray.textops.dedup import cap_per_key
    rng = np.random.default_rng(3)
    keys = [f"dom{int(k)}" for k in rng.integers(0, 7, 200)]
    ids = rng.permutation(200)
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "source": pa.array(keys, pa.string())})).repartition(5)
    got = sorted((r["source"], r["doc_id"]) for r in
                 cap_per_key(ds, key_col="source", n=5).take_all())
    exp = []
    from collections import defaultdict
    per = defaultdict(list)
    for k, i in zip(keys, ids):
        per[k].append(int(i))
    for k, v in per.items():
        exp.extend((k, i) for i in sorted(v)[:5])
    assert got == sorted(exp)
    # n larger than any group: everything survives
    assert cap_per_key(ds, key_col="source", n=999).count() == 200


def test_inverted_index_brute(ray_session):
    from opengxt_ray.textops.terms import inverted_index
    texts = ["a b a", "b c", "", "c a"]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": [10, 20, 30, 40], "text": texts})).repartition(3)
    rows = {r["term"]: (r["n_docs"], r["postings"])
            for r in inverted_index(ds).take_all()}
    assert rows == {"a": (2, "10,40"), "b": (2, "10,20"),
                    "c": (2, "20,40")}


def test_cohort_retention_brute(ray_session):
    import datetime as dt

    from opengxt_ray.ops.histogram import cohort_retention
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base), (1, base + dt.timedelta(days=1)),
        (1, base + dt.timedelta(days=1, hours=5)),   # same (u, day)
        (2, base), (2, base + dt.timedelta(days=3)),
        (3, base + dt.timedelta(days=1)),            # later cohort
    ]
    t = pa.table({"user_id": pa.array([u for u, _ in rows], pa.int64()),
                  "ts": pa.array([ts for _, ts in rows],
                                 pa.timestamp("us"))})
    out = cohort_retention(ray.data.from_arrow(t).repartition(2))
    got = {(r["cohort_day"], r["offs"]): r["count()"]
           for r in out.take_all()}
    d0 = (base - dt.datetime(1970, 1, 1)).days
    assert got == {(d0, 0): 2, (d0, 1): 1, (d0, 3): 1,
                   (d0 + 1, 0): 1}
