"""URL operators (textops/urlops.py): parse + normalize edge cases."""

import pyarrow as pa

from opengxt_ray.textops.urlops import normalize_url_batch, parse_url_batch


def test_parse_edges():
    t = pa.table({"url": pa.array([
        "https://Host3.Example.com/p/42?q=1",
        "http://user:pw@sub.a.b.co:8080/x/y/z/#frag",
        "https://example.org/",
        "https://example.org",
        "HTTP://WWW.FOO.COM:80/A/B/?x=2#y",
    ])})
    p = parse_url_batch(t)
    assert p["host"].to_pylist() == [
        "host3.example.com", "sub.a.b.co", "example.org", "example.org",
        "www.foo.com"]
    assert p["domain"].to_pylist() == [
        "example.com", "b.co", "example.org", "example.org", "foo.com"]
    assert p["path_depth"].to_pylist() == [2, 3, 0, 0, 2]
    assert p["has_query"].to_pylist() == [True, False, False, False, True]


def test_normalize():
    t = pa.table({"url": pa.array([
        "HTTPS://Example.COM:443/a/b/?q=1#frag",
        "http://example.com:80/",
        "https://example.com/path/",
        "https://example.com/path",
    ])})
    n = normalize_url_batch(t)["norm_url"].to_pylist()
    assert n == [
        "https://example.com/a/b?q=1",
        "http://example.com/",
        "https://example.com/path",
        "https://example.com/path",
    ]


def test_repetition_signals_known_values():
    import numpy as np

    from opengxt_ray.textops.quality import repetition_signals_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4]), "text": pa.array([
        "a b a b a b",          # bigram "a b" x3 of 5 slots
        "x y z w",              # all unique
        "q",                    # single word
        "r r r r",              # one word repeated
    ])})
    out = repetition_signals_batch(t).to_pandas()
    assert out["n_words"].tolist() == [6, 4, 1, 4]
    np.testing.assert_allclose(out["uniq_frac6"],
                               [2 / 6, 1.0, 1.0, 0.25], atol=1e-6)
    np.testing.assert_allclose(out["top_bigram_frac6"],
                               [3 / 5, 1 / 3, 0.0, 1.0], atol=1e-6)


def test_redact_pii_cases():
    from opengxt_ray.textops.urlops import redact_pii_batch

    t = pa.table({"text": pa.array([
        "contact me at jo.doe+spam@mail.example.co or 192.168.0.1",
        "call +1-555 123 4567 today; backup 10.0.0.255 x",
        "clean text stays",
        "two mails a@b.io c@d.org and 8.8.8.8 8.8.4.4",
    ])})
    out = redact_pii_batch(t)["text"].to_pylist()
    assert out == [
        "contact me at <EMAIL> or <IP>",
        "call <PHONE> today; backup <IP> x",
        "clean text stays",
        "two mails <EMAIL> <EMAIL> and <IP> <IP>",
    ]


def test_normalize_port_is_scheme_conditioned():
    """Round-5 fix: only the SCHEME's default port is dropped —
    http://h:443 and https://h:80 stay distinct resources."""
    t = pa.table({"url": pa.array([
        "http://example.com:443/x",
        "https://example.com:80/x",
        "ftp://example.com:80/x",
        "http://example.com:80/x",
        "https://example.com:443/x",
    ])})
    n = normalize_url_batch(t)["norm_url"].to_pylist()
    assert n == [
        "http://example.com:443/x",
        "https://example.com:80/x",
        "ftp://example.com:80/x",
        "http://example.com/x",
        "https://example.com/x",
    ]


def test_registrable_domain_psl_cases():
    """Round-5: embedded PSL subset — co.uk-style suffixes take three
    labels; plain TLDs take two; 2-label hosts pass through."""
    from opengxt_ray.textops.urlops import registrable_domain

    hosts = pa.array([
        "bbc.co.uk", "www.bbc.co.uk", "deep.sub.bbc.co.uk",
        "example.org", "www.example.org",
        "site.com.au", "a.b.site.co.jp", "news.org.uk",
        "co.uk",                 # bare suffix: unchanged
        "host.example.com",      # generic: two labels
        "x.gov.uk", "portal.gob.mx", "shop.com.br",
    ])
    got = registrable_domain(hosts).to_pylist()
    assert got == [
        "bbc.co.uk", "bbc.co.uk", "bbc.co.uk",
        "example.org", "example.org",
        "site.com.au", "site.co.jp", "news.org.uk",
        "co.uk",
        "example.com",
        "x.gov.uk", "portal.gob.mx", "shop.com.br",
    ]


def test_parse_url_batch_uses_psl():
    t = pa.table({"url": pa.array([
        "https://www.bbc.co.uk/news/uk-1234",
        "https://host1.example.com/p/1",
    ])})
    p = parse_url_batch(t)
    assert p["domain"].to_pylist() == ["bbc.co.uk", "example.com"]
