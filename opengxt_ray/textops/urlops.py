"""URL operators for web-page corpora (the input_hint's ``url``
column): parse, normalize, and derive grouping keys — all vectorized
pyarrow.compute RE2 kernels (no per-row Python in the hot path).

Engine extension (the reference has no web-text surface); a crawl
pipeline needs these for per-host sharding, per-domain dedup scopes,
and URL canonicalization before exact dedup. RE2 semantics match
DuckDB's regexp functions, so the parse is SQL-oracle-checkable
(gate query ``url_parse``).

Domain extraction is the last-two-labels heuristic — the public
suffix list is not in this container (documented envelope: ``co.uk``
style suffixes fold into the wrong registrable domain).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def parse_url_batch(batch: pa.Table, *, url_col: str = "url") -> pa.Table:
    """Append host, domain, path_depth, has_query columns."""
    u = pc.utf8_lower(batch[url_col])
    rest = pc.replace_substring_regex(u, r"^[a-z][a-z0-9+.-]*://", "")
    host = pc.replace_substring_regex(rest, r"[/?#].*$", "")
    host = pc.replace_substring_regex(host, r"^[^@]*@", "")   # userinfo
    host = pc.replace_substring_regex(host, r":[0-9]+$", "")  # port
    domain = pc.replace_substring_regex(
        host, r"^.*\.([^.]+\.[^.]+)$", r"\1")
    path = pc.replace_substring_regex(rest, r"^[^/?#]*", "")
    path_only = pc.replace_substring_regex(path, r"[?#].*$", "")
    # depth = number of non-empty segments
    stripped = pc.replace_substring_regex(path_only, r"/+$", "")
    stripped = pc.replace_substring_regex(stripped, r"^/+", "")
    n = pc.utf8_length(stripped)
    slashes = pc.subtract(
        n, pc.utf8_length(pc.replace_substring(stripped, "/", "")))
    depth = pc.if_else(pc.equal(n, 0), pa.scalar(0, pa.int64()),
                       pc.add(pc.cast(slashes, pa.int64()), 1))
    has_query = pc.match_substring_regex(path, r"\?")
    out = batch
    for name, col in (("host", host), ("domain", domain),
                      ("path_depth", depth), ("has_query", has_query)):
        out = out.append_column(name, col)
    return out


def normalize_url_batch(batch: pa.Table, *, url_col: str = "url",
                        out_col: str = "norm_url") -> pa.Table:
    """Canonical form for exact dedup: lowercase scheme+host, default
    ports dropped, fragment stripped, trailing slash trimmed from
    non-root paths, query preserved (order untouched — reordering
    changes semantics on some sites)."""
    u = batch[url_col]
    scheme = pc.utf8_lower(pc.replace_substring_regex(
        u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$", r"\1"))
    rest = pc.replace_substring_regex(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = pc.utf8_lower(pc.replace_substring_regex(
        rest, r"[/?#].*$", ""))
    # drop the port only when it is the SCHEME's default — http://h:443
    # and https://h:80 are distinct resources and must stay distinct
    hostport = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(hostport, r":80$", ""),
        pc.if_else(pc.equal(scheme, "https"),
                   pc.replace_substring_regex(hostport, r":443$", ""),
                   hostport))
    tail = pc.replace_substring_regex(rest, r"^[^/?#]*", "")
    tail = pc.replace_substring_regex(tail, r"#.*$", "")       # fragment
    tail = pc.replace_substring_regex(tail, r"^(/.+?)/+(\?|$)", r"\1\2")
    norm = pc.binary_join_element_wise(
        scheme, pa.array(["://"] * len(u)).cast(pa.string()), hostport,
        tail.cast(pa.string()), "")
    return batch.append_column(out_col, norm)


def parse_urls(ds, *, url_col: str = "url"):
    return ds.map_batches(
        lambda b: parse_url_batch(b, url_col=url_col),
        batch_format="pyarrow")


def normalize_urls(ds, *, url_col: str = "url", out_col: str = "norm_url"):
    return ds.map_batches(
        lambda b: normalize_url_batch(b, url_col=url_col, out_col=out_col),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII redaction (Dolma/ROOTS-style pre-training scrub — public rules)
# ---------------------------------------------------------------------------

#: pattern → replacement; applied in order. RE2 syntax (pyarrow and
#: DuckDB both run RE2, so the same pattern strings give identical
#: matches — the op is SQL-oracle-exact by construction).
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d{1,3}[-. ]\(?\d{2,4}\)?[-. ]\d{3,4}[-. ]\d{3,4}\b",
     "<PHONE>"),
)


def redact_pii_batch(batch: pa.Table, *, text_col: str = "text",
                     out_col: str | None = None) -> pa.Table:
    """Mask emails / IPv4s / phone-shaped numbers with typed tokens —
    vectorized RE2 kernels, applied in rule order."""
    out_col = out_col or text_col
    t = batch[text_col]
    for pat, repl in PII_RULES:
        t = pc.replace_substring_regex(t, pat, repl)
    if out_col in batch.column_names:
        return batch.set_column(batch.column_names.index(out_col),
                                out_col, t)
    return batch.append_column(out_col, t)


def redact_pii(ds, *, text_col: str = "text", out_col: str | None = None):
    return ds.map_batches(
        lambda b: redact_pii_batch(b, text_col=text_col, out_col=out_col),
        batch_format="pyarrow")
