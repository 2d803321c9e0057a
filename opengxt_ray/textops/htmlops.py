"""HTML → text extraction for web-page corpora (the input_hint's
``html:binary`` column) — pure stdlib ``html.parser``.

Semantics (deterministic, so the op is oracle-able and the
north-rule's byte-identical-text invariant is testable):

1. parse with entity decoding (``convert_charrefs=True`` — ``&amp;``
   → ``&``, numeric refs decoded);
2. drop everything inside ``script/style/noscript/template`` subtrees;
3. keep non-empty text nodes, strip each, join with single spaces;
4. collapse any remaining whitespace runs to one space.

For the synthetic pages corpus (``sources/pages.py`` wraps the text
in ``<html><body><p>…</p></body></html>``) extraction reproduces the
``text`` column byte-for-byte — tested in
``tests/test_pages_invariant.py``. Boilerplate RANKING
(readability-style content scoring) is out of scope — this is the
extraction layer a quality classifier sits on top of.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
_WS = re.compile(r"\s+")


class _TextCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self.chunks: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            d = data.strip()
            if d:
                self.chunks.append(d)


def extract_text(html) -> str:
    """One document's HTML (str or bytes) → normalized text."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _TextCollector()
    p.feed(html)
    p.close()
    return _WS.sub(" ", " ".join(p.chunks)).strip()


class HtmlTextExtractor:
    """Actor-pool stage: html binary column → extracted text column.
    Parser machinery and the whitespace regex live per actor; the
    per-batch loop is per-document (HTML parsing is inherently
    sequential per doc — the standard shape for extraction stages)."""

    def __init__(self, *, html_col: str = "html",
                 out_col: str = "text_extracted",
                 drop_payload: bool = True):
        self.html_col = html_col
        self.out_col = out_col
        self.drop_payload = drop_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch[self.html_col].to_pylist()]
        out = batch.append_column(self.out_col,
                                  pa.array(texts, pa.string()))
        if self.drop_payload:
            out = out.drop_columns([self.html_col])
        return out


def html_to_text(ds, *, html_col: str = "html",
                 out_col: str = "text_extracted", concurrency=None,
                 batch_size: int | None = 256,
                 drop_payload: bool = True):
    """Distributed extraction: actor pool, small batches (html payloads
    are large). The multi-KB html payload column is DROPPED from the
    stage output by default (SURVEY §7.4: wide binary stays OUT of
    shuffles — an uncareful downstream groupby would otherwise ship
    it); pass ``drop_payload=False`` to keep it."""
    from ..core.util import default_concurrency

    return ds.map_batches(
        HtmlTextExtractor,
        fn_constructor_kwargs=dict(html_col=html_col, out_col=out_col,
                                   drop_payload=drop_payload),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
