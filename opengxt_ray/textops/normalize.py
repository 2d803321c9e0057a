"""Text normalization for crawl corpora: Unicode NFC/NFKC, whitespace
squashing, lowercasing — the canonicalization pass that runs before
any exact/fuzzy dedup key is computed (mojibake and combining-mark
variants otherwise defeat exact dedup).

Stateless vectorized-ish batch map (``unicodedata.normalize`` is
per-string C code; the loop is the same inherent-string-work envelope
as the shingle stages). SQL parity: DuckDB ``nfc_normalize`` + ``lower``
+ ``regexp_replace(.., '\\s+', ' ', 'g')`` — the gate keeps inputs in
the range where Python ``str.lower`` and DuckDB ``lower`` agree
(Latin incl. accented; locale-special cases like dotted-I differ and
are documented out).

No reference counterpart; nearest analog is the string expression
functions in the filter engine (GT/function StringFunctions)."""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa

_WS = re.compile(r"\s+")


def normalize_text_batch(batch: pa.Table, *, text_col: str = "text",
                         out_col: str | None = None, form: str = "NFC",
                         lowercase: bool = True,
                         squash_ws: bool = True) -> pa.Table:
    """Append (or replace) the normalized text column."""
    out = []
    for t in batch[text_col].to_pylist():
        s = unicodedata.normalize(form, t or "")
        if lowercase:
            s = s.lower()
        if squash_ws:
            s = _WS.sub(" ", s).strip()
        out.append(s)
    col = pa.array(out, pa.string())
    name = out_col or text_col
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, col)
    return batch.append_column(name, col)


def normalize_texts(ds, *, text_col: str = "text",
                    out_col: str | None = None, form: str = "NFC",
                    lowercase: bool = True, squash_ws: bool = True):
    return ds.map_batches(
        lambda b: normalize_text_batch(
            b, text_col=text_col, out_col=out_col, form=form,
            lowercase=lowercase, squash_ws=squash_ws),
        batch_format="pyarrow")
