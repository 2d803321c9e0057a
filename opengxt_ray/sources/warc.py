"""WARC (ISO 28500) source/sink — the container format Common-Crawl
pages actually arrive in, pure stdlib (gzip + io).

The reference engine reads its features from Shapefile/GeoJSON/WPS
PPIOs (GS/ppio/*); a web-scale pages pipeline instead starts from
.warc / .warc.gz shards, so this closes the ingest gap for the
input_hint table: WARC shards → Arrow batches of
``url / warc_ts(date) / payload`` that feed the same html_to_text /
geocode / join stages as the parquet path.

Scale design:
- One read task per shard (Common-Crawl shards are ~1 GB and
  independently gzipped per record, i.e. concatenated gzip members —
  ``gzip.GzipFile`` decodes member streams natively), so a 100 TB
  crawl parallelizes across its ~100k shards with no coordination.
- The shard reader is a GENERATOR ``map_batches`` UDF: records stream
  out in bounded ``batch_rows`` chunks instead of materializing a
  whole decompressed shard in the worker heap.
- ``columns=`` prunes at the read: when the payload column is not
  requested the body bytes are skipped (seek-forward), not carried.

Writer exists for fixtures/round-trips (and as the export sink):
deterministic record ids (uuid5 of url+date), per-record gzip members
(Common-Crawl layout) or plain concatenation.
"""

from __future__ import annotations

import gzip
import io
import uuid

import pyarrow as pa

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _http_response(body: bytes, content_type: str) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode("ascii")
            + b"\r\nContent-Length: " + str(len(body)).encode("ascii")
            + b"\r\n\r\n" + body)


def _warc_record(url: str, date: str, payload: bytes, *,
                 rec_type: str = "response",
                 content_type: str = "text/html",
                 wrap_http: bool = True) -> bytes:
    block = _http_response(payload, content_type) if (
        wrap_http and rec_type == "response") else payload
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{date}")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rec_type.encode("ascii") + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: " + date.encode("ascii") + _CRLF
        + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode("ascii")
        + b">\r\n"
        + (b"Content-Type: application/http; msgtype=response\r\n"
           if wrap_http and rec_type == "response"
           else b"Content-Type: " + content_type.encode("ascii") + _CRLF)
        + b"Content-Length: " + str(len(block)).encode("ascii") + _CRLF
        + _CRLF)
    return head + block + _CRLF + _CRLF


def write_warc(path: str, records, *, gzip_per_record: bool | None = None,
               wrap_http: bool = True) -> int:
    """Write records to a .warc / .warc.gz shard; returns the count.

    ``records``: iterable of dicts with ``url`` (str), ``payload``
    (bytes), optional ``date`` (ISO-8601 str, default epoch-ish
    constant), ``rec_type``, ``content_type``. ``gzip_per_record``
    defaults from the filename suffix; gzipped output is one gzip
    member per record (the Common-Crawl layout, seekable/splittable).
    """
    if gzip_per_record is None:
        gzip_per_record = path.endswith(".gz")
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            raw = _warc_record(
                rec["url"], rec.get("date", "2025-06-01T00:00:00Z"),
                rec["payload"], rec_type=rec.get("rec_type", "response"),
                content_type=rec.get("content_type", "text/html"),
                wrap_http=wrap_http)
            if gzip_per_record:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(raw)
                f.write(buf.getvalue())
            else:
                f.write(raw)
            n += 1
    return n


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def strip_http(block: bytes) -> tuple[int, bytes]:
    """HTTP response block → (status, body). Non-HTTP blocks pass
    through as (0, block)."""
    if not block.startswith(b"HTTP/"):
        return 0, block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return 0, block
    try:
        status = int(block[:sep].split(_CRLF, 1)[0].split(b" ")[1])
    except (IndexError, ValueError):
        status = 0
    return status, block[sep + 4:]


def iter_warc(path: str, *, want_payload: bool = True,
              rec_types: tuple = ("response",)):
    """Stream records from a .warc / .warc.gz shard.

    Yields dicts ``{url, date, rec_type, payload}`` (payload is the
    raw content block; ``want_payload=False`` skips the body bytes —
    the column-pruned read). Raises ValueError on malformed headers /
    truncated blocks rather than looping.
    """
    raw = open(path, "rb")
    stream = gzip.GzipFile(fileobj=raw) if path.endswith(".gz") else raw
    try:
        reader = io.BufferedReader(stream, 1 << 20)
        while True:
            line = reader.readline()
            if not line:
                return
            if line in (_CRLF, b"\n"):
                continue
            if not line.startswith(b"WARC/"):
                raise ValueError(
                    f"malformed WARC: expected version line, got "
                    f"{line[:40]!r}")
            hdr: dict[str, str] = {}
            while True:
                line = reader.readline()
                if not line:
                    raise ValueError("truncated WARC header")
                if line in (_CRLF, b"\n"):
                    break
                k, _, v = line.decode("utf-8", "replace").partition(":")
                hdr[k.strip().lower()] = v.strip()
            try:
                length = int(hdr["content-length"])
            except (KeyError, ValueError):
                raise ValueError("WARC record missing Content-Length")
            rtype = hdr.get("warc-type", "")
            if rtype in rec_types:
                if want_payload:
                    block = reader.read(length)
                    if len(block) != length:
                        raise ValueError("truncated WARC content block")
                else:
                    _skip(reader, length)
                    block = b""
                yield {
                    "url": hdr.get("warc-target-uri", ""),
                    "date": hdr.get("warc-date", ""),
                    "rec_type": rtype,
                    "payload": block,
                }
            else:
                _skip(reader, length)
    finally:
        stream.close()
        if stream is not raw:
            raw.close()


def _skip(reader, n: int) -> None:
    while n > 0:
        chunk = reader.read(min(n, 1 << 20))
        if not chunk:
            raise ValueError("truncated WARC content block")
        n -= len(chunk)


# ---------------------------------------------------------------------------
# Ray Data source
# ---------------------------------------------------------------------------

_ALL_COLS = ("url", "date", "rec_type", "status", "payload")


def warc_dataset(paths, *, parse_http: bool = True, columns=None,
                 batch_rows: int = 256, rec_types: tuple = ("response",)):
    """WARC shards → ``ray.data.Dataset`` of page records.

    One streaming read task per shard; the generator UDF yields
    ``batch_rows``-sized Arrow tables so a 1 GB shard never sits
    decompressed in worker memory. ``columns`` prunes at the read
    (omit ``payload``/``status`` and body bytes are skipped on disk).
    Schema: url:string, date:string, rec_type:string
    [, status:int32][, payload:binary].
    """
    import ray

    if isinstance(paths, str):
        paths = [paths]
    cols = list(columns) if columns is not None else list(_ALL_COLS)
    bad = set(cols) - set(_ALL_COLS)
    if bad:
        raise ValueError(f"unknown WARC columns {sorted(bad)}; "
                         f"available: {list(_ALL_COLS)}")
    need_payload = "payload" in cols or (parse_http and "status" in cols)

    def _read_shard(batch: pa.Table):
        for path in batch["path"].to_pylist():
            rows = {c: [] for c in cols}
            n = 0
            for rec in iter_warc(path, want_payload=need_payload,
                                 rec_types=rec_types):
                payload = rec["payload"]
                status = 0
                if parse_http and need_payload:
                    status, payload = strip_http(payload)
                for c in cols:
                    if c == "status":
                        rows[c].append(status)
                    elif c == "payload":
                        rows[c].append(payload)
                    else:
                        rows[c].append(rec[c])
                n += 1
                if n >= batch_rows:
                    yield _to_table(rows, cols)
                    rows = {c: [] for c in cols}
                    n = 0
            if n:
                yield _to_table(rows, cols)

    return ray.data.from_items(
        [{"path": p} for p in paths],
        override_num_blocks=len(paths)).map_batches(
        _read_shard, batch_format="pyarrow")


def _to_table(rows: dict, cols) -> pa.Table:
    arrs = []
    for c in cols:
        if c == "status":
            arrs.append(pa.array(rows[c], pa.int32()))
        elif c == "payload":
            arrs.append(pa.array(rows[c], pa.binary()))
        else:
            arrs.append(pa.array(rows[c], pa.string()))
    return pa.table(dict(zip(cols, arrs)))


# ---------------------------------------------------------------------------
# CDX index (Common-Crawl cc-index layout) + random access
# ---------------------------------------------------------------------------

def surt_key(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) key, the
    cc-index sort key: scheme dropped, host labels reversed and
    comma-joined, default ports and a leading ``www.`` dropped,
    lowercased — ``https://www.Example.co.uk/A?q=1`` →
    ``uk,co,example)/a?q=1``."""
    u = url.strip()
    if "://" in u:
        u = u.split("://", 1)[1]
    hostport, sep, tail = u.partition("/")
    host = hostport.split("@")[-1].lower()
    port = ""
    if ":" in host:
        host, _, port = host.partition(":")
        if port in ("80", "443"):
            port = ""
    if host.startswith("www.") and host.count(".") >= 2:
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    if port:
        rev += ":" + port
    return rev + ")/" + (tail.lower() if sep else "")


def _cc_timestamp(warc_date: str) -> str:
    """WARC-Date (ISO-8601) → cc-index 14-digit timestamp."""
    digits = "".join(ch for ch in warc_date if ch.isdigit())
    return (digits + "00000000000000")[:14]


def iter_gzip_members(path: str):
    """Stream (offset, length, raw_bytes) for each gzip member of a
    per-record-gzip shard — the byte ranges a CDX index records and a
    ranged GET fetches. Pure zlib streaming: the shard is never held
    decompressed in memory."""
    import zlib

    with open(path, "rb") as f:
        offset = 0
        buf = b""
        eof = False
        while True:
            if not buf and not eof:
                chunk = f.read(1 << 20)
                if chunk:
                    buf += chunk
                else:
                    eof = True
            if not buf:
                return
            d = zlib.decompressobj(wbits=31)
            out = []
            consumed = 0
            while not d.eof:
                if not buf:
                    if eof:
                        raise ValueError("truncated gzip member")
                    chunk = f.read(1 << 20)
                    if not chunk:
                        eof = True
                        continue
                    buf = chunk
                out.append(d.decompress(buf))
                consumed += len(buf) - len(d.unused_data)
                buf = d.unused_data
            yield offset, consumed, b"".join(out)
            offset += consumed


def _parse_record_bytes(raw: bytes) -> dict:
    """One decompressed WARC record → header dict + payload."""
    rec = next(iter_warc_bytes(raw))
    return rec


def iter_warc_bytes(raw: bytes):
    """iter_warc over an in-memory record blob (shared parse path)."""
    reader = io.BufferedReader(io.BytesIO(raw))
    while True:
        line = reader.readline()
        if not line:
            return
        if line in (_CRLF, b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError("malformed WARC record bytes")
        hdr: dict[str, str] = {}
        while True:
            line = reader.readline()
            if line in (_CRLF, b"\n"):
                break
            if not line:
                raise ValueError("truncated WARC header")
            k, _, v = line.decode("utf-8", "replace").partition(":")
            hdr[k.strip().lower()] = v.strip()
        length = int(hdr["content-length"])
        block = reader.read(length)
        if len(block) != length:
            raise ValueError("truncated WARC content block")
        yield {
            "url": hdr.get("warc-target-uri", ""),
            "date": hdr.get("warc-date", ""),
            "rec_type": hdr.get("warc-type", ""),
            "payload": block,
        }


def build_cdx(path: str, *, rec_types: tuple = ("response",)):
    """CDX entries for one per-record-gzip shard: dicts of
    ``urlkey / timestamp / url / digest(sha1-b32 of the HTTP body) /
    offset / length / filename`` — the cc-index columns that make a
    100 TB crawl random-accessible (ranged GET of [offset,
    offset+length) + one-member gunzip)."""
    import base64
    import hashlib
    import os

    fname = os.path.basename(path)
    out = []
    for offset, length, raw in iter_gzip_members(path):
        rec = _parse_record_bytes(raw)
        if rec["rec_type"] not in rec_types:
            continue
        _, body = strip_http(rec["payload"])
        digest = base64.b32encode(
            hashlib.sha1(body).digest()).decode("ascii")
        out.append({"urlkey": surt_key(rec["url"]),
                    "timestamp": _cc_timestamp(rec["date"]),
                    "url": rec["url"], "digest": digest,
                    "offset": offset, "length": length,
                    "filename": fname})
    return out


def cdx_dataset(paths):
    """CDX index build as a Ray Dataset — one task per shard (same
    shard-parallel shape as ``warc_dataset``); sink with
    ``write_parquet`` for a queryable cc-index analogue."""
    import ray

    if isinstance(paths, str):
        paths = [paths]

    def _one(batch: pa.Table):
        for p in batch["path"].to_pylist():
            rows = build_cdx(p)
            yield pa.table({
                "urlkey": pa.array([r["urlkey"] for r in rows]),
                "timestamp": pa.array([r["timestamp"] for r in rows]),
                "url": pa.array([r["url"] for r in rows]),
                "digest": pa.array([r["digest"] for r in rows]),
                "offset": pa.array([r["offset"] for r in rows],
                                   pa.int64()),
                "length": pa.array([r["length"] for r in rows],
                                   pa.int64()),
                "filename": pa.array([r["filename"] for r in rows]),
            })

    return ray.data.from_items(
        [{"path": p} for p in paths],
        override_num_blocks=len(paths)).map_batches(
        _one, batch_format="pyarrow")


def read_warc_at(path: str, offset: int, length: int) -> dict:
    """Random-access one record via its CDX (offset, length) — the
    ranged-GET fetch path. Returns {url, date, rec_type, payload}."""
    with open(path, "rb") as f:
        f.seek(offset)
        raw = f.read(length)
    return _parse_record_bytes(gzip.decompress(raw))


# ---------------------------------------------------------------------------
# charset sniffing / payload decode
# ---------------------------------------------------------------------------

_META_RE = None


def sniff_charset(payload: bytes, content_type: str = "") -> str:
    """Charset detection for crawl payloads, in standard precedence:
    BOM → Content-Type header charset → HTML ``<meta charset>`` /
    http-equiv (first 1024 bytes, the WHATWG prescan window) → UTF-8
    if it validates → latin-1 (never fails)."""
    global _META_RE
    import re as _re

    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if payload.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if payload.startswith(b"\xfe\xff"):
        return "utf-16-be"
    m = _re.search(r"charset=([A-Za-z0-9_.:-]+)", content_type or "")
    if m:
        return m.group(1).strip().lower()
    if _META_RE is None:
        _META_RE = _re.compile(
            rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)",
            _re.IGNORECASE)
    m = _META_RE.search(payload[:1024])
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def decode_payload_batch(batch: pa.Table, *, payload_col: str = "payload",
                         content_type_col: str | None = None,
                         out_col: str = "text") -> pa.Table:
    """Binary payloads → text with per-row charset sniffing. Appends
    ``out_col`` (string) and ``charset`` (string). Unknown or wrong
    declared charsets degrade to replacement characters, never raise —
    a decode hang/crash on one hostile page must not stall the actor
    pool."""
    payloads = batch[payload_col].to_pylist()
    ctypes = (batch[content_type_col].to_pylist()
              if content_type_col else [""] * len(payloads))
    texts, charsets = [], []
    for p, ct in zip(payloads, ctypes):
        p = p or b""
        enc = sniff_charset(p, ct or "")
        try:
            texts.append(p.decode(enc, "replace"))
        except LookupError:            # bogus declared charset
            enc = "latin-1"
            texts.append(p.decode(enc, "replace"))
        charsets.append(enc)
    return batch.append_column(
        out_col, pa.array(texts, pa.string())).append_column(
        "charset", pa.array(charsets, pa.string()))


def decode_payloads(ds, *, payload_col: str = "payload",
                    content_type_col: str | None = None,
                    out_col: str = "text"):
    """Dataset wrapper for ``decode_payload_batch`` (task-pool map —
    stateless, no model to load)."""
    return ds.map_batches(
        lambda b: decode_payload_batch(
            b, payload_col=payload_col,
            content_type_col=content_type_col, out_col=out_col),
        batch_format="pyarrow")


def cdx_spans(bypath: dict, cdx_rows, *, target_bytes: int = 32 << 20):
    """Group contiguous CDX member runs per file into ~target_bytes
    read spans — the task list an indexed read fans out over."""
    spans = []
    by_file: dict[str, list] = {}
    for r in cdx_rows:
        fn = r["filename"]
        if fn in bypath:
            by_file.setdefault(fn, []).append(
                (int(r["offset"]), int(r["length"])))
    for fn, members in by_file.items():
        members.sort()
        start = members[0][0]
        end = members[0][0] + members[0][1]
        for off, ln in members[1:]:
            if off == end and (end - start) < target_bytes:
                end = off + ln
            else:
                spans.append({"path": bypath[fn], "start": start,
                              "end": end})
                start, end = off, off + ln
        spans.append({"path": bypath[fn], "start": start, "end": end})
    return spans


def warc_dataset_indexed(paths, cdx_rows, *, parse_http: bool = True,
                         columns=None, target_bytes: int = 32 << 20,
                         rec_types: tuple = ("response",)):
    """CDX-driven WARC read: the index's exact (offset, length) member
    ranges split each shard into ~``target_bytes`` byte-range read
    tasks — parallelism becomes RECORD-bounded instead of shard-
    bounded (a plain ``warc_dataset`` runs one task per shard; with
    few big shards that caps the whole ingest). This is how cc-index
    consumers actually read Common Crawl: ranged GETs of member spans.

    ``cdx_rows``: iterable of dicts with ``filename``/``offset``/
    ``length`` (the ``build_cdx``/``cdx_dataset`` columns). ``paths``
    maps filenames to real paths (list of paths; basenames must match
    the index). Output schema matches ``warc_dataset``.
    """
    import os

    import ray

    if isinstance(paths, str):
        paths = [paths]
    bypath = {os.path.basename(p): p for p in paths}
    cols = list(columns) if columns is not None else list(_ALL_COLS)
    bad = set(cols) - set(_ALL_COLS)
    if bad:
        raise ValueError(f"unknown WARC columns {sorted(bad)}")

    spans = cdx_spans(bypath, cdx_rows, target_bytes=target_bytes)

    def _read_span(batch: pa.Table):
        for path, start, end in zip(batch["path"].to_pylist(),
                                    batch["start"].to_pylist(),
                                    batch["end"].to_pylist()):
            with open(path, "rb") as f:
                f.seek(start)
                blob = f.read(end - start)
            rows = {c: [] for c in cols}
            n = 0
            # spans are whole concatenated gzip members. GzipFile
            # streams multi-member input in buffered chunks; BOTH
            # obvious alternatives are traps: a per-member
            # decompressobj loop pays Python overhead per record, and
            # gzip.decompress() is QUADRATIC on multi-member blobs
            # (it copies unused_data per member — measured 8.4 s vs
            # 0.19 s on one 5 MB shard)
            raw = gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
            for rec in iter_warc_bytes(raw):
                if rec["rec_type"] not in rec_types:
                    continue
                payload = rec["payload"]
                status = 0
                if parse_http:
                    status, payload = strip_http(payload)
                for c in cols:
                    if c == "status":
                        rows[c].append(status)
                    elif c == "payload":
                        rows[c].append(payload)
                    else:
                        rows[c].append(rec[c])
                n += 1
            if n:
                yield _to_table(rows, cols)

    if not spans:
        import pyarrow as _pa

        return ray.data.from_arrow(_to_table(
            {c: [] for c in cols}, cols))
    return ray.data.from_items(spans,
                               override_num_blocks=len(spans)) \
        .map_batches(_read_span, batch_format="pyarrow")
