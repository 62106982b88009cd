"""WARC/WET source: Common-Crawl-style extracted-text archives.

Crawl-based training-data pipelines (C4, RefinedWeb, FineWeb) start
from WET files — WARC envelopes whose ``conversion`` records carry
the extracted plain text of one page each:

    WARC/1.0
    WARC-Type: conversion
    WARC-Target-URI: http://example.com/
    WARC-Date: 2021-01-01T00:00:00Z
    Content-Type: text/plain
    Content-Length: 1234
    <blank line>
    <exactly Content-Length BYTES of text>
    <blank line><blank line>

Two readers, one output schema ``(path, url, warc_date, record_type,
content_length, text)``:

* ``strict=True`` (default, byte-exact): one whole file per task via
  the ``binaryFile`` source, parsed by an Arrow-batched
  ``mapInPandas`` kernel that honors ``Content-Length`` BYTE counts
  exactly — a payload line that happens to start with ``WARC/1.0``
  cannot split a record, multibyte UTF-8 cannot shift a boundary,
  and gzip members (``.wet.gz`` ships as concatenated members) are
  decompressed in-stream.  The per-task unit is one file, which IS
  the real-world parallel grain: crawls ship as thousands of
  ~100-150 MB ``.wet.gz`` members, so a 1000-executor cluster gets
  1000-way parallelism from the file listing alone.  Bound stated:
  ``binaryFile`` loads one file per row (Spark caps a row at 2 GB);
  standard crawl members are far below it.
* ``strict=False`` (native, splittable): ``spark.read.text`` with
  ``lineSep="\\nWARC/1.0"`` splits records inside even a single huge
  UNCOMPRESSED file (the one case per-file parallelism can't cover)
  and parses headers with native expressions — zero Python.  Trades
  stated plainly: (a) a payload LINE beginning with ``WARC/1.0``
  falsely splits that record; (b) trailing newlines are trimmed
  instead of byte-counted, so ``content_length`` is the
  header-DECLARED value and is not re-verified against the trimmed
  text (the strict path's truncation guard has no native analog);
  tested equal to strict on payloads without trailing newlines.
  Header names match case-insensitively on both paths (WARC field
  names are case-insensitive by spec).

r10 adds the layer BELOW WET: raw WARC ``response`` records
(:func:`read_warc_responses` — HTTP status/headers split, declared-
charset decode, chunked-body removal) and the one-plan raw-crawl →
``documents`` composition :func:`warc_html_documents` (HTML stripped
by the native ``functions/html.html_to_text`` cascade) — the
C4/RefinedWeb re-extraction path for when WET's own conversion isn't
good enough.

These kernels are SOURCE-side Arrow batches, not part of the SURVEY
§2.11 cleaning-UDF budget (which stays exactly the five in
``udfs.py``).
"""

from __future__ import annotations

import codecs
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

WET_SCHEMA = (
    "path string, url string, warc_date string, record_type string, "
    "content_length long, text string"
)

WARC_RESPONSE_SCHEMA = (
    "path string, url string, warc_date string, content_length long, "
    "http_status int, content_type string, charset string, html string"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (``.wet.gz`` files
    are multi-member by spec — one member per record group; a plain
    ``zlib`` one-shot would stop at the first member boundary)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:
            # the member ran out of input mid-stream (a download cut
            # short): partial plaintext would silently DROP the
            # records in the lost tail — the zero-progress check
            # below never fires for truncation, only for garbage
            raise ValueError(
                "read_wet: truncated gzip member — partial archive"
            )
        if d.unused_data == data:  # no progress: corrupt tail
            raise ValueError("read_wet: corrupt gzip member")
        data = d.unused_data
    return b"".join(out)


def _iter_warc_records(data: bytes):
    """Yield ``(headers, content_length, payload_bytes)`` per WARC
    record in one member's bytes, honoring Content-Length exactly.
    Malformed structure RAISES, never resyncs: a record with a
    missing/negative Content-Length has no reliable payload boundary,
    so scanning forward for the next record magic could land INSIDE
    that record's payload and emit a phantom record whose (url, text)
    never existed — the exact attack the byte-exact contract exists
    to prevent.  A file cut mid-HEADER raises for the same reason the
    mid-payload cut does: silently returning the earlier records
    would hide the loss."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        he_crlf = data.find(b"\r\n\r\n", start)
        he_lf = data.find(b"\n\n", start)
        ends = [(e, sep) for e, sep in ((he_crlf, 4), (he_lf, 2)) if e >= 0]
        if not ends:
            raise ValueError(
                "read_wet: truncated record — file ends inside a "
                "header block"
            )
        hend, sep_len = min(ends)
        if data.find(b"\nWARC/", start, hend) >= 0:
            # another record begins before this header's blank-line
            # terminator: the header was cut mid-file and would
            # silently ABSORB the next record, yielding a merged
            # (url, text) pair that never existed
            raise ValueError(
                "read_wet: truncated record — another record starts "
                "inside an unterminated header block"
            )
        headers = {}
        for line in data[start:hend].split(b"\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        body_start = hend + sep_len
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                "read_wet: record without a valid Content-Length "
                "header — its payload has no reliable boundary "
                "(WARC mandates the header)"
            )
        if clen < 0:
            raise ValueError(
                f"read_wet: negative Content-Length {clen}"
            )
        if body_start + clen > n:
            # fewer bytes remain than the record claims (truncated
            # uncompressed file): yielding the short slice as if it
            # were the full record would hand downstream consumers
            # silently inconsistent (content_length, text) pairs
            raise ValueError(
                "read_wet: truncated record — file ends inside a "
                f"{clen}-byte payload"
            )
        payload = data[body_start: body_start + clen]
        pos = body_start + clen
        yield headers, clen, payload


def _parse_wet_member(path: str, data: bytes):
    """Record dicts (WET text surface) from one file's bytes — the
    strict framing lives in :func:`_iter_warc_records`."""
    for headers, clen, payload in _iter_warc_records(data):
        yield {
            "path": path,
            "url": headers.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace"
            ) or None,
            "warc_date": headers.get(b"warc-date", b"").decode(
                "utf-8", "replace"
            ) or None,
            "record_type": headers.get(b"warc-type", b"").decode(
                "utf-8", "replace"
            ) or None,
            "content_length": clen,
            "text": payload.decode("utf-8", "replace"),
        }


def read_wet(
    spark: SparkSession, path: str | list[str], strict: bool = True,
    record_types: tuple[str, ...] = ("conversion",),
) -> DataFrame:
    """→ one row per WET record of a kept type (default: the
    ``conversion`` text records; pass ``record_types=None`` to keep
    every record including ``warcinfo``).  ``path`` may be a single
    path/glob or an explicit list of paths (the streaming crawl
    ingest passes each micro-batch's manifest lines).  See the
    module docstring for the strict-vs-native trade."""
    if strict:
        import pandas as pd

        def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            cols = [
                "path", "url", "warc_date", "record_type",
                "content_length", "text",
            ]
            for pdf in batches:
                rows = [
                    rec
                    for p, content in zip(pdf["path"], pdf["content"])
                    for rec in _parse_wet_member(p, bytes(content))
                ]
                yield pd.DataFrame(rows, columns=cols)

        out = (
            spark.read.format("binaryFile")
            .load(path)
            .select("path", "content")
            .mapInPandas(parse, WET_SCHEMA)
        )
    else:
        # native record split: lineSep consumes '\nWARC/1.0', so the
        # first row keeps its 'WARC/1.0' prefix and later rows start
        # at the line after it — both shapes parse below.  Headers
        # end at the first blank line (CRLF or LF).
        raw = spark.read.option("lineSep", "\nWARC/1.0").text(path)
        hdr_end = F.expr(
            r"""
            CASE
              WHEN instr(value, '\r\n\r\n') > 0
                   AND (instr(value, '\n\n') = 0
                        OR instr(value, '\r\n\r\n') <= instr(value, '\n\n'))
              THEN instr(value, '\r\n\r\n') + 3
              WHEN instr(value, '\n\n') > 0 THEN instr(value, '\n\n') + 1
              ELSE 0
            END
            """
        )
        # header fields extract from the HEADER BLOCK only — a regex
        # over the whole value would happily match 'warc-date: ...'
        # appearing inside the page text whenever the real header is
        # absent (payload pollution) — and are LINE-ANCHORED
        # ((?im)^...): a header VALUE containing another header name
        # (a WARC-Target-URI like http://x/?WARC-Type:response on an
        # earlier line) must not shadow the real header line, matching
        # the strict path's line-grain parse
        hdr = F.expr("substring(value, 1, _he)")
        out = (
            raw.withColumn("_he", hdr_end)
            .filter(F.col("_he") > 0)
            .select(
                F.input_file_name().alias("path"),
                F.regexp_extract(
                    hdr, r"(?im)^WARC-Target-URI:[ \t]*(\S+)", 1
                ).alias("url"),
                F.regexp_extract(
                    hdr, r"(?im)^WARC-Date:[ \t]*(\S+)", 1
                ).alias("warc_date"),
                F.regexp_extract(
                    hdr, r"(?im)^WARC-Type:[ \t]*(\S+)", 1
                ).alias("record_type"),
                F.regexp_extract(
                    hdr, r"(?im)^Content-Length:[ \t]*(\d+)", 1
                ).try_cast("long").alias("content_length"),
                F.regexp_replace(
                    F.expr("substring(value, _he + 1)"),
                    r"[\r\n]+$", "",
                ).alias("text"),
            )
            .withColumn(
                "url", F.when(F.col("url") != "", F.col("url"))
            )
            .withColumn(
                "warc_date",
                F.when(F.col("warc_date") != "", F.col("warc_date")),
            )
            .withColumn(
                "record_type",
                F.when(F.col("record_type") != "", F.col("record_type")),
            )
        )
    if record_types is not None:
        out = out.filter(F.col("record_type").isin(list(record_types)))
    return out


def wet_documents(
    spark: SparkSession, path: str | list[str], strict: bool = True,
) -> DataFrame:
    """WET conversion records shaped as the engine's ``documents``
    surface — ``(doc_id, url, text)`` with a deterministic 64-bit id
    hashed from (url, date, text) so replays and backfills assign
    stably and two fetches of the same URL with different content
    get distinct ids (only byte-identical re-fetches collide — which
    IS the exact-dedup grain downstream) — ready for
    ``prepare_corpus`` / the dedup and quality families."""
    recs = read_wet(spark, path, strict=strict)
    return recs.select(
        F.xxhash64(
            F.coalesce(F.col("url"), F.lit("")),
            F.coalesce(F.col("warc_date"), F.lit("")),
            F.coalesce(F.col("text"), F.lit("")),
        ).alias("doc_id"),
        "url",
        "text",
    )


# --------------------------------------------------------------------------
# Raw WARC `response` records (r10): the layer BELOW WET.  A response
# record's payload is the raw HTTP message captured off the wire —
# status line, HTTP headers, blank line, body bytes in the server's
# declared charset (and possibly chunked transfer coding).  This is
# what C4/RefinedWeb-style pipelines re-extract from when WET's own
# text conversion isn't good enough; the HTML body feeds
# functions/html.html_to_text.
# --------------------------------------------------------------------------

_HTTP_STATUS_RE = re.compile(rb"^HTTP/\d+(?:\.\d+)?[ \t]+(\d{3})")
_HTTP_CHARSET_RE = re.compile(rb"charset=[\"']?([A-Za-z0-9_.:-]+)", re.I)


def _split_http_response(payload: bytes):
    """``(status, content_type, charset, body_bytes)`` from one raw
    HTTP response message.  A payload WITHOUT an ``HTTP/`` preamble is
    not a guess case — there is no header block, so the whole payload
    IS the body: ``(None, None, None, payload)``.  A header block
    that never terminates means the record carries headers only
    (body empty) — the WARC Content-Length already bounded the
    record, so neither shape has a boundary ambiguity and neither
    raises.  The FIRST Content-Type header wins (line-grain, matching
    the WARC header parse)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, None, payload
    he_crlf = payload.find(b"\r\n\r\n")
    he_lf = payload.find(b"\n\n")
    ends = [(e, s) for e, s in ((he_crlf, 4), (he_lf, 2)) if e >= 0]
    hend, sep_len = min(ends) if ends else (len(payload), 0)
    head, body = payload[:hend], payload[hend + sep_len:]
    lines = head.split(b"\n")
    m = _HTTP_STATUS_RE.match(lines[0].strip())
    status = int(m.group(1)) if m else None
    ctype = chunked = None
    for line in lines[1:]:
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        k = k.strip().lower()
        if k == b"content-type" and ctype is None:
            ctype = v.strip()
        elif k == b"transfer-encoding" and v.strip().lower() == b"chunked":
            chunked = True
    if chunked:
        body = _dechunk(body)
    charset = None
    if ctype:
        cm = _HTTP_CHARSET_RE.search(ctype)
        if cm:
            charset = cm.group(1).decode("ascii", "replace")
    return (
        status,
        ctype.decode("utf-8", "replace") if ctype is not None else None,
        charset,
        body,
    )


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked body (size-line; chunk; CRLF; ...;
    0-size terminator).  A malformed size line RAISES — resyncing
    would splice chunk-size hex lines into the middle of the HTML,
    the same phantom-content failure the WARC framing refuses."""
    out, pos, n = [], 0, len(body)
    while True:
        nl = body.find(b"\n", pos)
        if nl < 0:
            raise ValueError(
                "read_warc_responses: malformed chunked body — "
                "missing chunk-size line terminator"
            )
        size_line = body[pos:nl].strip().split(b";", 1)[0]
        try:
            size = int(size_line, 16)
        except ValueError:
            raise ValueError(
                "read_warc_responses: malformed chunked body — "
                f"non-hex chunk size {size_line[:16]!r}"
            )
        pos = nl + 1
        if size == 0:
            return b"".join(out)
        if pos + size > n:
            raise ValueError(
                "read_warc_responses: malformed chunked body — "
                f"{size}-byte chunk overruns the record payload"
            )
        out.append(body[pos: pos + size])
        pos += size
        # the chunk's trailing CRLF/LF
        if body[pos: pos + 2] == b"\r\n":
            pos += 2
        elif body[pos: pos + 1] == b"\n":
            pos += 1


def _decode_body(body: bytes, charset) -> str:
    """Body bytes → text honoring the DECLARED charset, falling back
    to UTF-8 when the declaration is absent or names an encoding
    Python doesn't know.  Always ``errors='replace'``: crawl bodies
    routinely lie about their encoding and a decode error must not
    kill the file's task."""
    if charset:
        try:
            codecs.lookup(charset)
            return body.decode(charset, "replace")
        except LookupError:
            pass
    return body.decode("utf-8", "replace")


def read_warc_responses(
    spark: SparkSession, path: str | list[str], strict: bool = True,
) -> DataFrame:
    """→ one row per WARC ``response`` record: ``(path, url,
    warc_date, content_length, http_status, content_type, charset,
    html)``.  ``content_length`` is the WARC record's (headers +
    body) byte count; ``html`` is the HTTP body decoded per the
    server's declared charset (strict path) with chunked transfer
    coding removed.

    Same strict-vs-native trade as :func:`read_wet`, with two extra
    stated limits on the native path: the body is already
    UTF-8-replace decoded by the record split, so a declared
    non-UTF-8 charset is REPORTED but not honored, and chunked
    bodies are not de-chunked (no native analog of the strict
    kernel's byte-grain chunk walk) — parity with strict is tested
    on unchunked UTF-8 bodies, the overwhelming common case."""
    if strict:
        import pandas as pd

        def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            cols = [
                "path", "url", "warc_date", "content_length",
                "http_status", "content_type", "charset", "html",
            ]
            for pdf in batches:
                rows = []
                for p, content in zip(pdf["path"], pdf["content"]):
                    for headers, clen, payload in _iter_warc_records(
                        bytes(content)
                    ):
                        if headers.get(b"warc-type", b"") != b"response":
                            continue
                        status, ctype, charset, body = (
                            _split_http_response(payload)
                        )
                        rows.append({
                            "path": p,
                            "url": headers.get(
                                b"warc-target-uri", b""
                            ).decode("utf-8", "replace") or None,
                            "warc_date": headers.get(
                                b"warc-date", b""
                            ).decode("utf-8", "replace") or None,
                            "content_length": clen,
                            "http_status": status,
                            "content_type": ctype,
                            "charset": charset,
                            "html": _decode_body(body, charset),
                        })
                yield pd.DataFrame(rows, columns=cols)

        return (
            spark.read.format("binaryFile")
            .load(path)
            .select("path", "content")
            .mapInPandas(parse, WARC_RESPONSE_SCHEMA)
        )
    recs = read_wet(spark, path, strict=False, record_types=("response",))
    # the HTTP header block ends at the first blank line INSIDE the
    # record payload — same CRLF-vs-LF minimum the record split uses
    he = F.expr(
        r"""
        CASE
          WHEN left(text, 5) <> 'HTTP/' THEN 0
          WHEN instr(text, '\r\n\r\n') > 0
               AND (instr(text, '\n\n') = 0
                    OR instr(text, '\r\n\r\n') <= instr(text, '\n\n'))
          THEN instr(text, '\r\n\r\n') + 3
          WHEN instr(text, '\n\n') > 0 THEN instr(text, '\n\n') + 1
          ELSE length(text)
        END
        """
    )
    hdr = F.expr("substring(text, 1, _he)")
    out = (
        recs.withColumn("_he", he)
        .select(
            "path", "url", "warc_date", "content_length",
            F.regexp_extract(
                F.col("text"), r"^HTTP/\d+(?:\.\d+)?[ \t]+(\d{3})", 1
            ).try_cast("int").alias("http_status"),
            F.regexp_extract(
                hdr, r"(?im)^Content-Type:[ \t]*([^\r\n]+)", 1
            ).alias("content_type"),
            # body: everything past the header block; a no-preamble
            # payload (_he = 0) is all body, header-only is all header
            F.when(
                F.col("_he") > 0, F.expr("substring(text, _he + 1)")
            ).otherwise(F.col("text")).alias("html"),
        )
        .withColumn(
            "content_type",
            F.when(F.col("content_type") != "", F.col("content_type")),
        )
        .withColumn(
            "charset",
            F.regexp_extract(
                F.coalesce(F.col("content_type"), F.lit("")),
                r"""(?i)charset=["']?([A-Za-z0-9_.:-]+)""", 1,
            ),
        )
        .withColumn(
            "charset", F.when(F.col("charset") != "", F.col("charset"))
        )
        .select(
            "path", "url", "warc_date", "content_length", "http_status",
            "content_type", "charset", "html",
        )
    )
    return out


def warc_html_documents(
    spark: SparkSession, path: str | list[str], strict: bool = True,
    statuses: tuple[int, ...] = (200,),
    main_content: bool = False,
    with_meta: bool = False,
) -> DataFrame:
    """Raw-crawl → ``documents`` surface in one plan: ``response``
    records with a kept HTTP status (default 200, the C4 convention;
    ``statuses=None`` keeps every response), HTML stripped to plain
    text by the native :func:`~wikiextractor_spark.functions.html.
    html_to_text` cascade — or, with ``main_content=True``, reduced
    to the article body by the block-level link-density classifier
    :func:`~wikiextractor_spark.functions.html.extract_main_content`
    (nav/footer link farms and short chrome blocks dropped before
    any downstream gate sees them) — ids assigned exactly like
    :func:`wet_documents` so the two ingest paths land on the same
    dedup grain.  Feeds ``prepare_corpus`` / the quality gates.  The
    id hashes the RAW html either way, so flipping the extractor
    never re-keys a document.  ``with_meta=True`` appends the
    declared ``title`` and ``declared_lang`` columns (native
    regexp_extract; extra columns prune away for consumers that
    select the base surface)."""
    from wikiextractor_spark.functions.html import (
        extract_main_content,
        html_to_text,
    )

    extract = extract_main_content if main_content else html_to_text
    recs = read_warc_responses(spark, path, strict=strict)
    if statuses is not None:
        recs = recs.filter(F.col("http_status").isin(list(statuses)))
    cols = [
        F.xxhash64(
            F.coalesce(F.col("url"), F.lit("")),
            F.coalesce(F.col("warc_date"), F.lit("")),
            F.coalesce(F.col("html"), F.lit("")),
        ).alias("doc_id"),
        F.col("url"),
        extract(F.col("html")).alias("text"),
    ]
    if with_meta:
        from wikiextractor_spark.functions.html import (
            html_lang,
            html_title,
        )

        cols += [
            html_title(F.col("html")).alias("title"),
            html_lang(F.col("html")).alias("declared_lang"),
        ]
    return recs.select(*cols)
