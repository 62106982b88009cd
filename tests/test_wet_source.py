"""WARC/WET source: byte-exact strict parsing (Content-Length
honored, adversarial payloads, multi-member gzip) and the native
splittable path's stated-trade parity."""

from __future__ import annotations

import gzip

import pytest

from wikiextractor_spark.sources.wet import read_wet, wet_documents


def _record(url: str, date: str, text: str, rtype: str = "conversion") -> bytes:
    payload = text.encode("utf-8")
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def _warcinfo() -> bytes:
    body = b"software: test\r\n"
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Date: 2021-01-01T00:00:00Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )


TEXTS = {
    "http://a.example/": "plain ascii text",
    "http://b.example/": "mélange of mültibyte — 多字节 bytes",
    # adversarial: a payload LINE starting with the record magic —
    # only Content-Length parsing survives this
    "http://c.example/": "before\nWARC/1.0\nafter the fake header",
}
DATE = "2021-06-01T12:00:00Z"


def _wet_bytes() -> bytes:
    out = [_warcinfo()]
    for url, text in TEXTS.items():
        out.append(_record(url, DATE, text))
    return b"".join(out)


def test_strict_parses_bytes_exactly(spark, tmp_path):
    p = tmp_path / "crawl.wet"
    p.write_bytes(_wet_bytes())
    got = {
        r["url"]: r for r in read_wet(spark, str(p), strict=True).collect()
    }
    assert set(got) == set(TEXTS)
    for url, text in TEXTS.items():
        assert got[url]["text"] == text  # byte-exact incl. fake header
        assert got[url]["content_length"] == len(text.encode("utf-8"))
        assert got[url]["warc_date"] == DATE
        assert got[url]["record_type"] == "conversion"
    # warcinfo excluded by default, included on request
    all_types = {
        r["record_type"]
        for r in read_wet(spark, str(p), record_types=None).collect()
    }
    assert all_types == {"warcinfo", "conversion"}


def test_strict_reads_multimember_gzip(spark, tmp_path):
    # .wet.gz ships as CONCATENATED gzip members — compress each
    # record separately and append
    chunks = [_warcinfo()] + [
        _record(u, DATE, t) for u, t in TEXTS.items()
    ]
    p = tmp_path / "crawl.wet.gz"
    p.write_bytes(b"".join(gzip.compress(c) for c in chunks))
    got = {
        r["url"]: r["text"]
        for r in read_wet(spark, str(p), strict=True).collect()
    }
    assert got == TEXTS


def test_native_path_matches_strict_on_benign_payloads(spark, tmp_path):
    """The splittable native reader equals strict on payloads without
    trailing newlines or embedded record magic (its two stated
    trades)."""
    benign = {u: t for u, t in TEXTS.items() if "WARC/1.0" not in t}
    p = tmp_path / "benign.wet"
    p.write_bytes(
        _warcinfo()
        + b"".join(_record(u, DATE, t) for u, t in benign.items())
    )
    strict_rows = {
        (r["url"], r["warc_date"], r["text"])
        for r in read_wet(spark, str(p), strict=True).collect()
    }
    native_rows = {
        (r["url"], r["warc_date"], r["text"])
        for r in read_wet(spark, str(p), strict=False).collect()
    }
    assert native_rows == strict_rows
    # and the native plan is pure Catalyst — no Python workers
    plan = (
        read_wet(spark, str(p), strict=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_missing_content_length_raises(spark, tmp_path):
    """A record without Content-Length has NO reliable payload
    boundary: resyncing on the next record magic could land inside
    that payload and emit a phantom record (review finding r8) — so
    the strict parser raises instead of guessing."""
    broken = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://broken.example/\r\n"
        b"\r\n"
        # adversarial payload: a fake embedded record that a naive
        # resync would emit as a real (url, text) row
        b"page about WARC:\nWARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://attacker.example/\r\n"
        b"Content-Length: 4\r\n\r\nevil\r\n\r\n"
    )
    p = tmp_path / "mixed.wet"
    p.write_bytes(broken + _record("http://ok.example/", DATE, "fine"))
    with pytest.raises(Exception, match="Content-Length"):
        read_wet(spark, str(p), strict=True).collect()


def test_wet_documents_shape_and_determinism(spark, tmp_path):
    p = tmp_path / "docs.wet"
    p.write_bytes(_wet_bytes())
    docs = wet_documents(spark, str(p))
    assert docs.columns == ["doc_id", "url", "text"]
    a = {r["url"]: r["doc_id"] for r in docs.collect()}
    b = {r["url"]: r["doc_id"] for r in wet_documents(spark, str(p)).collect()}
    assert a == b  # replay-stable ids
    assert len(set(a.values())) == len(a)


def test_corrupt_gzip_raises(spark, tmp_path):
    p = tmp_path / "corrupt.wet.gz"
    p.write_bytes(b"\x1f\x8b" + b"\x00" * 40)
    with pytest.raises(Exception, match="gzip|decompress"):
        read_wet(spark, str(p), strict=True).collect()


def test_negative_content_length_raises(spark, tmp_path):
    """Review finding r8: a negative Content-Length must raise — it
    would otherwise walk the cursor backwards into an infinite
    re-parse loop (bytes.find treats a negative start as a
    from-the-end index)."""
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://neg.example/\r\n"
        b"Content-Length: -100\r\n"
        b"\r\n"
    )
    p = tmp_path / "neg.wet"
    p.write_bytes(bad + _record("http://ok.example/", DATE, "fine"))
    with pytest.raises(Exception, match="negative Content-Length"):
        read_wet(spark, str(p), strict=True).collect()


def test_header_truncated_file_raises(spark, tmp_path):
    """A file cut mid-HEADER raises like the mid-payload cut does —
    silently returning the earlier records would hide the loss."""
    full = _record("http://a.example/", DATE, "body") + (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Tar"
    )
    p = tmp_path / "headcut.wet"
    p.write_bytes(full)
    with pytest.raises(Exception, match="header block"):
        read_wet(spark, str(p), strict=True).collect()


def test_native_path_case_insensitive_headers(spark, tmp_path):
    """WARC header field names are case-insensitive by spec — the
    native path's regexes must match 'Warc-Type:'/'content-length:'
    like the strict path's lowercased header dict does."""
    rec = (
        "WARC/1.0\r\n"
        "Warc-Type: conversion\r\n"
        "warc-target-uri: http://case.example/\r\n"
        "WARC-DATE: 2021-06-01T12:00:00Z\r\n"
        "content-length: 4\r\n"
        "\r\n"
        "text\r\n\r\n"
    ).encode()
    p = tmp_path / "cased.wet"
    p.write_bytes(rec)
    for strict in (True, False):
        rows = read_wet(spark, str(p), strict=strict).collect()
        assert len(rows) == 1, strict
        assert rows[0]["url"] == "http://case.example/"
        assert rows[0]["record_type"] == "conversion"
        assert rows[0]["text"] == "text"


def test_truncated_payload_raises(spark, tmp_path):
    """A file that ends inside a record's claimed payload must raise,
    not yield a silently short (content_length, text) pair."""
    full = _record("http://cut.example/", DATE, "x" * 500)
    p = tmp_path / "cut.wet"
    p.write_bytes(full[: len(full) - 300])
    with pytest.raises(Exception, match="truncated record"):
        read_wet(spark, str(p), strict=True).collect()


def test_truncated_gzip_member_raises(spark, tmp_path):
    """A gzip member cut mid-stream must raise instead of silently
    dropping the records in the lost tail."""
    member = gzip.compress(_record("http://gz.example/", DATE, "y" * 2000))
    p = tmp_path / "cutgz.wet.gz"
    p.write_bytes(member[: len(member) // 2])
    with pytest.raises(Exception, match="truncated gzip"):
        read_wet(spark, str(p), strict=True).collect()


def test_wet_doc_ids_distinct_for_same_url_date(spark, tmp_path):
    """doc_id hashes (url, date, text): two fetches of the same URL at
    the same date with DIFFERENT content get distinct ids."""
    p = tmp_path / "dupurl.wet"
    p.write_bytes(
        _record("http://dup.example/", DATE, "first body")
        + _record("http://dup.example/", DATE, "second body")
    )
    ids = [r["doc_id"] for r in wet_documents(spark, str(p)).collect()]
    assert len(ids) == 2 and len(set(ids)) == 2


def test_wet_readers_exported_from_sources_package():
    from wikiextractor_spark.sources import read_wet as rw
    from wikiextractor_spark.sources import wet_documents as wd

    assert callable(rw) and callable(wd)


def test_unterminated_header_absorbing_next_record_raises(spark, tmp_path):
    """Review finding r8: a header missing its blank-line terminator
    must not silently ABSORB the following record (merging two
    record starts into one phantom row) — it raises."""
    cut_header = (
        b"WARC/1.0\r\n"
        b"WARC-Target-URI: http://victim.example/\r\n"
    )  # no blank line before the next record begins
    p = tmp_path / "absorb.wet"
    p.write_bytes(cut_header + _record("http://ok.example/", DATE, "fine"))
    with pytest.raises(Exception, match="unterminated header"):
        read_wet(spark, str(p), strict=True).collect()


def test_native_headers_extracted_from_header_block_only(spark, tmp_path):
    """Review finding r8: native-path header regexes read the HEADER
    BLOCK only — 'warc-date:' strings inside the page text must not
    populate the column when the real header is absent."""
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://nodate.example/\r\n"
        "Content-Length: 32\r\n"
        "\r\n"
        "page about warc-date: 1999-01-01"
    ).encode() + b"\r\n\r\n"
    p = tmp_path / "payload_header.wet"
    p.write_bytes(rec)
    rows = read_wet(spark, str(p), strict=False).collect()
    assert len(rows) == 1
    assert rows[0]["warc_date"] is None  # NOT the payload string
    assert "warc-date" in rows[0]["text"]


def test_native_header_value_cannot_shadow_later_header(spark, tmp_path):
    """ADVICE r9: native-path header regexes are LINE-anchored — a
    header VALUE that contains another header's name (a query string
    like ?WARC-Type:response in the target URI, appearing BEFORE the
    real WARC-Type line) must not be matched as that header."""
    body = b"anchored body"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Target-URI: http://x.example/?WARC-Type:response\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Date: 2021-06-01T12:00:00Z\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode() + body + b"\r\n\r\n"
    p = tmp_path / "shadow.wet"
    p.write_bytes(rec)
    for strict in (True, False):
        rows = read_wet(spark, str(p), strict=strict).collect()
        assert len(rows) == 1, strict
        assert rows[0]["record_type"] == "conversion", strict
        assert rows[0]["url"] == "http://x.example/?WARC-Type:response"
        assert rows[0]["warc_date"] == "2021-06-01T12:00:00Z"
        assert rows[0]["text"] == "anchored body"


def test_wet_to_prepare_corpus_end_to_end(spark, tmp_path):
    """VERDICT r8 item 8 (stretch): the full crawl-to-corpus path as
    ONE plan — a synthesized multi-member .wet.gz through
    wet_documents → prepare_corpus (URL blocklist + Gopher + exact
    dedup), survivor set pinned; the plan audit shows the WET parse
    kernel as the only Python stage."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from wikiextractor_spark.operators.corpus import prepare_corpus

    stop_rich = (
        "the history of the village is a record of the people and the "
        "land that came to be known with the river and the school "
    ) * 4  # > 50 words, stopword-rich — passes the Gopher gate
    records = [
        # (url, text) — each survives/falls at a specific stage
        ("http://keep.example/a", stop_rich.strip()),            # kept
        ("http://spam.bad.net/x", stop_rich.strip() + " spam"),  # blocklist
        ("http://keep.example/dup", stop_rich.strip()),          # exact dup
        ("http://keep.example/b", "too few words here"),         # Gopher
        ("http://keep.example/c", stop_rich.strip() + " tail"),  # kept
    ]
    # multi-member gzip: each record its own member (the crawl wire
    # format), concatenated
    p = tmp_path / "crawl.wet.gz"
    p.write_bytes(
        b"".join(gzip.compress(_record(u, DATE, t)) for u, t in records)
    )

    docs = wet_documents(spark, str(p), strict=True)
    out = prepare_corpus(
        docs,
        url_blocklist=["bad.net"],
        gopher=True,
        dedup="exact",
    )
    kept = {r["url"] for r in out.select("url").collect()}
    # the dup pair keeps exactly one member (min-id survivor — which
    # of the two urls wins depends on the content hash ids)
    dup_urls = {"http://keep.example/a", "http://keep.example/dup"}
    assert len(kept & dup_urls) == 1
    assert "http://keep.example/c" in kept
    assert "http://spam.bad.net/x" not in kept
    assert "http://keep.example/b" not in kept
    assert len(kept) == 2

    # plan audit: the WET parse kernel (MapInPandas) is the ONLY
    # Python operator kind — every gate after the source is
    # JVM-native.  It appears in at most two plan branches: the
    # blocklist stage's probe self-joins the raw scan by stated
    # contract (operators/corpus.py — the probe must see the raw
    # column-pruned scan), which re-evaluates the source kernel on
    # the sliver branch; a real crawl flow lands the parsed docs in
    # parquet between parse and corpus prep.
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    py_ops = re.findall(r"^\(\d+\) (\w*(?:EvalPython|MapInPandas|"
                        r"MapInArrow)\w*)", plan, re.M)
    assert py_ops and set(py_ops) == {"MapInPandas"}, plan
    assert len(py_ops) <= 2, plan
