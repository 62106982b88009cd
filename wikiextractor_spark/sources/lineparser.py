"""Bug-compatible fallback dump parser (SURVEY.md §2.1 S6 fallback).

The primary source is the splittable, schema-pruned XML reader in
:mod:`wikiextractor_spark.sources.dump`.  This module reproduces the
reference's quirky line-oriented state machine (``tagRE`` +
``process_data``, reference ``WikiExtractor.py:586-651``) for
byte-level parity runs, including its misfeatures:

* only the FIRST ``<tag>`` on a physical line is recognized, so a
  ``</text>`` preceded by another raw ``<`` tag on its line is missed
  and the parser stays "in text", swallowing subsequent markup lines;
* a one-line ``<revision><id>..<text>..`` never enters text mode;
* the first non-empty ``<id>`` wins and is only reset at ``</page>``,
  so a swallowed ``</page>`` leaks the previous page's id;
* one-line ``<text ...>body</text>`` handled via the fourth regex
  group (``m.lastindex == 4``).

Scale note: the Spark wrapper reads ``wholetext`` (one task per file)
because the parser state spans arbitrary line distances — this path
trades parallelism for fidelity; use the XML source for throughput.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The reference's single scan regex (WikiExtractor.py:586): leading
# text, first tag, optional same-line content and one trailing tag.
_TAG_RE = re.compile(r"(.*?)<(/?\w+)[^>]*>(?:([^<]*)(<.*?>)?)?")

PAGE_ROW_SCHEMA = StructType(
    [
        StructField("page_id", LongType()),
        StructField("page_id_raw", StringType()),
        StructField("title", StringType()),
        StructField("is_redirect", BooleanType()),
        StructField("text", StringType()),
    ]
)


def iter_file_lines(content: str) -> Iterator[str]:
    """Re-create Python file iteration over an in-memory dump: split on
    ``\\n`` only, keeping the terminator on every line but an unfinal
    last fragment."""
    parts = content.split("\n")
    for p in parts[:-1]:
        yield p + "\n"
    if parts[-1]:
        yield parts[-1]


def iter_pages(lines: Iterable[str]) -> Iterator[dict]:
    """Walk dump lines with the reference's exact state machine and
    yield one dict per ``</page>`` dispatch (unfiltered — predicate
    application lives in ``dump.filter_pages``)."""
    page_lines: list[str] = []
    page_id: str | None = None
    title: str | None = None
    redirect = False
    in_text = False
    for line in lines:
        tag = ""
        m = None
        if "<" in line:
            m = _TAG_RE.search(line)
            if m:
                tag = m.group(2)
        if tag == "page":
            page_lines = []
            redirect = False
        elif tag == "id" and not page_id:
            page_id = m.group(3)
        elif tag == "title":
            title = m.group(3)
        elif tag == "redirect":
            redirect = True
        elif tag == "text":
            in_text = True
            page_lines.append(line[m.start(3) : m.end(3)] + "\n")
            if m.lastindex == 4:  # one-line <text ...>body</text>
                in_text = False
        elif tag == "/text":
            if m.group(1):
                page_lines.append(m.group(1) + "\n")
            in_text = False
        elif in_text:
            page_lines.append(line)
        elif tag == "/page":
            yield {
                "page_id_raw": page_id,
                "title": title,
                "is_redirect": redirect,
                "text": "".join(page_lines),
            }
            page_id = None
            page_lines = []


def discover_base_prefix_lines(lines: Iterable[str]) -> str | None:
    """The ``<base>`` → url-prefix rule (reference
    ``WikiExtractor.py:647-651``) over raw lines."""
    for line in lines:
        if "<" not in line:
            continue
        m = _TAG_RE.search(line)
        if m and m.group(2) == "base" and m.group(3):
            base = m.group(3)
            return base[: base.rfind("/")]
    return None


def read_pages_lineparser(spark: SparkSession, path: str) -> DataFrame:
    """Spark wrapper: one wholetext row per dump file → mapInPandas
    page assembly.  Output schema matches ``dump.read_pages`` plus the
    reference's raw string id."""

    def _assemble(batches):
        for pdf in batches:
            rows = []
            for content in pdf["value"]:
                for page in iter_pages(iter_file_lines(content)):
                    raw = page["page_id_raw"]
                    try:
                        pid = int(raw) if raw is not None else None
                    except ValueError:
                        pid = None
                    rows.append(
                        (
                            pid,
                            raw,
                            page["title"],
                            page["is_redirect"],
                            page["text"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGE_ROW_SCHEMA.fields]
            )

    raw = spark.read.text(path, wholetext=True)
    return raw.mapInPandas(_assemble, schema=PAGE_ROW_SCHEMA)
