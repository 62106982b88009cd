"""HTML→text extraction: the C4/RefinedWeb step between a raw-WARC
``response`` record and the engine's ``documents`` surface.

Modern crawl pipelines that want better text than Common Crawl's own
WET extraction start from raw HTML (C4 strips markup itself;
RefinedWeb/trafilatura re-extract from WARC), then run the SAME
boilerplate/quality gates this engine already has.  This module is
the markup-removal step, deliberately native: one
``regexp_replace`` cascade plus array ops, zero Python, so it runs
inside whole-stage codegen on every page of a 100 TB crawl and
composes with :func:`~wikiextractor_spark.operators.spans.
remove_boilerplate_lines` / the Gopher and repetition gates for the
heuristic-boilerplate half of the pipeline.

Extraction semantics (each step global, applied in order — the order
is part of the contract and the DuckDB twin restates it verbatim):

1. drop HTML comments (non-greedy, dotall — a comment may span lines
   and contain tags);
2. drop CONTENT-BEARING-invisible elements wholesale (``script``,
   ``style``, ``noscript``, ``template``, ``svg``, ``head``,
   ``iframe``, ``object``): open tag through matching close tag,
   non-greedy.  An UNCLOSED drop-element leaves its content in place
   (the dangling open tag itself is removed by step 4) — resyncing to
   a guessed boundary could silently swallow the page body, the same
   trade the WET parser refuses;
3. block-level tags (open or close) become newlines — paragraph/list/
   table/heading structure survives as line structure, which is what
   the downstream line-grain operators (boilerplate removal, compact)
   key on;
4. every remaining tag-shaped run (``<`` + letter, ``/`` or ``!``,
   through the next ``>``) is dropped; a stray ``<`` that never
   closes is left as text (math, code);
5. a SINGLE entity-unescape pass over the common named entities,
   ``&amp;`` deliberately LAST so double-encoded entities
   (``&amp;lt;``) unescape exactly once (numeric character
   references are NOT decoded — a native cascade cannot map code
   points to characters; stated limit, they survive as text);
6. whitespace normalization: horizontal whitespace collapses to one
   space, lines are trimmed, empty lines dropped.

Both engines' regexes here are RE2/Java-common constructs (non-greedy
quantifiers, ``(?s)``, ``\\b``, no backreferences; case-insensitivity
via explicit ASCII char classes — see :func:`_ci` — because the two
engines' ``(?i)`` fold different alphabets), so the DuckDB oracle
twin (:func:`html_to_text_duckdb_sql`) is the same cascade restated,
not a reimplementation.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# elements whose CONTENT is invisible text (step 2) — dropped wholesale
DROP_CONTENT_TAGS = (
    "script", "style", "noscript", "template", "svg", "head",
    "iframe", "object",
)

# tags that imply a line break (step 3); longer names before shorter
# prefix-sharing ones so leftmost-FIRST alternation (Java and RE2
# agree) never half-matches `table` as `t...`
BLOCK_TAGS = (
    "blockquote", "figcaption", "fieldset", "article", "section",
    "header", "footer", "figure", "thead", "tbody", "tfoot", "table",
    "aside", "main", "form", "nav", "pre", "div", "ul", "ol", "li",
    "tr", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "hr", "br",
    "p",
)

# single unescape pass (step 5): (pattern, replacement), &amp; LAST
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

def _ci(tag: str) -> str:
    """ASCII-case-insensitive tag-name pattern via explicit char
    classes (``[sS][cC]...``), NOT ``(?i)``: Java's inline ``(?i)``
    folds ASCII only while RE2's folds full Unicode (``ſ`` matches
    ``s``), so an ``(?i)`` here would let crafted input like
    ``<ſcript>`` diverge between the Spark cascade and its DuckDB
    twin.  Tag names are ASCII, so the char-class form is exact and
    identical on both engines."""
    return "".join(
        f"[{c}{c.upper()}]" if c.isalpha() else c for c in tag
    )


_COMMENT_RE = r"(?s)<!--.*?-->"
_BLOCK_RE = r"</?(?:%s)\b[^>]*>" % "|".join(_ci(t) for t in BLOCK_TAGS)
_TAG_RE = r"<[A-Za-z/!][^>]*>"


def _drop_re(tag: str) -> str:
    t = _ci(tag)
    return rf"(?s)<{t}\b[^>]*>.*?</{t}\s*>"


def html_to_text(col: Column) -> Column:
    """Markup-stripped plain text of an HTML column (module cascade).

    Scale shape: a pure expression tree — no UDF, no shuffle; the
    whole cascade runs in one codegen stage over the scan."""
    c = F.regexp_replace(col, _COMMENT_RE, "")
    for tag in DROP_CONTENT_TAGS:
        c = F.regexp_replace(c, _drop_re(tag), "")
    c = F.regexp_replace(c, _BLOCK_RE, "\n")
    c = F.regexp_replace(c, _TAG_RE, "")
    for pat, rep in HTML_ENTITIES:
        c = F.regexp_replace(c, pat, rep)
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    lines = F.transform(F.split(c, "\n"), lambda l: F.trim(l))
    return F.array_join(F.filter(lines, lambda l: l != F.lit("")), "\n")


def html_to_text_duckdb_sql(expr: str) -> str:
    """The DuckDB restatement of :func:`html_to_text` over the SQL
    expression ``expr`` — generated from the SAME tag/entity tables
    so the two engines cannot drift (the oracle-twin pattern of
    ``cleaning.clean_markup_duckdb_sql``)."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    c = f"regexp_replace({expr}, '{_COMMENT_RE}', '', 'g')"
    for tag in DROP_CONTENT_TAGS:
        c = f"regexp_replace({c}, '{esc(_drop_re(tag))}', '', 'g')"
    c = f"regexp_replace({c}, '{esc(_BLOCK_RE)}', chr(10), 'g')"
    c = f"regexp_replace({c}, '{esc(_TAG_RE)}', '', 'g')"
    for pat, rep in HTML_ENTITIES:
        c = f"replace({c}, '{esc(pat)}', '{esc(rep)}')"
    c = f"regexp_replace({c}, '[ \\t\\r\\f]+', ' ', 'g')"
    joined = (
        "array_to_string(list_filter(list_transform("
        f"string_split({c}, chr(10)), l -> trim(l)), "
        "l -> l <> ''), chr(10))"
    )
    # DuckDB's array_to_string is NULL on an EMPTY list where Spark's
    # array_join is '' — restate Spark's semantics: NULL in → NULL
    # out, otherwise never NULL (expr is referenced twice, so pass a
    # column/CTE reference, not a bound parameter)
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL "
        f"ELSE coalesce({joined}, '') END"
    )
