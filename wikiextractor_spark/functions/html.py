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
# ALL whitespace, as an explicit class: Java's \s includes \x0B where
# RE2's does not, so spelling the class out keeps the two engines'
# collapse identical on vertical-tab input — the same reason every
# \s-shaped slot below (_drop_re, _ANCHOR_RE close tags) uses _WSC
# instead of \s
_WSC = r"[ \t\r\n\f]"
_WS_RE = _WSC + "+"
# anchor CONTENT spans for link-density scoring (extract_main_content):
# group 1 is everything between <a ...> and </a>, dotall + non-greedy;
# explicit [aA] for the same cross-engine case-folding reason as _ci
_ANCHOR_RE = rf"(?s)<[aA]\b[^>]*>(.*?)</[aA]{_WSC}*>"
# main-content block boundaries: BLOCK_TAGS minus the line-break tags
# — jusText/boilerpipe segment on true block elements, and treating
# every <br>/<hr> as a boundary would make each line of a
# <br>-separated paragraph (addresses, poetry, forum posts) clear the
# length floor on its own; inside a block they are stripped by
# _TAG_RE, so the block scores as one whitespace-collapsed unit
_MAIN_SPLIT_RE = r"</?(?:%s)\b[^>]*>" % "|".join(
    _ci(t) for t in BLOCK_TAGS if t not in ("br", "hr")
)
# ... and inside a block those line-break tags become a SPACE before
# the split (plain _TAG_RE stripping would glue 'St<br>London' into
# 'StLondon'); the whitespace collapse then folds any run
_MAIN_BR_RE = r"</?(?:%s)\b[^>]*>" % "|".join(_ci(t) for t in ("br", "hr"))


# page-metadata patterns (html_title / html_lang): first <title>
# element's content; the lang attribute of an <html ...> tag (a
# required whitespace char before `lang` keeps data-lang/xml:lang
# from matching).  Leftmost-first match in both engines = the
# document's FIRST occurrence wins, stated
_TITLE_RE = rf"(?s)<{_ci('title')}\b[^>]*>(.*?)</{_ci('title')}{_WSC}*>"
_LANG_RE = (
    rf"<{_ci('html')}\b[^>]*?{_WSC}{_ci('lang')}{_WSC}*={_WSC}*"
    r"[\"']?([A-Za-z][A-Za-z0-9_-]*)"
)


def _drop_re(tag: str) -> str:
    t = _ci(tag)
    return rf"(?s)<{t}\b[^>]*>.*?</{t}{_WSC}*>"


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


def _sql_esc(s: str) -> str:
    """Escape a pattern/literal for embedding in a DuckDB '...'."""
    return s.replace("'", "''")


def _sql_strip(x: str) -> str:
    """DuckDB fragment: tag-strip + entity pass + whitespace-collapse
    + trim of expression ``x`` — the per-block `clean` shared by both
    generated twins."""
    t = f"regexp_replace({x}, '{_sql_esc(_TAG_RE)}', '', 'g')"
    for pat, rep in HTML_ENTITIES:
        t = f"replace({t}, '{_sql_esc(pat)}', '{_sql_esc(rep)}')"
    return f"trim(regexp_replace({t}, '{_WS_RE}', ' ', 'g'))"


def html_to_text_duckdb_sql(expr: str) -> str:
    """The DuckDB restatement of :func:`html_to_text` over the SQL
    expression ``expr`` — generated from the SAME tag/entity tables
    so the two engines cannot drift (the oracle-twin pattern of
    ``cleaning.clean_markup_duckdb_sql``)."""
    esc = _sql_esc
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


# --------------------------------------------------------------------------
# Page metadata: declared title and language
# --------------------------------------------------------------------------
#
# Every crawl pipeline keeps the page's declared metadata alongside
# the extracted text: the <title> (a dedup/quality signal and the
# usual display field) and the <html lang=...> attribute (the prior
# the lang-ID gate checks its prediction against — FineWeb/CCNet both
# carry it).  Native regexp_extract, empty string when absent (the
# shared no-match semantics of Spark and DuckDB, verified), NULL in →
# NULL out.


def html_title(col: Column) -> Column:
    """Content of the document's first ``<title>`` element —
    entity-unescaped (single pass, ``&amp;`` last, like the module
    cascade) and whitespace-collapsed; ``''`` when the page has no
    title.  A ``<title>`` inside an HTML comment is still matched
    (stated: metadata extraction does not run the comment drop —
    title lives in ``<head>``, where real comments around it are
    rare and a full cascade per metadata column would double the
    scan cost)."""
    t = F.regexp_extract(col, _TITLE_RE, 1)
    for pat, rep in HTML_ENTITIES:
        t = F.regexp_replace(t, pat, rep)
    return F.trim(F.regexp_replace(t, _WS_RE, " "))


def html_lang(col: Column) -> Column:
    """Lowercased value of the ``lang`` attribute on an ``<html>``
    tag (``en``, ``en-us``, and the POSIX-style ``en_us`` sloppiness
    real crawls carry — ``_`` is admitted in the subtag), ``''`` when
    undeclared — the declared-language PRIOR, to be checked against
    (not substituted for) the engine's n-gram lang-ID.

    Stated heuristic limit (like the title-in-comment note): the
    attribute scan is regex-grain, so a ``lang=`` TOKEN inside a
    quoted attribute VALUE on the html tag (``<html data-x="a
    lang=en">``) matches — a rare false-positive a non-parsing
    scan cannot distinguish without tracking quote state."""
    return F.lower(F.regexp_extract(col, _LANG_RE, 1))


def html_title_duckdb_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_title` (same pattern/entity
    tables)."""
    t = f"regexp_extract({expr}, '{_sql_esc(_TITLE_RE)}', 1)"
    for pat, rep in HTML_ENTITIES:
        t = f"replace({t}, '{_sql_esc(pat)}', '{_sql_esc(rep)}')"
    return f"trim(regexp_replace({t}, '{_WS_RE}', ' ', 'g'))"


def html_lang_duckdb_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_lang` (same pattern)."""
    return f"lower(regexp_extract({expr}, '{_sql_esc(_LANG_RE)}', 1))"


# --------------------------------------------------------------------------
# Main-content extraction: block-level link-density + length scoring
# --------------------------------------------------------------------------
#
# The step ABOVE the tag-strip cascade: :func:`html_to_text` keeps
# every text node, so nav menus, footer link farms, and cookie
# banners survive as short link-dense lines.  jusText/boilerpipe (and
# trafilatura's fallback heuristics) classify BLOCKS instead: split
# the page at block-level tag boundaries, score each block by its
# visible text length and its link density (anchor-text chars /
# total chars), and keep only long, low-link-density blocks — the
# main article body.  Same shape here, deliberately native: the
# whole classifier is one higher-order-function expression over the
# split array (no UDF, no shuffle, NULL in → NULL out), and the
# density comparison is INTEGER arithmetic
# (``anchor_chars * 100 <= max_link_pct * text_chars``) so the
# DuckDB twin cannot drift on float division.
#
# Stated limits (deterministic, mirrored by the twin): an anchor
# whose open and close tags land in different blocks (malformed
# nesting across a block boundary) contributes 0 to anchor length —
# the span regex never sees a complete anchor.
#
# Stopword density — the OTHER half of full jusText — is available at
# the BLOCK grain via ``min_stop_pct`` (r11): a long, link-free
# nav/legal block ("Copyright notice … trademark policy …") passes the
# length and density cuts but carries almost no function words, which
# is exactly the signal jusText keys on.  Off by default (None): the
# document-grain Gopher gate already applies the same signal
# downstream, and a block floor is a LANGUAGE-DEPENDENT judgment the
# caller must opt into with the right word list
# (:data:`wikiextractor_spark.functions.textstats.STOPWORDS` reused as
# the default — one list repo-wide, never a second copy to drift).
# Word grain for the floor: the block text is already
# whitespace-collapsed, so words split on single spaces; each word is
# lowercased and stripped of surrounding non-alphanumerics before the
# membership test (``"The," → the``), and the comparison is the same
# INTEGER arithmetic as the density cut.

MAIN_MIN_CHARS = 25
MAIN_MAX_LINK_PCT = 33

# surrounding-punctuation strip for the stopword membership test —
# explicit ASCII classes for the usual cross-engine reasons
_WORD_TRIM_RE = r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$"


def _default_stopwords() -> tuple[str, ...]:
    from wikiextractor_spark.functions.textstats import STOPWORDS

    return STOPWORDS["en"]


def extract_main_content(
    col: Column, *,
    min_chars: int = MAIN_MIN_CHARS,
    max_link_pct: int = MAIN_MAX_LINK_PCT,
    min_stop_pct: int | None = None,
    stopwords: tuple[str, ...] | None = None,
) -> Column:
    """Main-article text of an HTML column: comments and invisible
    elements dropped, the page split into blocks at block-tag
    boundaries, each block reduced to whitespace-collapsed visible
    text, and only blocks with ``len >= min_chars`` and anchor-text
    share ``<= max_link_pct`` percent kept, one block per output
    line.

    ``min_stop_pct`` (r11, opt-in) adds the block-grain stopword
    floor that completes the published jusText shape: a kept block
    must also have at least that percentage of its words in
    ``stopwords`` (default the engine's English list — see the module
    comment on language dependence).

    Scale shape: a pure expression tree over one column — no UDF, no
    shuffle, one codegen stage; per-row cost is linear in the HTML
    size like :func:`html_to_text`."""

    def _clean(x: Column) -> Column:
        t = F.regexp_replace(x, _TAG_RE, "")
        for pat, rep in HTML_ENTITIES:
            t = F.regexp_replace(t, pat, rep)
        return F.trim(F.regexp_replace(t, _WS_RE, " "))

    c = F.regexp_replace(col, _COMMENT_RE, "")
    for tag in DROP_CONTENT_TAGS:
        c = F.regexp_replace(c, _drop_re(tag), "")
    c = F.regexp_replace(c, _MAIN_BR_RE, " ")
    # all length/density arithmetic in BIGINT: F.length is 32-bit int
    # and a machine-generated link page can put >21 M anchor chars in
    # one block, where `alen * 100` would throw under ANSI mode (or
    # wrap and silently KEEP the farm with ANSI off); DuckDB's
    # length() is already BIGINT, so this also keeps the twin's
    # arithmetic bit-identical
    blocks = F.transform(
        F.split(c, _MAIN_SPLIT_RE),
        lambda x: F.struct(
            _clean(x).alias("txt"),
            F.aggregate(
                F.regexp_extract_all(x, F.lit(_ANCHOR_RE), F.lit(1)),
                F.lit(0).cast("bigint"),
                lambda acc, a: acc + F.length(_clean(a)).cast("bigint"),
            ).alias("alen"),
        ),
    )

    if min_stop_pct is not None:
        # bind the word array ONCE per block (the repo's let-bind
        # idiom): a second struct layer over the already-materialized
        # txt field, so neither the clean cascade nor the split+filter
        # chain is re-evaluated across the two stop-floor consumers
        blocks = F.transform(
            blocks,
            lambda b: F.struct(
                b["txt"].alias("txt"),
                b["alen"].alias("alen"),
                F.filter(
                    F.split(b["txt"], " "), lambda w: w != F.lit("")
                ).alias("words"),
            ),
        )

    def _keep(b: Column) -> Column:
        pred = (F.length(b["txt"]) >= F.lit(min_chars)) & (
            b["alen"] * F.lit(100).cast("bigint")
            <= F.lit(max_link_pct).cast("bigint")
            * F.length(b["txt"]).cast("bigint")
        )
        if min_stop_pct is not None:
            stops = tuple(
                stopwords if stopwords is not None else _default_stopwords()
            )
            stopn = F.size(
                F.filter(
                    b["words"],
                    lambda w: F.lower(
                        F.regexp_replace(w, _WORD_TRIM_RE, "")
                    ).isin(*stops),
                )
            )
            pred = pred & (
                stopn.cast("bigint") * F.lit(100).cast("bigint")
                >= F.lit(min_stop_pct).cast("bigint")
                * F.size(b["words"]).cast("bigint")
            )
        return pred

    kept = F.filter(blocks, _keep)
    return F.array_join(F.transform(kept, lambda b: b["txt"]), "\n")


def extract_main_content_duckdb_sql(
    expr: str, *,
    min_chars: int = MAIN_MIN_CHARS,
    max_link_pct: int = MAIN_MAX_LINK_PCT,
    min_stop_pct: int | None = None,
    stopwords: tuple[str, ...] | None = None,
) -> str:
    """DuckDB restatement of :func:`extract_main_content` over the SQL
    expression ``expr`` — generated from the same tag/entity tables
    and the same integer density arithmetic (DuckDB's ``length`` and
    ``list_sum`` are already BIGINT, matching the Spark side's
    explicit casts), including the same opt-in block-grain stopword
    floor.  ``expr`` is referenced more than once: pass a column/CTE
    reference, not a parameter."""
    esc = _sql_esc
    c = f"regexp_replace({expr}, '{_COMMENT_RE}', '', 'g')"
    for tag in DROP_CONTENT_TAGS:
        c = f"regexp_replace({c}, '{esc(_drop_re(tag))}', '', 'g')"
    c = f"regexp_replace({c}, '{esc(_MAIN_BR_RE)}', ' ', 'g')"
    # list_sum is NULL on the empty list where Spark's aggregate
    # returns its 0 init — coalesce restores the shared semantics;
    # clean runs ONCE per block (and once per anchor) via the struct,
    # mirroring the Spark side's F.struct shape
    alen = (
        "coalesce(list_sum(list_transform(regexp_extract_all("
        f"x, '{esc(_ANCHOR_RE)}', 1), a -> length({_sql_strip('a')}))), 0)"
    )
    blocks = (
        f"list_transform(regexp_split_to_array({c}, "
        f"'{esc(_MAIN_SPLIT_RE)}'), "
        f"x -> struct_pack(txt := {_sql_strip('x')}, alen := {alen}))"
    )
    stop_pred = ""
    if min_stop_pct is not None:
        stops = tuple(
            stopwords if stopwords is not None else _default_stopwords()
        )
        stop_list = "[%s]" % ", ".join(f"'{esc(w)}'" for w in stops)
        # same let-bind as the Spark side: a second struct layer
        # carries the word array so split+filter runs once per block
        blocks = (
            f"list_transform({blocks}, b -> struct_pack("
            "txt := b.txt, alen := b.alen, "
            "words := list_filter(string_split(b.txt, ' '), "
            "w -> w <> '')))"
        )
        stopn = (
            f"len(list_filter(s.words, w -> list_contains({stop_list}, "
            f"lower(regexp_replace(w, '{esc(_WORD_TRIM_RE)}', '', 'g')))))"
        )
        stop_pred = (
            f" AND {stopn} * 100 >= {min_stop_pct} * len(s.words)"
        )
    kept = (
        f"list_filter({blocks}, s -> length(s.txt) >= {min_chars} "
        f"AND s.alen * 100 <= {max_link_pct} * length(s.txt)"
        f"{stop_pred})"
    )
    joined = (
        f"array_to_string(list_transform({kept}, s -> s.txt), chr(10))"
    )
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL "
        f"ELSE coalesce({joined}, '') END"
    )
