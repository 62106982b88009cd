"""PII detection and redaction for training-data pipelines.

Large crawled corpora leak emails, phone numbers, IP addresses and
government-ID-shaped strings; the standard prep step replaces them
with placeholder tokens (so models can't memorize them) while keeping
the surrounding text intact.

All native ``regexp_replace`` / ``regexp_count`` — the redaction
chain runs inside whole-stage codegen at scan speed, which is the
only acceptable cost for a pass that must touch EVERY byte of a
100 TB corpus.  Patterns are deliberately precision-leaning (false
redactions destroy clean training text; a recall-first pass belongs
in a dedicated PII model, not a regex).

Note these are Java regexes (executors run the JVM engine): ``\\d``
/ ``\\b`` are ASCII-only there, unlike Python's Unicode defaults —
the patterns below use explicit classes and lookarounds so both
engines would agree anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ordered: more specific patterns first so e.g. an IPv4 inside a URL
# is redacted before the generic phone pattern could nibble at it
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ipv4": (
        r"(?<![0-9.])(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])(?![0-9.])",
        "<IP>",
    ),
    "ssn": (
        r"(?<![0-9-])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9-])",
        "<ID>",
    ),
    "phone": (
        r"(?<![0-9])(?:\+?[0-9]{1,2}[ .-]?)?(?:\([0-9]{3}\)|[0-9]{3})"
        r"[ .-][0-9]{3}[ .-][0-9]{4}(?![0-9])",
        "<PHONE>",
    ),
}


def redact_pii(
    text_col: str = "text", kinds: tuple[str, ...] | None = None,
) -> Column:
    """Replace each PII match with its placeholder token, applying
    ``kinds`` (default: all) in PII_PATTERNS order."""
    out = F.col(text_col) if isinstance(text_col, str) else text_col
    for kind in kinds or tuple(PII_PATTERNS):
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text_col: str = "text") -> Column:
    """Per-kind match counts as a struct — the audit/reporting side
    (run BEFORE redaction; redacted text reports zero)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.struct(
        *(
            F.regexp_count(c, F.lit(p)).alias(kind)
            for kind, (p, _) in PII_PATTERNS.items()
        )
    )


def has_pii(text_col: str = "text") -> Column:
    """True when any pattern matches — the cheap pre-filter: redact
    only rows that need it, skip the rewrite for the clean majority."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    cond = None
    for _, (p, _t) in PII_PATTERNS.items():
        this = F.regexp_count(c, F.lit(p)) > 0
        cond = this if cond is None else (cond | this)
    return cond
