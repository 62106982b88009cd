"""Arrow-batched pandas UDFs — the engine's entire Python surface.

Exactly the five kernels SURVEY.md §2.11 budgets for (nested-delimiter
drop, wikilink expansion, entity unescape, fidelity clean, compact);
everything else in the engine is native Catalyst.  All are scalar
pandas UDFs so text crosses the JVM↔Python boundary in Arrow batches,
never row-at-a-time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from wikiextractor_spark import textops
from wikiextractor_spark.config import ExtractorConfig


def _map_str(series: pd.Series, fn) -> pd.Series:
    return series.map(lambda t: fn(t) if t is not None else None)


def make_drop_nested_udf(open_delim: str, close_delim: str):
    """UDF dropping nested ``open...close`` regions (C1/C2)."""

    @pandas_udf(StringType())
    def drop_nested_udf(s: pd.Series) -> pd.Series:
        return _map_str(s, lambda t: textops.drop_nested(t, open_delim, close_delim))

    return drop_nested_udf


def make_expand_wikilinks_udf(cfg: ExtractorConfig = ExtractorConfig()):
    """UDF expanding ``[[target|anchor]]trail`` wikilinks (C3/P5)."""
    namespaces, keep = cfg.accepted_namespaces, cfg.keep_links

    @pandas_udf(StringType())
    def expand_wikilinks_udf(s: pd.Series) -> pd.Series:
        return _map_str(s, lambda t: textops.expand_wikilinks(t, namespaces, keep))

    return expand_wikilinks_udf


@pandas_udf(StringType())
def unescape_entities_udf(s: pd.Series) -> pd.Series:
    """UDF decoding HTML/XML entities with leave-malformed semantics (C13)."""
    return _map_str(s, textops.unescape_entities)


def make_clean_udf(cfg: ExtractorConfig = ExtractorConfig()):
    """Fidelity-mode ``clean()``: the full C1-C27 chain in exact
    source order (reference WikiExtractor.py:368-456)."""
    namespaces, keep = cfg.accepted_namespaces, cfg.keep_links

    @pandas_udf(StringType())
    def clean_wikitext_udf(s: pd.Series) -> pd.Series:
        return _map_str(s, lambda t: textops.clean_wikitext(t, namespaces, keep))

    return clean_wikitext_udf


def make_compact_udf(structure: bool = False):
    """``compact()``: per-document line state machine returning
    ``array<string>`` — follow with ``posexplode`` (SURVEY.md §2.5)."""

    @pandas_udf(ArrayType(StringType()))
    def compact_lines_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: textops.compact_lines(t, structure) if t is not None else None)

    return compact_lines_udf


# Default instances under the reference's production config
clean_wikitext_udf = make_clean_udf()
compact_lines_udf = make_compact_udf(structure=False)
drop_templates_udf = make_drop_nested_udf(r"{{", r"}}")
drop_tables_udf = make_drop_nested_udf(r"{\|", r"\|}")
expand_wikilinks_udf = make_expand_wikilinks_udf()
