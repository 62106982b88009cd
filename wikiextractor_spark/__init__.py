"""wikiextractor_spark — a PySpark-native analytics engine with the
capabilities of apertium/WikiExtractor, extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Architecture (SURVEY.md §7): everything is declared with the
DataFrame/SQL API so Catalyst plans it; Python appears only in five
Arrow-batched pandas UDFs (nested-delimiter drop, wikilink expansion,
entity unescape, fidelity clean, compact) whose semantics are not
regular-expression-expressible.
"""

__version__ = "0.1.0"

from wikiextractor_spark.config import ExtractorConfig  # noqa: F401
