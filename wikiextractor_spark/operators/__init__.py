from wikiextractor_spark.operators import (  # noqa: F401
    asof,
    dedup,
    multimodal,
    rangejoin,
    similarity,
    skew,
)
