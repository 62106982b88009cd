from wikiextractor_spark.operators import (  # noqa: F401
    asof,
    chunking,
    dedup,
    multimodal,
    rangejoin,
    sampling,
    similarity,
    skew,
)
