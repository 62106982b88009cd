from wikiextractor_spark.operators import (  # noqa: F401
    asof,
    chunking,
    corpus,
    dedup,
    multimodal,
    packing,
    rangejoin,
    sampling,
    similarity,
    skew,
)
