from wikiextractor_spark.operators import (  # noqa: F401
    asof,
    chunking,
    corpus,
    decontam,
    dedup,
    multimodal,
    packing,
    rangejoin,
    sampling,
    similarity,
    sketches,
    skew,
)
