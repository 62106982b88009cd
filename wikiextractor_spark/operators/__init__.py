from wikiextractor_spark.operators import dedup, multimodal, similarity  # noqa: F401
