from wikiextractor_spark.operators import asof, dedup, multimodal, similarity  # noqa: F401
