from wikiextractor_spark.streaming.stream import (  # noqa: F401
    clean_documents_stream,
    windowed_event_counts,
)
