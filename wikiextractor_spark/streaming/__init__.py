from wikiextractor_spark.streaming.corpus import (  # noqa: F401
    DOCUMENTS_URL_SCHEMA,
    prepare_corpus_stream,
)
from wikiextractor_spark.streaming.dedup import (  # noqa: F401
    compact_signature_store,
    dedup_events_to_parquet,
    deduped_document_stream,
    deduped_event_stream,
    near_dedup_documents_incremental,
    near_deduped_document_stream,
)
from wikiextractor_spark.streaming.sessionize import (  # noqa: F401
    read_sessions,
    sessionize_stream,
    sessionize_to_parquet,
)
from wikiextractor_spark.streaming.stream import (  # noqa: F401
    clean_documents_stream,
    windowed_event_counts,
    windowed_event_counts_memory,
    windowed_event_stream,
)
from wikiextractor_spark.streaming.annindex import (  # noqa: F401
    add_embeddings_batch,
    index_embeddings_stream,
)
from wikiextractor_spark.streaming.annindex import (  # noqa: F401
    compact_ingest_log,
)
from wikiextractor_spark.streaming.crawl import (  # noqa: F401
    crawl_documents_stream,
)
