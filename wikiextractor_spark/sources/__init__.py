from wikiextractor_spark.sources.dump import (  # noqa: F401
    discover_base_prefix,
    read_pages,
)
from wikiextractor_spark.sources.jsonl import (  # noqa: F401
    read_documents_jsonl,
    split_corrupt,
)
from wikiextractor_spark.sources.vital import read_vital_titles  # noqa: F401
from wikiextractor_spark.sources.tables import load_tables, register_views  # noqa: F401
from wikiextractor_spark.sources.wet import (  # noqa: F401
    read_warc_responses,
    read_wet,
    warc_html_documents,
    wet_documents,
)
