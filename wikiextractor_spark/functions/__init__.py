from wikiextractor_spark.functions.cleaning import (  # noqa: F401
    clean_markup_native,
    clean_markup_duckdb_sql,
    NATIVE_STEPS,
)
from wikiextractor_spark.functions.html import (  # noqa: F401
    html_to_text,
    html_to_text_duckdb_sql,
)
