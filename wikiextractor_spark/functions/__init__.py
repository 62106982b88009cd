from wikiextractor_spark.functions.cleaning import (  # noqa: F401
    clean_markup_native,
    clean_markup_duckdb_sql,
    NATIVE_STEPS,
)
