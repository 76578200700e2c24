"""Sources: building/reading the `pages` input table."""

from pdf_extractor_spark.sources.pages import (
    ingest_corpus_to_icetable,
    read_pages_parquet,
)

__all__ = ["ingest_corpus_to_icetable", "read_pages_parquet"]
