"""Query catalog: every SURVEY.md §2 operator that is SQL-expressible,
re-expressed as an idiomatic Spark DataFrame query over the driver's
testdata tables, each paired with a DuckDB oracle SQL string.

Plus the training-data-pipeline operators (dedup, similarity search,
text analysis) that a 100 TB corpus pipeline needs.
"""

from pdf_extractor_spark.queries.catalog import CATALOG, QuerySpec

__all__ = ["CATALOG", "QuerySpec"]
