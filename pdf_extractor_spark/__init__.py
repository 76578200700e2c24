"""pdf_extractor_spark — a brand-new PySpark-native main-content extraction engine.

Re-expresses the capabilities of the reference single-request PDF extraction
service (jfcardososantos/pdf-extractor, studied read-only at /root/reference)
as an idiomatic batch Spark job over an Iceberg-style table of
Common-Crawl-style web pages, per /root/repo/SURVEY.md and BASELINE.json.

Layout
------
ref_extractor/   pure-Python single-document extractor — the executable spec
corpus/          deterministic synthetic page-corpus generator (incl. PDF writer)
operators/       Spark stages: vectorized extraction (mapInPandas), skew salting
sources/         pages-table source helpers (Iceberg-style scan w/ pruning)
tables/          Iceberg-style snapshot/manifest table format over Parquet
plans/           end-to-end job plans: extract job, lineage, checkpoint-resume
functions/       column-expression library: text analytics, dedup, similarity
streaming/       Structured Streaming ingest variant of the extract stage
jobs/            spark-submit entrypoints
"""

from pdf_extractor_spark.version import EXTRACTOR_VERSION

__all__ = ["EXTRACTOR_VERSION"]
