"""Iceberg-style table format over Parquet (offline substitute).

No iceberg-spark-runtime jar exists in this sandbox (verified across all
Spark jars — SURVEY.md §0), so the Iceberg semantics the north_rule needs —
snapshot ids, manifest-listed data files, partition-level atomic overwrite,
manifest-driven partition pruning — are implemented as a thin, boring layer
over Parquet. The API mirrors what real Iceberg would provide so a runtime
jar becomes a config switch (`df.writeTo(tbl).append()`), not a redesign.
"""

from pdf_extractor_spark.tables.icetable import IceTable

__all__ = ["IceTable"]
