"""The `pages` source (input_hint shape: url, warc_ts, html, text, lang).

Two forms:
- ``read_pages_parquet`` — plain parquet ingest form (what a WARC-conversion
  upstream would hand us);
- ``ingest_corpus_to_icetable`` — lands a corpus into the Iceberg-style
  partitioned `pages` table (partition = days(warc_ts)), which is what the
  extract plan consumes with manifest-level pruning.

The reference's source was one HTTP upload per document
(/root/reference/main.py:24-31); here a source is a table scan — O1 in
SURVEY.md §2.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.tables.icetable import IceTable


def read_pages_parquet(spark: SparkSession, path: str | pathlib.Path) -> DataFrame:
    return spark.read.parquet(str(path))


def ingest_corpus_to_icetable(
    spark: SparkSession,
    corpus_parquet: str | pathlib.Path,
    table_root: str | pathlib.Path,
) -> IceTable:
    """corpus parquet → partitioned pages IceTable (append commit)."""
    tbl = IceTable(table_root)
    df = read_pages_parquet(spark, corpus_parquet).withColumn(
        "partition_date", F.to_date("warc_ts")
    )
    tbl.append(df)
    return tbl


def ingest_warc_to_icetable(
    spark: SparkSession,
    warc_path: str | pathlib.Path,
    table_root: str | pathlib.Path,
) -> IceTable:
    """.warc.gz file/dir/glob → partitioned pages IceTable."""
    from pdf_extractor_spark.sources.warc import read_warc

    tbl = IceTable(table_root)
    df = read_warc(spark, str(warc_path)).withColumn(
        "partition_date", F.to_date("warc_ts")
    )
    tbl.append(df)
    return tbl
