"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship text-pipeline profile over the
sf0.001 documents table. ``queries()``/``oracle_sql()`` expose the full
catalog from ``pdf_extractor_spark.queries`` — every SQL-expressible
operator from SURVEY.md §2 plus the training-data-pipeline operators
(dedup, similarity search, text analysis), each with a DuckDB oracle.

The one oracle-less entry is ``extract_pages`` — the binary-payload
HTML/PDF extraction engine itself, whose per-url byte-identity is
verified against committed golden fixtures by
``tests/test_golden_bytes.py`` (not expressible in DuckDB SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.queries import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-document text profile (lang-ID + quality + tokens +
    fingerprint + simhash) in one shuffle-free projection pass, joined
    columns aligned on doc_id."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.dedup import TOKS_S, _SIMHASH_S
    from pdf_extractor_spark.queries.textstats import (
        _FP_S,
        _hits_spark,
        _pred_case,
        _LANG_ORDER,
    )

    sf_dir = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "toks", F.expr(TOKS_S)
    )
    for lg in _LANG_ORDER:
        df = df.withColumn(f"hits_{lg}", F.expr(_hits_spark(lg)))
    return df.select(
        "doc_id",
        "lang",
        F.expr(_pred_case()).alias("lang_pred"),
        F.expr("CAST(size(toks) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(length(text) AS BIGINT)").alias("n_chars_obs"),
        F.expr(_FP_S).alias("fingerprint"),
        F.expr(f"CAST({_SIMHASH_S} AS BIGINT)").alias("simhash"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in CATALOG.items()
        if spec.oracle is not None
    }
