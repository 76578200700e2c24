"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship text-pipeline profile over the
sf0.001 documents table. ``queries()``/``oracle_sql()`` expose the full
catalog from ``pdf_extractor_spark.queries`` — every operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal), EACH with a DuckDB
oracle. Binary-payload queries (extraction, media decode) are oracled
against expected-output parquet computed by the pure-Python
implementations (scripts/build_expected_oracles.py); per-url byte
identity of the full extracted text is additionally gated by
``tests/test_golden_bytes.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.queries import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the O11 structured-extraction driver profile (lang-ID +
    token/char counts + fingerprint + simhash) in one shuffle-free
    projection pass — the same query the catalog oracle-checks as
    ``o11_struct_extract``."""
    return CATALOG["o11_struct_extract"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in CATALOG.items()
        if spec.oracle is not None
    }
