"""THE invariant test (BASELINE.json north_rule): the Spark pipeline's
``extracted_text`` is byte-identical per url to the pure-Python goldens."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.extract import extract_stage
from pdf_extractor_spark.operators.skew import salted_repartition
from tests.conftest import GOLDEN_DIR


@pytest.fixture(scope="module")
def pages(spark):
    return spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))


@pytest.fixture(scope="module")
def goldens(spark):
    return spark.read.parquet(str(GOLDEN_DIR / "goldens.parquet"))


def _assert_byte_identical(result_df, goldens_df):
    joined = (
        result_df.select("url", "doc_type", "extracted_text", "n_blocks", "error")
        .join(
            goldens_df.select(
                "url",
                F.col("doc_type").alias("g_doc_type"),
                F.col("extracted_text").alias("g_text"),
                F.col("text_sha256").alias("g_sha"),
                F.col("n_blocks").alias("g_n_blocks"),
                F.col("error").alias("g_error"),
            ),
            on="url",
            how="full_outer",
        )
        .collect()
    )
    assert joined, "empty join"
    for row in joined:
        assert row.doc_type == row.g_doc_type, (row.url, row.doc_type, row.g_doc_type)
        assert row.extracted_text is not None, row.url
        got_sha = hashlib.sha256(row.extracted_text.encode("utf-8")).hexdigest()
        if got_sha != row.g_sha:
            # raw bytes on mismatch for diffability (FIXTURES.md §2)
            raise AssertionError(
                f"byte mismatch for {row.url}:\n got={row.extracted_text[:400]!r}"
                f"\n exp={row.g_text[:400]!r}"
            )
        assert row.extracted_text == row.g_text, row.url
        assert row.n_blocks == row.g_n_blocks, row.url
        assert row.error == row.g_error, row.url


def test_spark_matches_goldens(spark, pages, goldens):
    _assert_byte_identical(extract_stage(pages), goldens)


def test_partitioning_is_irrelevant(spark, pages, goldens):
    """repartition(1) ≡ repartition(16) ≡ salted — output set identical
    (SURVEY.md §5.2 property 2 + 4)."""
    for df in (
        pages.repartition(1),
        pages.repartition(16),
        salted_repartition(pages, num_partitions=8),
    ):
        _assert_byte_identical(extract_stage(df), goldens)


def test_schema_exact(spark, pages):
    out = extract_stage(pages)
    assert [f.name for f in out.schema.fields] == [
        "url", "warc_ts", "doc_type", "extracted_text", "blocks",
        "n_blocks", "n_chars", "error",
    ]
    blocks_type = out.schema["blocks"].dataType.elementType
    assert [f.name for f in blocks_type.fields] == [
        "idx", "tag_path", "text", "text_density", "link_density", "kept",
    ]


def test_scan_prunes_columns(spark, pages):
    """The crawled `text` column must never reach the scan (SURVEY.md §4.2):
    ReadSchema of the physical plan contains only url, warc_ts, html."""
    plan = extract_stage(pages)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"url", "warc_ts", "html"}, cols
