"""SURVEY.md §5.2 property invariants: the physical execution knobs that
change at 100 TB (input partitioning, Arrow batch size) must not change a
single output byte."""

from __future__ import annotations

from pdf_extractor_spark.operators.extract import extract_stage

from tests.conftest import GOLDEN_DIR


def _result_set(df):
    return {
        (r.url, r.doc_type, r.extracted_text, r.n_blocks, r.n_chars)
        for r in df.collect()
    }


def test_partitioning_is_irrelevant(spark):
    pages = spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))
    one = _result_set(extract_stage(pages.repartition(1)))
    many = _result_set(extract_stage(pages.repartition(64)))
    assert one == many
    assert len(one) == pages.count()


def test_arrow_batch_size_is_irrelevant(spark):
    pages = spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")  # pathological: 7-row Arrow batches
        tiny = _result_set(extract_stage(pages))
        spark.conf.set(key, "100000")
        one_batch = _result_set(extract_stage(pages))
    finally:
        if old is not None:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
    assert tiny == one_batch


def test_links_stage_partitioning_and_batch_size_irrelevant(spark):
    """The outlink stage rides the same execution knobs as extraction:
    neither input partitioning nor Arrow batch size may change one
    output row."""
    from pdf_extractor_spark.operators.links import links_stage

    pages = spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))

    def rset(df):
        return {(r.url, r.seq, r.href, r.anchor) for r in df.collect()}

    base = rset(links_stage(pages))
    assert rset(links_stage(pages.repartition(64))) == base
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        assert rset(links_stage(pages)) == base
    finally:
        if old is not None:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
    assert len(base) > 1000
