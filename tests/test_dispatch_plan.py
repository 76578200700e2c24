"""The two-branch skew plan (extract_stage_dispatch) must be a pure
physical-plan choice: identical output row set to the single-stage plan,
for any giant_threshold (here forced low so the micro corpus actually
exercises both branches)."""

from __future__ import annotations

from pdf_extractor_spark.operators.extract import (
    extract_stage,
    extract_stage_dispatch,
)

from tests.conftest import GOLDEN_DIR


def test_dispatch_equals_single_stage(spark):
    pages = spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))
    base = {
        (r.url, r.doc_type, r.extracted_text)
        for r in extract_stage(pages).collect()
    }
    dispatched = {
        (r.url, r.doc_type, r.extracted_text)
        for r in extract_stage_dispatch(pages, giant_threshold=4096).collect()
    }
    assert len(base) == pages.count()
    assert dispatched == base


def test_dispatch_preserves_null_html_rows(spark):
    """A NULL html payload must land in the small branch, not vanish: a
    bare length() predicate is NULL on both branches and silently drops
    the row, breaking the rows_in = rows_out lineage invariant."""
    import datetime as dt

    pages = spark.createDataFrame(
        [
            ("http://null.example/", dt.datetime(2025, 6, 1), None),
            ("http://tiny.example/", dt.datetime(2025, 6, 1), b"<p>hi</p>"),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    rows = {
        r.url: r
        for r in extract_stage_dispatch(pages, giant_threshold=4096).collect()
    }
    assert set(rows) == {"http://null.example/", "http://tiny.example/"}
    assert rows["http://null.example/"].doc_type == "empty"


def test_dispatch_branches_both_nonempty(spark):
    pages = spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))
    n_small = pages.filter("length(html) < 4096").count()
    n_giant = pages.filter("length(html) >= 4096").count()
    assert n_small > 0 and n_giant > 0, "threshold must split the corpus"


def test_slim_schema_matches_full_modulo_blocks(spark):
    pages = spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))
    full = {
        (r.url, r.doc_type, r.extracted_text, r.n_blocks, r.n_chars, r.error)
        for r in extract_stage(pages).collect()
    }
    slim_df = extract_stage(pages, with_blocks=False)
    assert "blocks" not in [f.name for f in slim_df.schema]
    slim = {
        (r.url, r.doc_type, r.extracted_text, r.n_blocks, r.n_chars, r.error)
        for r in slim_df.collect()
    }
    assert slim == full
