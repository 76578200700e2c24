"""Semantic tests for benchmark decontamination (queries/contamination):
a training doc sharing a word 4-gram with any benchmark doc is flagged,
independent docs are not, and benchmark docs never appear in the output.
Oracle parity at sf0.001 is covered by tests/test_queries_oracle.py.
"""

from __future__ import annotations

from pdf_extractor_spark.queries.contamination import (
    BENCH_MOD,
    decontaminate_of,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_overlapping_doc_flagged_and_counted(spark):
    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, bench_text),  # 0 % BENCH_MOD == 0 -> benchmark
        # shares the 4-gram "beta gamma delta epsilon" with doc 0
        (5, "xx beta gamma delta epsilon yy"),
        (7, "one two three four five six seven"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate_of(_mk_docs(spark, rows)).collect()
    }
    assert set(out) == {5, 7}, "benchmark doc must not appear in output"
    assert out[5]["contaminated"] == 1 and out[5]["n_overlap"] == 1
    assert out[7]["contaminated"] == 0 and out[7]["n_overlap"] == 0


def test_exact_copy_of_benchmark_overlaps_fully(spark):
    bench_text = "w1 w2 w3 w4 w5 w6 w7 w8"  # 5 distinct 4-grams
    rows = [(0, bench_text), (3, bench_text)]
    out = decontaminate_of(_mk_docs(spark, rows)).collect()[0]
    assert out["doc_id"] == 3
    assert out["n_overlap"] == 5 and out["contaminated"] == 1


def test_short_doc_fallback_is_whole_text(spark):
    # docs under 4 tokens fall back to whole-text membership: an exact
    # short copy of a benchmark doc still flags, a different one doesn't
    rows = [(0, "tiny doc"), (2, "tiny doc"), (4, "other doc")]
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_of(_mk_docs(spark, rows)).collect()
    }
    assert out == {2: 1, 4: 0}


def test_every_training_doc_present_once(spark):
    rows = [(i, f"word{i} filler text here now") for i in range(90)]
    df = decontaminate_of(_mk_docs(spark, rows))
    n_train = sum(1 for i in range(90) if i % BENCH_MOD != 0)
    ids = [r["doc_id"] for r in df.collect()]
    assert len(ids) == len(set(ids)) == n_train
