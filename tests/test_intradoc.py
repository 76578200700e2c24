"""dedup_intradoc: within-document repeated-segment removal. Keep-first
semantics pinned on synthetic docs (incl. empty/short edge cases) plus
the zero-shuffle plan contract; cross-engine parity runs in
test_queries_oracle like every catalog entry."""

from __future__ import annotations

from pdf_extractor_spark.queries.dedup import dedup_intradoc_of


def _run(spark, texts, seg_len=2):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    out = dedup_intradoc_of(docs, seg_len=seg_len).toPandas()
    return {
        r.doc_id: (r.n_segs, r.n_dup, r.text_clean)
        for r in out.itertuples()
    }


def test_keep_first_occurrence(spark):
    got = _run(spark, ["a b a b c d a b"])
    # segments: [a b][a b][c d][a b] -> keep first 'a b' and 'c d'
    assert got[0] == (4, 2, "a b c d")


def test_no_dups_is_identity(spark):
    got = _run(spark, ["w x y z p q"])
    assert got[0] == (3, 0, "w x y z p q")


def test_empty_and_ragged_tail(spark):
    got = _run(spark, ["", "only", "a b a"])
    assert got[0] == (0, 0, "")          # empty doc: no phantom segments
    assert got[1] == (1, 0, "only")      # ragged single-token tail
    # [a b][a]: the short tail 'a' differs from 'a b' -> both kept
    assert got[2] == (2, 0, "a b a")


def test_tail_dup_is_removed(spark):
    # [a b][c d][a b][a b] with an exact tail repeat
    got = _run(spark, ["a b c d a b a b"])
    assert got[0] == (4, 2, "a b c d")


def test_zero_shuffle_plan(spark):
    docs = spark.createDataFrame([(1, "a b a b")], "doc_id LONG, text STRING")
    plan = (
        dedup_intradoc_of(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
