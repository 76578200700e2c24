"""Semantic tests for incremental (batch-vs-corpus) dedup
(queries/dedup.py::dedup_incremental_of): an exact copy of a corpus doc
is caught by the hash layer, a near-copy by the LSH+Jaccard layer, an
independent doc by neither, and every batch doc appears exactly once.
Oracle parity at sf0.001 is covered by tests/test_queries_oracle.py.

doc_id % BATCH_MOD >= BATCH_MIN selects the batch slice; with
BATCH_MOD=10/BATCH_MIN=8, ids ending in 8 or 9 are "new" docs.
"""

from __future__ import annotations

from pdf_extractor_spark.queries.dedup import dedup_incremental_of

CORPUS_TEXT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
NEAR_TEXT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau CHANGED"
)
OTHER_TEXT = "one two three four five six seven eight nine ten"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_exact_near_and_novel_batch_docs(spark):
    rows = [
        (1, CORPUS_TEXT),  # corpus
        (2, OTHER_TEXT),  # corpus
        (18, CORPUS_TEXT),  # batch: exact copy of corpus doc 1
        (28, NEAR_TEXT),  # batch: near copy of corpus doc 1
        (38, "purple monkey dishwasher quantum banjo flies high today"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup_incremental_of(_mk(spark, rows)).collect()
    }
    assert set(out) == {18, 28, 38}
    assert out[18]["exact_dup"] == 1 and out[18]["exact_dup_of"] == 1
    assert out[18]["near_dup"] == 1 and out[18]["near_dup_of"] == 1
    assert out[28]["exact_dup"] == 0 and out[28]["exact_dup_of"] == -1
    assert out[28]["near_dup"] == 1 and out[28]["near_dup_of"] == 1
    assert out[38]["exact_dup"] == 0 and out[38]["near_dup"] == 0
    assert out[38]["n_candidates"] == 0 and out[38]["near_dup_of"] == -1


def test_batch_vs_batch_dups_are_not_reported(spark):
    # incremental semantics: the batch is deduped against the CORPUS
    # only — two identical NEW docs both pass (the batch's internal
    # dedup is the batch-pipeline's job, run on the batch alone)
    rows = [
        (1, OTHER_TEXT),
        (18, CORPUS_TEXT),
        (28, CORPUS_TEXT),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup_incremental_of(_mk(spark, rows)).collect()
    }
    assert out[18]["exact_dup"] == 0 and out[18]["near_dup"] == 0
    assert out[28]["exact_dup"] == 0 and out[28]["near_dup"] == 0


def test_min_corpus_doc_wins_as_duplicate_target(spark):
    rows = [
        (1, CORPUS_TEXT),
        (11, CORPUS_TEXT),  # same corpus text, higher id
        (48, CORPUS_TEXT),
    ]
    out = dedup_incremental_of(_mk(spark, rows)).collect()
    row = next(r for r in out if r["doc_id"] == 48)
    assert row["exact_dup_of"] == 1 and row["near_dup_of"] == 1
