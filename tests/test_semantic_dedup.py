"""SemDeDup (dedup_semantic / text_semantic_dedup) semantics:
keep-lowest-id per within-cell duplicate group, drop-justification
(precision) AND within-cell completeness, exact-duplicate collapse,
and the no-cartesian plan shape. Oracle parity is covered by
tests/test_queries_oracle.py like every catalog entry."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.queries.similarity import (
    CLUSTERED_PATH,
    SEMANTIC_TAU,
    _prep,
    dedup_semantic,
    semantic_dedup_of,
)

SF_DIR = "/root/testdata/sf0.001"


def test_exact_duplicates_keep_exactly_one(spark):
    # identical vectors always land in the same cell (identical distance
    # arrays -> identical argmin) and have cosine 1 -> only the lowest
    # id survives, regardless of tau
    base = [float(d % 7 - 3) for d in range(8)]
    other = [float((d * 3) % 11 - 5) for d in range(8)]
    rows = [(i, base) for i in range(5)] + [(10 + i, other) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = semantic_dedup_of(_prep(df), tau=0.999).toPandas()
    kept = sorted(out[out.keep == 1].vec_id)
    assert kept == [0, 10]
    assert (out[out.vec_id.isin([1, 2, 3, 4, 11, 12])].keep == 0).all()


def test_drop_justification_and_completeness(spark):
    """Every keep/drop decision re-derived in numpy from the engine's
    own (bucket, vector) assignment: dropped iff a same-cell smaller-id
    vector has cosine >= tau."""
    out = dedup_semantic(spark, SF_DIR)
    emb = _prep(spark.read.parquet(str(CLUSTERED_PATH))).select("vec_id", "v")
    got = out.join(emb, on="vec_id").toPandas()
    V = np.array([np.array(v, dtype=float) for v in got.v])
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = got.vec_id.to_numpy()
    buckets = got.bucket.to_numpy()
    keeps = got.keep.to_numpy()
    order = np.argsort(ids)
    ids, buckets, keeps, U = ids[order], buckets[order], keeps[order], U[order]
    S = np.round(U @ U.T, 9)
    n = len(ids)
    expected = np.ones(n, dtype=int)
    for j in range(n):
        prior = (
            (buckets[:j] == buckets[j]) & (S[:j, j] >= SEMANTIC_TAU)
        )
        if prior.any():
            expected[j] = 0
    mism = np.where(keeps != expected)[0]
    # a mismatch is tolerable ONLY if decided by a pair whose numpy
    # cosine sits within a couple of ulps of tau (numpy's sum order is
    # not the engines' fold order; the DuckDB oracle gate is the strict
    # cross-engine check)
    for j in mism:
        near = (buckets[:j] == buckets[j]) & (
            np.abs(S[:j, j] - SEMANTIC_TAU) < 2e-9
        )
        assert near.any(), f"unjustified keep flip for vec {ids[j]}"
    # non-trivial both ways on the clustered fixture
    assert expected.sum() > 0 and (expected == 0).sum() > 0


def test_within_cell_coverage_is_total_on_fixture(spark):
    """The algorithm's one approximation is ignoring cross-cell pairs;
    on the clustered fixture the learned cells capture EVERY global
    cos >= tau pair (coverage 1.000, measured and pinned) — the
    SemDeDup paper's semantic-dups-co-cluster claim, demonstrated."""
    out = dedup_semantic(spark, SF_DIR).toPandas()
    bk = dict(zip(out.vec_id, out.bucket))
    emb = _prep(spark.read.parquet(str(CLUSTERED_PATH))).select(
        "vec_id", "v"
    ).toPandas()
    V = np.array([np.array(v, dtype=float) for v in emb.v])
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(U @ U.T, 9)
    ids = emb.vec_id.to_numpy()
    iu = np.triu_indices(len(ids), 1)
    hit = S[iu] >= SEMANTIC_TAU
    ga, gb = ids[iu[0][hit]], ids[iu[1][hit]]
    assert hit.sum() > 1000  # the fixture has real signal
    assert all(bk[a] == bk[b] for a, b in zip(ga, gb))


def test_no_cartesian_plan(spark):
    plan = dedup_semantic(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_semantic_nontrivial(spark):
    from pdf_extractor_spark.queries.textstats import text_semantic_dedup

    out = text_semantic_dedup(spark, SF_DIR).toPandas()
    assert set(out.columns) == {"doc_id", "bucket", "keep"}
    assert (out.keep == 0).sum() > 0 and (out.keep == 1).sum() > 0
    # every doc appears exactly once
    assert out.doc_id.is_unique
