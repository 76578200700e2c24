"""Count-Min hot-shingle gate invariants (cross-engine value parity is
covered by the catalog oracle suite):

- one-sided error, ever: est_df >= exact corpus df for EVERY probed
  shingle (collisions only add mass) — the CMS theorem the gate rests on;
- therefore no false negatives: every truly-frequent shingle
  (exact df * 1000 >= CMS_HOT_PM * n_docs) is flagged is_hot=1;
- false hots exist under an UNDERSIZED sketch (m=64 on a ~900-shingle
  vocabulary) while the superset guarantee still holds — proving the
  estimate approximates and the guarantee is one-sided, not vacuous;
- at the catalog sizing (m=2048) the false-hot count is small (pinned);
- partition-count independence: the counter table is a pure groupBy
  count, so the gate's output is identical under any input partitioning;
- the probe joins the counter table via broadcast (the d×m sketch never
  forces a shuffle of the probe mass).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.queries.dedup import (
    CMS_HOT_PM,
    _bloom_split,
    SHINGLES_S,
    TOKS_S,
    dedup_cms_hot,
    dedup_cms_hot_of,
)

SF = "/root/testdata/sf0.001"


def _exact_df(spark):
    """Exact corpus-slice shingle document frequencies + corpus size."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus, _ = _bloom_split(docs)
    sh = (
        corpus.withColumn("toks", F.expr(TOKS_S))
        .select("doc_id", F.explode(F.expr(SHINGLES_S)).alias("shingle"))
    )
    exact = {
        r["shingle"]: r["df"]
        for r in sh.groupBy("shingle").agg(F.count("*").alias("df")).collect()
    }
    n_docs = corpus.select("doc_id").distinct().count()
    return exact, n_docs


def test_one_sided_error_and_no_false_negatives(spark):
    exact, n_docs = _exact_df(spark)
    out = dedup_cms_hot(spark, SF).collect()
    assert len(out) > 0
    n_false_hot = 0
    hot_seen = cold_seen = 0
    for r in out:
        true_df = exact.get(r["shingle"], 0)
        # CMS one-sided error: the estimate never undercounts
        assert r["est_df"] >= true_df, (r["shingle"], r["est_df"], true_df)
        truly_hot = true_df * 1000 >= CMS_HOT_PM * n_docs
        if truly_hot:
            # no false negatives: every truly-frequent shingle is flagged
            assert r["is_hot"] == 1, (r["shingle"], true_df, r["est_df"])
            hot_seen += 1
        else:
            cold_seen += 1
            if r["is_hot"] == 1:
                n_false_hot += 1
    # the gate has signal on this corpus: both classes non-empty
    assert hot_seen > 0 and cold_seen > 0, (hot_seen, cold_seen)
    # at the catalog sizing the overflow mass is small: pinned bound
    assert n_false_hot <= len(out) * 5 // 100, (n_false_hot, len(out))


def test_undersized_sketch_overestimates_but_never_misses(spark):
    exact, n_docs = _exact_df(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup_cms_hot_of(docs, m=64).collect()
    n_false_hot = 0
    for r in out:
        true_df = exact.get(r["shingle"], 0)
        assert r["est_df"] >= true_df  # superset guarantee survives
        if true_df * 1000 >= CMS_HOT_PM * n_docs:
            assert r["is_hot"] == 1
        elif r["is_hot"] == 1:
            n_false_hot += 1
    # ~900 keys over 64 counters/row MUST collide into extra hots —
    # exhibits that the estimate is approximate, not secretly exact
    assert n_false_hot > 0


def test_partition_count_independence(spark):
    base = sorted(
        tuple(r) for r in dedup_cms_hot(spark, SF).collect()
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(13)
    re13 = sorted(tuple(r) for r in dedup_cms_hot_of(docs).collect())
    assert base == re13


def test_counter_join_broadcasts(spark):
    plan = dedup_cms_hot(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
