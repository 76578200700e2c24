"""Stratified hash-threshold sampling: exact budget bound, determinism,
and fill behavior (value parity vs DuckDB is covered by the catalog
oracle suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.queries.corpus_select import (
    SAMPLE_BUDGET,
    corpus_sample_stratified,
)

SF = "/root/testdata/sf0.01"


def test_budget_bound_and_determinism(spark):
    sample = corpus_sample_stratified(spark, SF)
    per = (
        sample.groupBy("lang_pred", "quality_band")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert per, "sampling produced at least one stratum"
    # HARD budget bound: no stratum ever exceeds SAMPLE_BUDGET
    assert all(r["n"] <= SAMPLE_BUDGET for r in per), per

    # deterministic: an identical second run yields the identical sample
    a = sorted(tuple(r) for r in sample.collect())
    b = sorted(tuple(r) for r in corpus_sample_stratified(spark, SF).collect())
    assert a == b

    # sampled ids are real documents, each at most once
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    assert sample.join(docs, "doc_id", "left_anti").count() == 0
    assert sample.select("doc_id").distinct().count() == len(a)


def test_small_strata_taken_whole_large_strata_filled(spark):
    """A stratum with <= budget docs is kept entirely (threshold >= 1 ⇒
    nothing pre-filtered, rank keeps all); large strata fill the budget
    — the SAMPLE_MARGIN=4 oversampling margin bounds the underfill
    probability at P(Poisson(100) < 25) ≈ 2e-19 per stratum (margin 2
    would be ~4e-5 — real across many corpora), and the fill is
    deterministically exact on this fixed corpus."""
    sample = corpus_sample_stratified(spark, SF)
    got = {
        (r["lang_pred"], r["quality_band"]): r["n"]
        for r in sample.groupBy("lang_pred", "quality_band")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    from pdf_extractor_spark.queries.corpus_select import (
        _BAND,
        _pred_case,
        _PUNCT_RE,
        _quality_exprs,
        _hits_spark,
        _LANG_ORDER,
        TOKS_S,
    )

    feat = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("toks", F.expr(TOKS_S))
        .withColumn("n_tokens", F.expr("CAST(size(toks) AS BIGINT)"))
        .withColumn(
            "n_punct",
            F.expr(
                "CAST(size(regexp_extract_all(text, "
                f"'{_PUNCT_RE}', 1)) AS BIGINT)"
            ),
        )
    )
    for lg in _LANG_ORDER:
        feat = feat.withColumn(f"hits_{lg}", F.expr(_hits_spark(lg)))
    truth = {
        (r["lang_pred"], r["quality_band"]): r["n"]
        for r in feat.withColumn("quality", F.expr(_quality_exprs()["quality"]))
        .withColumn("lang_pred", F.expr(_pred_case()))
        .withColumn("quality_band", F.expr(_BAND))
        .groupBy("lang_pred", "quality_band")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(truth)
    for k, n_total in truth.items():
        if n_total <= SAMPLE_BUDGET:
            assert got[k] == n_total, (k, got[k], n_total)
        else:
            assert got[k] == SAMPLE_BUDGET, (k, got[k], n_total)


def test_mix_weights_semantics(spark):
    """Temperature weighting invariants: probabilities sum to ~1, the
    allocation never exceeds the budget, and T=0.5 compresses the
    spread — a source with 4x the tokens gets only ~2x the probability
    (exact sqrt ratio)."""
    import math

    from pdf_extractor_spark.queries.corpus_select import (
        MIX_TOKEN_BUDGET,
        corpus_mix_weights,
    )

    rows = corpus_mix_weights(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert abs(sum(r["p_sample"] for r in rows) - 1.0) < 1e-4
    assert sum(r["alloc_tokens"] for r in rows) <= MIX_TOKEN_BUDGET
    tot_w = sum(math.sqrt(r["n_tokens"]) for r in rows)
    for r in rows:
        expect = math.sqrt(r["n_tokens"]) / tot_w
        assert abs(r["p_sample"] - expect) < 1e-4, (r, expect)
