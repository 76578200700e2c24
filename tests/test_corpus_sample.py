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


# --- DLT priority sampling (corpus_sample_priority) -------------------------


def test_priority_sample_crafted_matches_python(spark):
    """Hand-computable micro case: with u_i = md5-derived uniform + 1
    and p_i = (w_i * 2^32) DIV u_i, the top-K by (p DESC, u, doc_id)
    and the threshold estimator est = max(w, p_{K+1}) match a pure-
    Python recompute exactly (including the zero-weight exclusion)."""
    import hashlib

    from pdf_extractor_spark.queries.corpus_select import (
        sample_priority_of,
    )

    def u_of(doc_id: int) -> int:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        return int(h, 16) + 1

    ws = {1: 10, 2: 1000, 3: 10, 4: 500, 5: 0}
    ps = {d: (w * 4294967296) // u_of(d) for d, w in ws.items()}
    order = sorted(ws, key=lambda d: (-ps[d], u_of(d), d))
    k = 3
    thr = ps[order[k]]
    expected = {
        d: (ws[d], ps[d], i + 1, max(ws[d], thr))
        for i, d in enumerate(order[:k])
    }
    assert ps[5] == 0  # zero-weight doc can never outrank weighted docs

    docs = spark.createDataFrame(
        [(d, " ".join(["tok"] * w)) for d, w in ws.items()],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["priority"],
            r["sample_rank"],
            r["est_tokens"],
        )
        for r in sample_priority_of(docs, k=k).collect()
    }
    assert got == expected


def test_priority_sample_props(spark):
    """Properties on the real corpus: exactly K rows, ranks 1..K,
    weight bias (sampled mean exceeds corpus mean), DLT estimator sum
    within single-draw variance of the corpus token total (measured
    1.15 at sf0.01; rel std ~1/sqrt(K-1) = 10%), and a corpus smaller
    than K is taken whole with est == w exactly."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.corpus_select import (
        PRIORITY_K,
        TOKS_S,
        corpus_sample_priority,
        sample_priority_of,
    )

    s = corpus_sample_priority(spark, SF)
    rows = s.collect()
    assert len(rows) == PRIORITY_K
    assert sorted(r["sample_rank"] for r in rows) == list(
        range(1, PRIORITY_K + 1)
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tot, mean = (
        docs.select(F.expr(f"CAST(size({TOKS_S}) AS BIGINT)").alias("n"))
        .agg(F.sum("n"), F.avg("n"))
        .first()
    )
    samp_mean = sum(r["n_tokens"] for r in rows) / len(rows)
    assert samp_mean > mean  # heavier docs overrepresented
    est_sum = sum(r["est_tokens"] for r in rows)
    assert 0.7 * tot < est_sum < 1.4 * tot

    # corpus <= K: taken whole, est degrades to the exact weights
    small = docs.limit(20)
    out = sample_priority_of(small, k=PRIORITY_K).collect()
    assert len(out) == 20
    assert all(r["est_tokens"] == r["n_tokens"] for r in out)


def test_priority_sample_plan_topk_not_sort(spark):
    """The global top-(K+1) compiles to TakeOrderedAndProject (per-task
    K-heaps), never a full corpus Sort."""
    from pdf_extractor_spark.queries.corpus_select import (
        corpus_sample_priority,
    )

    plan = (
        corpus_sample_priority(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
