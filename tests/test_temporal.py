"""Semantic invariants of the temporal/sketch operators (value parity
vs DuckDB is covered by the catalog oracle suite — including the as-of
sweep vs DuckDB's NATIVE ASOF JOIN, an independent implementation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.queries.temporal import (
    KMV_K,
    WINDOW_US,
    events_asof_join,
    events_sliding_window,
    sketch_distinct_kmv,
)

SF = "/root/testdata/sf0.01"


def test_asof_semantics(spark):
    out = events_asof_join(spark, SF)
    rows = out.collect()
    assert rows
    # as-of never looks forward, and a matched row has both columns
    for r in rows:
        if r["last_purchase_ts_us"] is not None:
            assert r["gap_us"] >= 0
            assert r["last_purchase_cents"] is not None
        else:
            assert r["gap_us"] is None
    # every click appears exactly once
    n_clicks = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter("event_type = 'click'")
        .count()
    )
    assert len(rows) == n_clicks
    # brute-force spot check for 3 users, reconstructed directly from
    # the raw data with EXACT integer microsecond arithmetic (a float
    # total_seconds() round-trip can land 1 ulp low and truncate)
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    us = dt.timedelta(microseconds=1)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sample = [r["user_id"] for r in out.limit(3).collect()]
    for uid in sample:
        purchases = sorted(
            (r["ts"] - epoch) // us
            for r in ev.filter(
                (F.col("user_id") == uid)
                & (F.col("event_type") == "purchase")
            ).collect()
        )
        for r in [x for x in rows if x["user_id"] == uid][:5]:
            prior = [p for p in purchases if p <= r["ts_us"]]
            if prior:
                assert r["last_purchase_ts_us"] == prior[-1]
            else:
                assert r["last_purchase_ts_us"] is None


def test_sliding_window_bounds(spark):
    out = events_sliding_window(spark, SF)
    # the frame includes the current row, so n >= 1 everywhere
    assert out.filter("n_10min < 1").count() == 0
    # spot check one busy user against a brute-force count
    busy = out.orderBy(F.col("n_10min").desc()).first()
    ev = events_sliding_window(spark, SF).filter(
        F.col("user_id") == busy["user_id"]
    )
    raw = sorted(
        r["ts_us"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id") == busy["user_id"])
        .selectExpr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) AS ts_us"
        )
        .collect()
    )
    for r in ev.limit(20).collect():
        want = sum(1 for t in raw if r["ts_us"] - WINDOW_US <= t <= r["ts_us"])
        assert r["n_10min"] == want


def test_kmv_estimate_accuracy(spark):
    rows = sketch_distinct_kmv(spark, SF).collect()
    assert rows
    for r in rows:
        if r["n_exact"] < KMV_K:
            assert r["est_distinct"] == float(r["n_exact"])
        else:
            # KMV stderr ~ 1/sqrt(k-2) ~ 13% at k=64; allow 3 sigma
            rel = abs(r["est_distinct"] - r["n_exact"]) / r["n_exact"]
            assert rel < 0.4, (r, rel)


def test_kmv_partial_form_equals_relational_form(spark):
    """The Arrow-batch partial-aggregation KMV (the 100 TB shape) must
    produce BIT-IDENTICAL estimates to the oracle-checked relational
    form: the global k smallest hashes are always contained in the
    union of per-partition k-minima, so the merged kth value — and
    hence the estimator — is exactly the same."""
    from pdf_extractor_spark.queries.temporal import (
        sketch_distinct_kmv_partial,
    )

    for sf in ("/root/testdata/sf0.001", SF):
        rel = {
            r["event_type"]: r["est_distinct"]
            for r in sketch_distinct_kmv(spark, sf).collect()
        }
        par = {
            r["event_type"]: r["est_distinct"]
            for r in sketch_distinct_kmv_partial(spark, sf).collect()
        }
        assert rel == par

    # the partial stage really bounds its output: repartition the input
    # wide and check the merged pre-rank row count stays small
    ev = spark.read.parquet(f"{SF}/events.parquet").repartition(16)
    n_groups = ev.select("event_type").distinct().count()
    # <= partitions * groups * K, and far below the distinct pair count
    assert (
        sketch_distinct_kmv_partial(spark, SF).count() == n_groups
    )


def test_hll_estimate_accuracy_and_branches(spark):
    """HLL accuracy bound per SF plus coverage of BOTH estimator
    branches: small SFs sit in the linear-counting regime (empty
    registers exist), sf0.1 saturates all 64 registers and exercises
    the raw bias-corrected branch. Cross-engine bit-parity is covered
    by the catalog oracle suite."""
    from pdf_extractor_spark.queries.temporal import sketch_distinct_hll

    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = sketch_distinct_hll(spark, SF).collect()
    assert set(r["event_type"] for r in rows) == set(exact)
    for r in rows:
        assert r["v_empty"] > 0  # linear-counting regime at sf0.01
        rel = abs(r["est_distinct"] - exact[r["event_type"]]) / exact[
            r["event_type"]
        ]
        # m=64 -> ~13% stderr; the LC/raw crossover is the worst spot
        assert rel < 0.3, (r, exact[r["event_type"]], rel)

    big = sketch_distinct_hll(spark, "/root/testdata/sf0.1").collect()
    ex_big = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in big:
        assert r["v_empty"] == 0  # raw branch: all registers hit
        rel = abs(r["est_distinct"] - ex_big[r["event_type"]]) / ex_big[
            r["event_type"]
        ]
        assert rel < 0.15, (r, ex_big[r["event_type"]], rel)
