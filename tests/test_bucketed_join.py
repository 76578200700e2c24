"""Bucketed co-located join — the shuffle-elimination technique for
REPEATED big-big joins at 100 TB: both sides written bucketBy(N, key)
agree on partitioning at write time, so the join compiles with NO
Exchange on either side (each task zips bucket i with bucket i).
Broadcast covers small-dim joins; bucketing covers the fact-fact case
where neither side fits memory and the join recurs daily.

Asserted at the plan level against the SAME data joined as plain
parquet (two Exchanges), with broadcast disabled so the shuffle
behavior is what's measured.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    profile = ev.groupBy("user_id").count()

    for name in ("bj_events", "bj_profile"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        (
            ev.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .format("parquet")
            .saveAsTable("bj_events")
        )
        (
            profile.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .format("parquet")
            .saveAsTable("bj_profile")
        )
        b = spark.table("bj_events").join(
            spark.table("bj_profile"), on="user_id"
        )
        bucketed_plan = _plan(b)
        # co-located: no shuffle on either side of the join
        assert "Exchange hashpartitioning" not in bucketed_plan, (
            bucketed_plan
        )
        assert "SortMergeJoin" in bucketed_plan

        # the identical join over plain parquet pays two hash exchanges
        p = ev.join(profile, on="user_id")
        plain_plan = _plan(p)
        assert plain_plan.count("Exchange hashpartitioning") >= 2

        # same results either way
        assert sorted(map(tuple, b.collect())) == sorted(
            map(tuple, p.select(*b.columns).collect())
        )
    finally:
        for name in ("bj_events", "bj_profile"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
