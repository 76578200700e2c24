"""AQE runtime skew-join mitigation — the third leg of the skew story
(extraction handles payload skew by dispatch/salting at plan time; the
LSH/ngram operators cap hot keys structurally; THIS is the generic
runtime net for any remaining skewed shuffle join at 100 TB).

Asserts on the post-execution adaptive plan that a hot join key makes
Spark split the skewed partition (SortMergeJoin(skew=true) +
AQEShuffleRead skewed) instead of serializing the hot partition into
one straggler task.

Two gotchas this test pins, both found while writing it:
- a CONSTANT pad column is constant-folded and re-projected AFTER the
  join, so the shuffle carries 8-byte keys and nothing is skewed —
  the pad must be per-row (sha2 of the id);
- the skew split breaks the join's output partitioning, so a
  downstream groupBy on the join key suppresses it (Spark won't add
  the extra shuffle back unless forceOptimizeSkewedJoin) — the join
  must be terminal for the default optimization to fire.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "262144",
}


@pytest.fixture()
def skew_confs(spark):
    # conf.get(key, None) returns None for keys never explicitly SET
    # (it bypasses the SQL default), so "restore if not None" silently
    # leaves the overrides in place and poisons later tests in the
    # session-scoped SparkSession — unset() restores the default.
    prev = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    left = spark.range(200000).select(
        F.expr(
            "CASE WHEN id % 3 = 0 THEN 0 ELSE id % 101 END"
        ).alias("k"),
        # per-row pad: a constant would be folded past the Exchange
        F.expr("sha2(CAST(id AS STRING), 256)").alias("pad"),
    )
    right = spark.range(101).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    joined = left.join(right, on="k")
    rows = joined.collect()  # executes THIS DataFrame's query execution
    assert len(rows) == 200000

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan.splitlines()[0]
    assert "AQEShuffleRead skewed" in plan
