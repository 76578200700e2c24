"""Scale-evidence plan test: Spark's RUNTIME BLOOM FILTER join pushdown
(SPARK-32268) — when a shuffle join's small side is selectively
filtered, Catalyst injects a bloom_filter_agg over the small side's
join keys and a bloom_filter_might_contain predicate into the LARGE
side's scan pipeline, so fact rows that cannot match are dropped
BEFORE the shuffle. At 100 TB this is the difference between
shuffling the full fact table and shuffling ~the matching fraction —
the engine gets it for free as long as queries stay declarative
(filters on the dim side visible to Catalyst), which is exactly the
catalog's discipline.

Also pins the negative: with the feature disabled, the same plan has
no bloom predicate — so the positive assertion is testing the
injection, not a string coincidence.
"""

from __future__ import annotations

import pytest

_CONFS = {
    # force a shuffle join (broadcast would bypass the bloom path)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local fixtures are far below the 10 GB production default
    "spark.sql.optimizer.runtime.bloomFilter"
    ".applicationSideScanSizeThreshold": "0",
}


@pytest.fixture()
def bloom_confs(spark):
    # unset() restores defaults — conf.get(key, None) is None for
    # never-SET keys, so "restore if not None" would leak overrides
    # into the session-scoped SparkSession (the AQE-test gotcha)
    prev = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark, tmp_path):
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(0, 200_000).selectExpr(
        "id AS k", "sha2(CAST(id AS STRING), 256) AS pad"
    ).write.mode("overwrite").parquet(fact_p)
    spark.range(0, 20_000).selectExpr(
        "id AS k", "id % 100 AS grp"
    ).write.mode("overwrite").parquet(dim_p)
    fact = spark.read.parquet(fact_p)
    dim = spark.read.parquet(dim_p).filter("grp = 7")  # selective
    return fact.join(dim, "k")


def test_runtime_bloom_filter_injected(spark, tmp_path, bloom_confs):
    j = _join(spark, tmp_path)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan
    # the filter guards the FACT scan side: correctness unchanged
    assert j.count() == 200  # 20000/100 matching dim rows


def test_no_bloom_when_disabled(spark, tmp_path, bloom_confs):
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    j = _join(spark, tmp_path)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" not in plan
    assert j.count() == 200
