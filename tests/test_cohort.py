"""events_cohort_retention vs a plain-Python recount (independent of
both SQL engines), plus the plan contract: cohort sizes broadcast, no
cartesian. Oracle parity runs in test_queries_oracle."""

from __future__ import annotations

import collections

import duckdb

from pdf_extractor_spark.queries.temporal import (
    US_PER_DAY,
    events_cohort_retention,
)

SF = "/root/testdata/sf0.001"


def _python_matrix():
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) AS us FROM '{SF}/events.parquet'"
    ).fetchall()
    days = collections.defaultdict(set)
    for uid, us in rows:
        days[int(uid)].add(us // US_PER_DAY)
    first = {u: min(ds) for u, ds in days.items()}
    sizes = collections.Counter(first.values())
    cells = collections.Counter()
    for u, ds in days.items():
        for d in ds:
            cells[(first[u], d - first[u])] += 1
    return {
        (cd, off): (n, sizes[cd], n * 1000 // sizes[cd])
        for (cd, off), n in cells.items()
    }


def test_cohort_retention_matches_python(spark):
    want = _python_matrix()
    got = {
        (r["cohort_day"], r["day_offset"]): (
            r["n_active"],
            r["cohort_users"],
            r["retention_pm"],
        )
        for r in events_cohort_retention(spark, SF).collect()
    }
    assert got == want
    # day-0 retention is definitionally 1000 for every cohort
    for (cd, off), (_, _, pm) in want.items():
        if off == 0:
            assert pm == 1000
    # the matrix has real decay texture (some cell below full retention)
    assert any(pm < 1000 for (_, off), (_, _, pm) in want.items() if off > 0)


def test_cohort_plan_shape(spark):
    plan = (
        events_cohort_retention(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the O(days) sizes side
