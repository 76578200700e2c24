"""Semantics for the hypertable-style multi-grain rollup
(queries/temporal.py::events_rollup): the day grain is the exact
aggregate of its hour rows, and distinct-user counts are consistent
across grains. Oracle parity at sf0.001 is covered by
tests/test_queries_oracle.py.
"""

from __future__ import annotations

from pdf_extractor_spark.queries.temporal import events_rollup

SF = "/root/testdata/sf0.001"


def test_day_grain_sums_its_hours(spark):
    rows = [r.asDict() for r in events_rollup(spark, SF).collect()]
    hours: dict = {}
    days: dict = {}
    for r in rows:
        if r["grain"] == "hour":
            assert r["bucket_hour"] >= 0
            k = (r["bucket_day"], r["event_type"])
            acc = hours.setdefault(k, [0, 0])
            acc[0] += r["n_events"]
            acc[1] += r["sum_value_cents"]
        else:
            assert r["bucket_hour"] == -1
            days[(r["bucket_day"], r["event_type"])] = r
    assert set(hours) == set(days)
    for k, (n, cents) in hours.items():
        assert days[k]["n_events"] == n, k
        assert days[k]["sum_value_cents"] == cents, k
        # a user active in any hour is active in the day; dedup across
        # hours can only shrink the count
        assert days[k]["n_users"] <= n


def test_hour_buckets_lie_inside_their_day(spark):
    for r in events_rollup(spark, SF).collect():
        if r["grain"] == "hour":
            assert r["bucket_hour"] // 24 == r["bucket_day"]
