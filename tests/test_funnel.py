"""events_funnel vs a plain-Python recount (independent of both SQL
engines): earliest-view anchor, earliest click within the step window
after it, earliest purchase within the window after that. Oracle
parity runs in test_queries_oracle."""

from __future__ import annotations

import collections

import duckdb

from pdf_extractor_spark.queries.temporal import (
    FUNNEL_STEPS,
    FUNNEL_WINDOW_US,
    events_funnel,
)

SF = "/root/testdata/sf0.001"


def _python_funnel():
    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts) AS us "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    by_user = collections.defaultdict(list)
    for uid, et, us in rows:
        by_user[int(uid)].append((et, us))
    n = [0, 0, 0]
    for evs in by_user.values():
        t1 = min(
            (us for et, us in evs if et == FUNNEL_STEPS[0]), default=None
        )
        if t1 is None:
            continue
        n[0] += 1
        t2 = min(
            (
                us
                for et, us in evs
                if et == FUNNEL_STEPS[1]
                and t1 < us <= t1 + FUNNEL_WINDOW_US
            ),
            default=None,
        )
        if t2 is None:
            continue
        n[1] += 1
        t3 = min(
            (
                us
                for et, us in evs
                if et == FUNNEL_STEPS[2]
                and t2 < us <= t2 + FUNNEL_WINDOW_US
            ),
            default=None,
        )
        if t3 is not None:
            n[2] += 1
    return n


def test_funnel_matches_python(spark):
    n = _python_funnel()
    got = {
        r["step"]: (r["n_users"], r["conversion_pm"])
        for r in events_funnel(spark, SF).collect()
    }
    assert got == {
        1: (n[0], 1000),
        2: (n[1], n[1] * 1000 // n[0]),
        3: (n[2], n[2] * 1000 // n[0]),
    }
    # the 24h step window creates genuine decay on this corpus
    assert n[0] > n[1] > n[2] > 0
