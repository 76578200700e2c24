"""Semantics for the binned range (interval) join
(queries/temporal.py::events_range_join_of): containment bounds are
[start, end) exactly, bin-boundary crossings are found, and events with
no containing window report zeros. Oracle parity (vs DuckDB's native
IEJoin) at sf0.001 is covered by tests/test_queries_oracle.py.
"""

from __future__ import annotations

import datetime as dt

from pdf_extractor_spark.queries.temporal import (
    RJ_WIN_US,
    events_range_join_of,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (eid, T0 + dt.timedelta(microseconds=us), uid, et)
            for eid, us, uid, et in rows
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING",
    )


def _run(spark, rows):
    return {
        r["event_id"]: r.asDict()
        for r in events_range_join_of(_mk(spark, rows)).collect()
    }


def test_containment_is_half_open(spark):
    rows = [
        (1, 0, 7, "error"),  # window [0, WIN)
        (2, RJ_WIN_US - 1, 7, "view"),  # inside (last us)
        (3, RJ_WIN_US, 7, "view"),  # exactly at end -> outside
        (4, 0, 9, "view"),  # other user -> outside
    ]
    out = _run(spark, rows)
    assert out[1]["in_incident"] == 1  # the error event contains itself
    assert out[2]["in_incident"] == 1 and out[2]["first_window"] == 1
    assert out[3]["in_incident"] == 0 and out[3]["n_windows"] == 0
    assert out[4]["in_incident"] == 0 and out[4]["first_window"] == -1


def test_window_crossing_a_bin_boundary_is_found(spark):
    # interval starts mid-bin, so it spans two bins; an event in the
    # SECOND bin must still match (the 2-bins-per-interval explode)
    half = RJ_WIN_US // 2
    rows = [
        (1, half, 7, "error"),  # window [half, half+WIN)
        (2, RJ_WIN_US + 1, 7, "view"),  # bin 1, inside the window
    ]
    out = _run(spark, rows)
    assert out[2]["in_incident"] == 1 and out[2]["first_window"] == 1


def test_overlapping_windows_count_and_min_id(spark):
    rows = [
        (5, 0, 7, "error"),
        (6, 1000, 7, "error"),
        (7, 2000, 7, "view"),  # inside both windows
    ]
    out = _run(spark, rows)
    assert out[7]["n_windows"] == 2 and out[7]["first_window"] == 5


def test_binned_join_equals_brute_force_on_random_data(spark):
    """Differential check: the binned plan must equal a brute-force
    Python evaluation of the SAME semantics on seeded random data —
    proving the bin explode/containment algebra directly, independent
    of the DuckDB oracle."""
    import random

    rng = random.Random(991)
    rows = []
    for eid in range(300):
        us = rng.randrange(0, 3 * RJ_WIN_US)
        uid = rng.randrange(0, 5)
        et = "error" if rng.random() < 0.2 else "view"
        rows.append((eid, us, uid, et))

    windows = [
        (eid, uid, us, us + RJ_WIN_US)
        for eid, us, uid, et in rows
        if et == "error"
    ]
    expected = {}
    for eid, us, uid, _ in rows:
        hits = [
            wid
            for wid, wuid, s, e in windows
            if wuid == uid and s <= us < e
        ]
        expected[eid] = (
            1 if hits else 0,
            len(hits),
            min(hits) if hits else -1,
        )

    got = _run(spark, rows)
    assert set(got) == set(expected)
    for eid, (inc, n, first) in expected.items():
        r = got[eid]
        assert (r["in_incident"], r["n_windows"], r["first_window"]) == (
            inc, n, first,
        ), eid
