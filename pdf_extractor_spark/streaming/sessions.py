"""Custom stateful streaming operator: user-session aggregation via
``applyInPandasWithState``.

The extraction pipeline itself is stateless (SURVEY.md §2.1), but an
engine serving a crawl/training-data platform needs at least one custom
stateful streaming operator (the `applyInPandasWithState` pattern): here,
sessionization of the `events` stream — group by user, close a session
after ``gap_seconds`` of inactivity, emit one row per closed session with
count/duration/value metrics.

State model per user: (session_start_us, last_seen_us, n_events,
value_cents). Event-time watermark bounds state: the state timeout is
processing-time-free — sessions close either by a later event arriving
past the gap, or by GroupStateTimeout.EventTimeTimeout once the watermark
passes last_seen + gap. Late events beyond the watermark are dropped by
the watermark itself (standard Structured Streaming semantics).

At scale: state is sharded by the grouping key across executors, each
key's state is O(1) bytes, and the per-batch work is Arrow-batched pandas
— the same zero-per-row-Python discipline as the extract stage.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

DEFAULT_GAP_S = 30 * 60


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, cents = state.get
                closed.append((user_id, start_us, last_us, n, cents))
                state.remove()
        else:
            if state.exists:
                start_us, last_us, n, cents = state.get
            else:
                start_us = last_us = -1
                n = cents = 0
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values("ts")
            for ts, cents_i in zip(
                rows["ts"].astype("int64") // 1000,  # ns → us
                rows["value_cents"],
            ):
                ts = int(ts)
                if start_us == -1:
                    start_us, last_us, n, cents = ts, ts, 1, int(cents_i)
                elif ts - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n, cents))
                    start_us, last_us, n, cents = ts, ts, 1, int(cents_i)
                else:
                    last_us = max(last_us, ts)
                    n += 1
                    cents += int(cents_i)
            state.update((start_us, last_us, n, cents))
            # close the open session once the watermark passes last+gap
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "start_us", "last_us", "n_events",
                    "value_cents",
                ],
            )
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"],
                    "session_start": pd.to_datetime(out["start_us"], unit="us"),
                    "session_end": pd.to_datetime(out["last_us"], unit="us"),
                    "n_events": out["n_events"],
                    "value_cents": out["value_cents"],
                    "duration_s": (out["last_us"] - out["start_us"]) / 1e6,
                }
            )

    return fn


def sessionize(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_S,
    watermark: str = "1 hour",
) -> DataFrame:
    """events(ts TIMESTAMP, user_id LONG, value DOUBLE, …) →
    closed-session rows. ``events`` must be a STREAMING DataFrame."""
    from pyspark.sql import functions as F

    prepped = (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            F.col("user_id").cast("long").alias("user_id"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("value_cents"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
