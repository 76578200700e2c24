"""Watermarked tumbling-window streaming aggregate — the built-in
stateful operator family (windowed groupBy + event-time watermark, the
brief's "watermarks + windowed aggs for late data") alongside the
custom applyInPandasWithState sessionizer (sessions.py).

Semantics: events are bucketed into fixed WINDOW_S-second event-time
windows per event_type; a window emits (append mode) once the
watermark passes its end, and an event arriving later than the
watermark allows is DROPPED — tests/test_stream_windows.py pins the
late-drop behavior with a two-batch stream.

Exactness: outputs are integer microseconds + integer cents (the
repo-wide cross-engine convention), so the AvailableNow run is
hash-gated against a plain GROUP BY oracle in the catalog
(`stream_window_counts`).

Physical shape at scale: the state store holds one row per open
(window, event_type) — bounded by watermark horizon / window size ×
type cardinality, independent of event volume; the shuffle is the same
hash exchange the batch agg would do per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_S = 600  # 10-minute tumbling windows (matches events_rollup grain)
SLIDE_S = 300  # hopping-window slide: each event lands in WIN/SLIDE=2
# overlapping windows — the state store holds WIN/SLIDE rows per
# (window, type) where tumbling holds one; that multiplier is the
# entire cost of sliding semantics, bounded and volume-independent


def windowed_counts(
    events: DataFrame,
    window_s: int = WINDOW_S,
    watermark: str = "10 seconds",
    slide_s: int | None = None,
) -> DataFrame:
    """events(ts TIMESTAMP, event_type STRING, value DOUBLE, …) →
    (window_start, window_end, event_type, n_events, value_cents).
    ``events`` must be a STREAMING DataFrame (append-mode sink).
    ``slide_s`` < window_s turns the tumbling windows into HOPPING
    (sliding) windows: every event is counted in window_s/slide_s
    overlapping windows."""
    win = (
        F.window("ts", f"{window_s} seconds")
        if slide_s is None
        else F.window(
            "ts", f"{window_s} seconds", f"{slide_s} seconds"
        )
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
