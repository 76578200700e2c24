"""Watermarked stream-stream interval join — the third Structured
Streaming operator class in the catalog (alongside the built-in
windowed aggregate, windows.py, and the custom applyInPandasWithState
sessionizer, sessions.py): every click joins the SAME user's purchases
from the preceding JOIN_WINDOW_S seconds, both sides unbounded streams.

Why this shape matters at scale: a stream-stream join is the operator
whose STATE is the cost — Spark must buffer each side until the other
side's watermark proves no more matches can arrive. The time-range
condition (p_ts <= c_ts < p_ts + window) plus watermarks on BOTH sides
bounds that buffer to watermark-horizon seconds of data per side,
independent of stream lifetime; without the range condition the state
grows forever. The join itself is a hash exchange on user_id per
micro-batch — the same shuffle the batch form pays.

Exactness: inner-join matches emit as soon as both rows are present
(no watermark passage needed for output, only for state eviction), so
an AvailableNow run over landed files produces exactly the batch
inequality-join result — hash-gated in the catalog against DuckDB's
native IEJoin, an independent implementation (`stream_interval_join`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_WINDOW_S = 600  # clicks match purchases up to 10 minutes prior


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_s: int = JOIN_WINDOW_S,
    watermark: str = "10 seconds",
) -> DataFrame:
    """clicks(c_id, c_user, c_ts) ⋈ purchases(p_id, p_user, p_ts) on
    user + the trailing time range. Both inputs must be STREAMING
    DataFrames; output is append-mode inner-join matches with the
    repo's integer-microsecond columns."""
    c = clicks.withWatermark("c_ts", watermark)
    p = purchases.withWatermark("p_ts", watermark)
    return c.join(
        p,
        F.expr(
            "c_user = p_user AND p_ts <= c_ts AND "
            f"c_ts < p_ts + INTERVAL {window_s} SECONDS"
        ),
    ).select(
        F.col("c_id").alias("click_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("c_user").alias("user_id"),
        F.expr("unix_micros(c_ts)").alias("click_us"),
        F.expr("unix_micros(p_ts)").alias("purchase_us"),
        F.expr("unix_micros(c_ts) - unix_micros(p_ts)").alias("gap_us"),
    )
