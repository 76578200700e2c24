"""Watermark semantics for the tumbling-window streaming aggregate: an
event arriving AFTER its window was evicted+emitted is dropped — the
already-emitted window does not change and is not re-emitted. (The
catalog entry stream_window_counts covers batch-equivalence via the
hash gate; this pins the late-data behavior a single-batch run cannot
show.)

Subtlety pinned here on purpose: a late event landing in the SAME
micro-batch in which its window is evicted still merges (Spark merges
batch input into state before evicting at end-of-batch) — the drop
requires the eviction to have happened in an EARLIER batch, hence the
three-file structure (advance watermark / evict / late arrival)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pdf_extractor_spark.streaming.windows import windowed_counts


def test_late_event_after_eviction_is_dropped(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(landing)

    tz_key = "spark.sql.session.timeZone"
    prev_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "UTC")
    try:
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "ts string, event_type string, value double"
        ).select(
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
        files = [
            # batch 1: event in window [00:00, 00:10) + a 02:00 event
            # that advances the watermark far past that window's end
            ("a", [("2024-01-01 00:00:30", "view", 1.0),
                   ("2024-01-01 02:00:00", "view", 1.0)]),
            # batch 2: the 00:00 window is evicted + emitted here
            ("b", [("2024-01-01 02:00:30", "view", 1.0)]),
            # batch 3: a LATE event for the closed 00:00 window (must
            # be dropped), an on-time event, and a far-future sentinel
            # so every real window flushes before the stream ends
            ("c", [("2024-01-01 00:05:00", "view", 100.0),
                   ("2024-01-01 02:01:00", "view", 2.0),
                   ("2025-01-01 00:00:00", "__sentinel__", 0.0)]),
        ]
        now = time.time()
        for i, (name, rows) in enumerate(files):
            d = f"{landing}/{name}.parquet"
            mk(rows).coalesce(1).write.parquet(d)
            # file-stream batch order follows modification time
            mt = now - 300 + i * 60
            for f_ in os.listdir(d):
                os.utime(os.path.join(d, f_), (mt, mt))
            os.utime(d, (mt, mt))

        stream = (
            spark.readStream.schema(
                "ts timestamp, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{landing}/*.parquet")
        )
        q = (
            windowed_counts(stream, watermark="10 seconds")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(tz_key, prev_tz)

    out = [
        r for r in spark.read.parquet(out_dir).collect()
        if r["event_type"] != "__sentinel__"
    ]
    rows = {(r["window_start"].isoformat(), r["event_type"]): r for r in out}
    # each window emitted exactly once (append mode, no late re-emit)
    assert len(out) == len(rows) == 2
    w0 = rows[("2024-01-01T00:00:00", "view")]
    # the late 100.0-value event did NOT make it into the closed window
    assert w0["n_events"] == 1 and w0["value_cents"] == 100
    w2 = rows[("2024-01-01T02:00:00", "view")]
    assert w2["n_events"] == 3 and w2["value_cents"] == 400
