"""Watermark-eviction semantics of the streaming dedup (the catalog
entry stream_dedup covers exactly-once batch-equivalence via the hash
gate; this pins the behavior a far-watermark run cannot show):

- a duplicate arriving while its original's key state is still within
  the watermark window is suppressed ACROSS micro-batches;
- a replay arriving AFTER the watermark passed its event time is late
  data and is DROPPED WHOLESALE — it does not re-emit as a phantom
  second copy (the failure mode unbounded dropDuplicates avoids by
  paying O(all keys) state; the watermarked form trades it for
  bounded state + late-drop).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pdf_extractor_spark.streaming.dedup import dedup_stream


def test_within_window_dedup_and_beyond_window_late_drop(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(landing)

    tz_key = "spark.sql.session.timeZone"
    prev_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "UTC")
    try:
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "ts string, k long"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "k")
        files = [
            # batch 1: keys 1 and 2
            ("a", [("2024-01-01 00:00:30", 1),
                   ("2024-01-01 00:00:40", 2)]),
            # batch 2: advances the watermark (10 s delay) 2 h past
            # batch 1 — keys 1 and 2 evict at end of this batch
            ("b", [("2024-01-01 02:00:00", 3)]),
            # batch 3: replay of key 1 at its ORIGINAL (now-late) ts —
            # must vanish, not re-emit; replay of key 3 within the
            # window — must dedupe cross-batch; fresh key 4 — must emit
            ("c", [("2024-01-01 00:00:30", 1),
                   ("2024-01-01 02:00:00", 3),
                   ("2024-01-01 02:05:00", 4)]),
        ]
        now = time.time()
        for i, (name, rows) in enumerate(files):
            d = f"{landing}/{name}.parquet"
            mk(rows).coalesce(1).write.parquet(d)
            mt = now - 300 + i * 60  # batch order follows mtime
            for f_ in os.listdir(d):
                os.utime(os.path.join(d, f_), (mt, mt))
            os.utime(d, (mt, mt))

        stream = (
            spark.readStream.schema("ts timestamp, k long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{landing}/*.parquet")
        )
        q = (
            dedup_stream(stream, ["k"], watermark="10 seconds")
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

    out = sorted(
        (r["k"], r["ts"].isoformat())
        for r in spark.read.parquet(out_dir).collect()
    )
    # each key exactly once, at its FIRST arrival's timestamp; the
    # late replay of key 1 neither re-emitted nor duplicated
    assert out == [
        (1, "2024-01-01T00:00:30"),
        (2, "2024-01-01T00:00:40"),
        (3, "2024-01-01T02:00:00"),
        (4, "2024-01-01T02:05:00"),
    ]
