"""Stream-stream interval join behavior a single-batch run cannot show
(the catalog's `stream_interval_join` hash-gates the exact-match
semantics; value parity vs DuckDB's IEJoin is covered there):

a purchase arriving AFTER both watermarks have advanced past its event
time is dropped on input — the pair a batch join would emit never
appears. That drop is the flip side of the bounded join state: state
eviction is only sound because provably-late rows are excluded.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pdf_extractor_spark.streaming.joins import interval_join


def _write_batches(spark, root: str, schema: str, files) -> str:
    os.makedirs(root, exist_ok=True)
    now = time.time()
    for i, (name, rows) in enumerate(files):
        d = f"{root}/{name}.parquet"
        spark.createDataFrame(rows, schema).select(
            *[
                F.col(c).cast("timestamp" if c.endswith("_ts") else "long")
                for c in [s.split()[0] for s in schema.split(",")]
            ]
        ).coalesce(1).write.parquet(d)
        mt = now - 300 + i * 60
        for f_ in os.listdir(d):
            os.utime(os.path.join(d, f_), (mt, mt))
        os.utime(d, (mt, mt))
    return f"{root}/*.parquet"


def test_late_purchase_beyond_watermark_never_pairs(spark, tmp_path):
    tz_key = "spark.sql.session.timeZone"
    prev_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "UTC")
    try:
        # Same subtlety as the windowed-agg late test: counterparts
        # landing in the SAME micro-batch still join within-batch
        # regardless of the watermark (verified — the first version of
        # this test put both late rows in one batch and got the pair).
        # The drop needs the late purchase to arrive one batch BEFORE
        # its click, so state admission/eviction interposes.
        clicks = _write_batches(
            spark, str(tmp_path / "clicks"),
            "c_id string, c_user string, c_ts string",
            [
                # batch 1: an on-time click far ahead — advances the
                # click-side watermark past 2024-01-01 01:59
                ("a", [("1", "7", "2024-01-01 02:00:00")]),
                # batch 2: another on-time click (no match)
                ("b", [("3", "8", "2024-01-01 02:01:00")]),
                # batch 3: the late click whose only would-be match is
                # the batch-2 late purchase — by now that purchase was
                # never admitted / already evicted
                ("c", [("2", "9", "2024-01-01 00:05:00")]),
            ],
        )
        purchases = _write_batches(
            spark, str(tmp_path / "purchases"),
            "p_id string, p_user string, p_ts string",
            [
                # batch 1: on-time purchase matching click 1 (gap 60 s)
                # — also advances the purchase-side watermark
                ("a", [("11", "7", "2024-01-01 01:59:00")]),
                # batch 2: a purchase at 00:04, hours older than the
                # global watermark -> excluded from join state
                ("b", [("12", "9", "2024-01-01 00:04:00")]),
                # batch 3: on-time purchase, no matching click
                ("c", [("13", "5", "2024-01-01 02:02:00")]),
            ],
        )
        c = (
            spark.readStream.schema("c_id long, c_user long, c_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(clicks)
        )
        p = (
            spark.readStream.schema("p_id long, p_user long, p_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(purchases)
        )
        out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        q = (
            interval_join(c, p, watermark="10 seconds")
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

    rows = spark.read.schema(
        "click_id long, purchase_id long, user_id long, "
        "click_us long, purchase_us long, gap_us long"
    ).parquet(out_dir).collect()
    got = {(r["click_id"], r["purchase_id"]) for r in rows}
    # the on-time pair is there; the late pair (2, 12) — which a batch
    # inequality join WOULD emit — is not
    assert got == {(1, 11)}, rows
    (pair,) = rows
    assert pair["gap_us"] == 60_000_000
