"""Stateful streaming sessionization: feed a file stream of events with
known gaps, drain with availableNow, and check the closed sessions
against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_spark.streaming.sessions import sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(path, rows):
    tbl = pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def test_sessionize_closes_on_gap_and_watermark(spark, tmp_path):
    landing = tmp_path / "events"
    landing.mkdir()
    s = lambda sec: T0 + dt.timedelta(seconds=sec)
    rows = [
        # user 1: two sessions separated by a 2000s gap (> 1800s)
        (s(0), 1, 1.0),
        (s(100), 1, 2.0),
        (s(2500), 1, 3.0),
        # user 2: one session
        (s(50), 2, 5.0),
        (s(60), 2, 5.0),
        # a far-future event advances the watermark so open sessions
        # time out and close (watermark 10s, gap 1800s)
        (s(100000), 99, 0.0),
    ]
    _write_events(landing / "f1.parquet", rows)

    events = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .parquet(str(landing))
    )
    sessions = sessionize(events, gap_seconds=1800, watermark="10 seconds")
    out_dir = tmp_path / "out"
    q = (
        sessions.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.n_events, r.value_cents): r
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # user 1 session A: events at 0,100 → 2 events, 300 cents
    assert (1, 2, 300) in got
    a = got[(1, 2, 300)]
    assert a.duration_s == 100.0
    # user 1 session B: single event at 2500 → closed by watermark timeout
    assert (1, 1, 300) in got
    # user 2: one session of 2 events, 1000 cents
    assert (2, 2, 1000) in got
