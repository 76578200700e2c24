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


def test_streaming_sessions_match_batch_form(spark, tmp_path):
    """The stateful streaming operator must agree, session for session,
    with the oracle-checked batch gaps-and-islands form
    (queries/relational.py::event_sessions) on the same events — that
    chain makes the streaming op transitively oracle-verified."""
    import random

    from pdf_extractor_spark.queries.relational import event_sessions

    rng = random.Random(77)
    landing = tmp_path / "events"
    landing.mkdir()
    rows = []
    for uid in range(1, 9):
        t = rng.randint(0, 500)
        for _ in range(rng.randint(3, 25)):
            rows.append(
                (T0 + dt.timedelta(seconds=t), uid,
                 round(rng.uniform(0, 50), 2))
            )
            # mix of intra-session steps and occasional > gap jumps
            t += rng.choice([5, 17, 60, 300, 2000, 4000])
    rows.append((T0 + dt.timedelta(seconds=10**6), 99, 0.0))  # sentinel:
    # advances the watermark far enough that every other session closes
    rows.sort(key=lambda r: r[0])
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
    epoch = dt.datetime(1970, 1, 1)

    def us(t: dt.datetime) -> int:  # naive UTC → epoch micros, local-tz-free
        return int((t - epoch).total_seconds() * 1e6)

    streamed = {
        (r.user_id, us(r.session_start), us(r.session_end),
         r.n_events, r.value_cents)
        for r in spark.read.parquet(str(out_dir)).collect()
    }

    # batch form over the same rows (events.parquet shape needs event_id)
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, batch_dir / "events.parquet")
    batch = {
        (
            r.user_id,
            r.session_start_us,
            r.session_end_us,
            r.n_events,
            r.value_cents,
        )
        for r in event_sessions(spark, str(batch_dir)).collect()
        if r.user_id != 99  # the sentinel's own session never closes
    }
    assert streamed == batch
    assert len(batch) >= 10  # the corpus really exercises multi-sessions


def test_event_sessions_tz_independent(spark):
    """ADVICE r2: the naive-epoch expression must not depend on
    spark.sql.session.timeZone — a non-UTC caller gets identical values
    (and therefore identical oracle parity) to a UTC one."""
    from pdf_extractor_spark.queries.relational import event_sessions

    sf = "/root/testdata/sf0.001"
    utc = event_sessions(spark, sf).orderBy("user_id", "session_seq").collect()
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = event_sessions(spark, sf).orderBy(
            "user_id", "session_seq"
        ).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc == ny
