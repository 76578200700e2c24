"""Streaming ingest: availableNow drain produces byte-identical text,
the checkpoint makes file processing incremental (new files only), and
time travel sees the pre-append snapshot."""

from __future__ import annotations

import pyarrow.parquet as pq

from pdf_extractor_spark.corpus.build import rows_to_pages_table
from pdf_extractor_spark.corpus.generator import generate_rows
from pdf_extractor_spark.streaming import stream_extract
from pdf_extractor_spark.tables.icetable import IceTable

from tests.conftest import GOLDEN_DIR



def _stream_lineage(wh, ckpt):
    """Lineage is scoped per stream (round 3): same derivation as
    stream_extract — md5 of the absolute checkpoint dir."""
    import hashlib

    from pdf_extractor_spark.plans.lineage import LineageLog

    sid = hashlib.md5(str(ckpt.resolve()).encode("utf-8")).hexdigest()[:12]
    return LineageLog(f"{wh}/lineage_stream/{sid}"), sid


def _drain(q):
    q.awaitTermination(300)


def test_stream_extract_incremental(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = list(generate_rows(42, 60, 4))
    pq.write_table(rows_to_pages_table(rows[:40]), landing / "f1.parquet")

    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    _drain(stream_extract(spark, str(landing), wh, ckpt))
    tbl = IceTable(f"{wh}/extracted_stream")
    first = tbl.read(spark)
    assert first.count() == 40
    snap_after_first = tbl.snapshot_id()

    # byte-identity vs the committed goldens (same seed ⇒ same urls)
    goldens = spark.read.parquet(str(GOLDEN_DIR / "goldens.parquet"))
    matched = (
        first.alias("e")
        .join(goldens.alias("g"), "url")
        .filter("e.extracted_text = g.extracted_text")
        .count()
    )
    assert matched == 40

    # second file lands; checkpoint must process ONLY the new file
    pq.write_table(rows_to_pages_table(rows[40:]), landing / "f2.parquet")
    _drain(stream_extract(spark, str(landing), wh, ckpt))
    assert tbl.read(spark).count() == 60
    batch_ids = {
        r[0] for r in tbl.read(spark).select("batch_id").distinct().collect()
    }
    assert batch_ids == {0, 1}

    # time travel: the pre-second-batch snapshot still reads 40 rows
    assert tbl.read_snapshot(spark, snap_after_first).count() == 40
    ops = [h["operation"] for h in tbl.history()]
    assert ops == ["append", "append"]


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    """Crash-replay simulation: re-delivering an already-committed
    micro-batch (the crash-between-append-and-checkpoint window) must
    write nothing — no duplicate rows, no new snapshot, no lineage."""
    from pdf_extractor_spark.plans.lineage import LineageLog
    from pdf_extractor_spark.streaming.ingest import commit_batch

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = list(generate_rows(7, 20, 2))
    pq.write_table(rows_to_pages_table(rows), landing / "f.parquet")
    wh = str(tmp_path / "wh")
    _drain(stream_extract(spark, str(landing), wh, str(tmp_path / "ck")))

    tbl = IceTable(f"{wh}/extracted_stream")
    lineage, stream_id = _stream_lineage(wh, tmp_path / "ck")
    n_rows = tbl.read(spark).count()
    n_snap = tbl.snapshot_id()
    n_lineage = len(lineage.records())
    batch_df = spark.read.parquet(str(landing / "f.parquet"))
    assert commit_batch(batch_df, 0, tbl, lineage, stream_id) is False
    assert tbl.read(spark).count() == n_rows
    assert tbl.snapshot_id() == n_snap
    assert len(lineage.records()) == n_lineage

    # a genuinely new batch id still commits
    assert commit_batch(batch_df, 1, tbl, lineage, stream_id) is True
    assert tbl.read(spark).count() == 2 * n_rows
    assert tbl.current_snapshot()["stream_batches"][stream_id] == 1

    # a DIFFERENT stream (fresh checkpoint) restarting at batch 0 is NOT
    # a replay — its data must land
    assert commit_batch(batch_df, 0, tbl, lineage, "other-stream") is True
    assert tbl.read(spark).count() == 3 * n_rows

    # maintenance commits carry the markers forward: compaction must not
    # reset exactly-once bookkeeping
    tbl.compact(spark)
    snap = tbl.current_snapshot()
    assert snap["operation"] == "compact"
    assert snap["stream_batches"][stream_id] == 1
    assert commit_batch(batch_df, 1, tbl, lineage, stream_id) is False


def test_replay_backfills_lost_lineage(spark, tmp_path):
    """The crash window BETWEEN the table commit and the lineage append:
    the batch is in the table (marker set) but lineage rows are gone.
    The replay must still skip the data write (exactly-once) but detect
    the missing lineage and backfill it from the committed table."""
    import shutil

    from pdf_extractor_spark.plans.lineage import LineageLog
    from pdf_extractor_spark.streaming.ingest import commit_batch

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = list(generate_rows(7, 20, 2))
    pq.write_table(rows_to_pages_table(rows), landing / "f.parquet")
    wh = str(tmp_path / "wh")
    _drain(stream_extract(spark, str(landing), wh, str(tmp_path / "ck")))

    tbl = IceTable(f"{wh}/extracted_stream")
    lineage, stream_id = _stream_lineage(wh, tmp_path / "ck")
    healthy = lineage.records()
    assert healthy
    # simulate the crash: the lineage write never happened
    shutil.rmtree(lineage.root)
    assert lineage.records() == []
    batch_df = spark.read.parquet(str(landing / "f.parquet"))
    n_rows = tbl.read(spark).count()
    n_snap = tbl.snapshot_id()
    # replay: no data written, but lineage healed from the committed table
    assert commit_batch(batch_df, 0, tbl, lineage, stream_id) is False
    assert tbl.read(spark).count() == n_rows
    assert tbl.snapshot_id() == n_snap
    healed = lineage.records()
    assert {
        (r["partition_date"], r["rows_out"]) for r in healed
    } == {(r["partition_date"], r["rows_out"]) for r in healthy}
    assert all(r["status"] == "ok" and r["attempt"] == 2 for r in healed)
    # a second replay is a no-op (lineage now intact — no duplicates)
    assert commit_batch(batch_df, 0, tbl, lineage, stream_id) is False
    assert len(lineage.records()) == len(healed)


def test_concurrent_appends_and_compact_lose_nothing(spark, tmp_path):
    """In-process concurrency: appends racing compact() under the table's
    commit lock must never drop rows — the check-then-commit window the
    per-root lock serializes (foreachBatch thread vs maintenance)."""
    import threading

    tbl = IceTable(str(tmp_path / "tbl"))
    base = spark.range(0, 40).selectExpr(
        "id", "CAST(date_add('2024-01-01', CAST(id % 4 AS INT)) AS STRING)"
        " AS partition_date"
    )
    tbl.append(base)

    errs: list[Exception] = []

    def appender(k: int) -> None:
        try:
            df = spark.range(1000 * k, 1000 * k + 10).selectExpr(
                "id",
                "CAST(date_add('2024-01-01', CAST(id % 4 AS INT)) AS "
                "STRING) AS partition_date",
            )
            tbl.append(df)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    def compactor() -> None:
        try:
            tbl.compact(spark)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(k,)) for k in range(4)]
    threads.append(threading.Thread(target=compactor))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # every appended row survives whatever interleaving happened
    assert tbl.read(spark).count() == 40 + 4 * 10
    ids = {r[0] for r in tbl.read(spark).select("id").collect()}
    assert all(1000 * k + 9 in ids for k in range(4))


def test_stream_lineage_rows(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = list(generate_rows(7, 20, 2))
    pq.write_table(rows_to_pages_table(rows), landing / "f.parquet")
    wh = str(tmp_path / "wh")
    _drain(stream_extract(spark, str(landing), wh, str(tmp_path / "ck")))

    from pdf_extractor_spark.plans.lineage import LineageLog

    lin, _ = _stream_lineage(wh, tmp_path / "ck")
    lin = lin.read(spark)
    rows_ = lin.collect()
    assert rows_ and all(r.status == "ok" for r in rows_)
    assert sum(r.rows_out for r in rows_) == 20


def test_stream_markers_merge_not_replace(spark, tmp_path):
    """Two streams sharing one table: a commit by one stream must never
    roll back the other's marker (the round-3 merge_extra fix — a
    marker map computed before the commit lock could overwrite a
    concurrent stream's freshly-committed marker with stale state)."""
    tbl = IceTable(str(tmp_path / "t"))
    df = spark.range(4).selectExpr("id", "'2024-01-01' AS partition_date")

    def commit(stream, batch):
        tbl.append_tracked(
            df,
            merge_extra=lambda prev: {
                "stream_batches": {
                    **prev.get("stream_batches", {}),
                    stream: batch,
                }
            },
        )

    commit("A", 0)
    commit("B", 5)  # interleaved: B commits between A's batches
    commit("A", 1)
    assert tbl.current_snapshot()["stream_batches"] == {"A": 1, "B": 5}
