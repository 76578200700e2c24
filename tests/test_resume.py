"""Checkpoint-resume + lineage (SURVEY.md §5.2 property 3; north_rule
"resumable from checkpoint with per-partition lineage + metrics")."""

import pytest

from pdf_extractor_spark.corpus.build import write_pages_parquet
from pdf_extractor_spark.plans.extract_plan import (
    pending_via_anti_join,
    run_extract,
)
from pdf_extractor_spark.plans.lineage import LineageLog
from pdf_extractor_spark.sources.pages import ingest_corpus_to_icetable
from pdf_extractor_spark.tables.icetable import IceTable
from pdf_extractor_spark.version import EXTRACTOR_VERSION

N_ROWS = 120
N_DAYS = 4


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "pages.parquet"
    write_pages_parquet(p, seed=7, n_rows=N_ROWS, n_days=N_DAYS)
    return p


@pytest.fixture()
def pages_tbl(spark, corpus, tmp_path):
    return ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")


def _read_extracted(spark, wh):
    return IceTable(f"{wh}/extracted").read(spark)


def test_full_run_then_noop(spark, pages_tbl, tmp_path):
    wh = str(tmp_path / "wh")
    r1 = run_extract(spark, pages_tbl, wh, salt=False)
    assert len(r1.processed) == N_DAYS and not r1.failed
    assert _read_extracted(spark, wh).count() == N_ROWS

    # second run: everything already done → no-op
    r2 = run_extract(spark, pages_tbl, wh, salt=False)
    assert r2.processed == [] and len(r2.skipped) == N_DAYS


def test_kill_and_resume_identical(spark, pages_tbl, tmp_path):
    wh_a = str(tmp_path / "wh_a")
    wh_b = str(tmp_path / "wh_b")
    # reference: single uninterrupted run
    run_extract(spark, pages_tbl, wh_a, salt=False)

    # interrupted run: process 2 of 4 partitions, then "crash"
    r1 = run_extract(spark, pages_tbl, wh_b, salt=False, max_dates=2)
    assert len(r1.processed) == 2
    # resume completes the rest
    r2 = run_extract(spark, pages_tbl, wh_b, salt=False)
    assert len(r2.processed) == N_DAYS - 2
    assert len(r2.skipped) == 2

    a = {
        (r.url, r.extracted_text, r.doc_type)
        for r in _read_extracted(spark, wh_a).collect()
    }
    b = {
        (r.url, r.extracted_text, r.doc_type)
        for r in _read_extracted(spark, wh_b).collect()
    }
    assert a == b


def test_failed_partition_retried(spark, pages_tbl, tmp_path):
    wh = str(tmp_path / "wh")
    dates = pages_tbl.partitions()
    with pytest.raises(RuntimeError):
        run_extract(spark, pages_tbl, wh, salt=False, fail_dates={dates[1]})
    lin = LineageLog(f"{wh}/lineage")
    recs = lin.records()
    assert any(r["status"] == "failed" for r in recs)

    r2 = run_extract(spark, pages_tbl, wh, salt=False)
    assert dates[1] in r2.processed
    assert _read_extracted(spark, wh).count() == N_ROWS
    # the retried partition's lineage row carries attempt=2
    ok_rows = [
        r
        for r in LineageLog(f"{wh}/lineage").records()
        if r["status"] == "ok" and r["partition_date"].isoformat() == dates[1]
    ]
    assert ok_rows and ok_rows[0]["attempt"] == 2


def test_lineage_rows_complete(spark, pages_tbl, tmp_path):
    wh = str(tmp_path / "wh")
    run_extract(spark, pages_tbl, wh, salt=False)
    recs = LineageLog(f"{wh}/lineage").records()
    assert len(recs) == N_DAYS
    for r in recs:
        assert r["status"] == "ok"
        assert r["extractor_version"] == EXTRACTOR_VERSION
        assert r["input_snapshot_id"] == pages_tbl.snapshot_id()
        assert r["rows_out"] > 0
        assert r["wall_time_s"] > 0


def test_anti_join_form_matches_manifest_form(spark, pages_tbl, tmp_path):
    wh = str(tmp_path / "wh")
    run_extract(spark, pages_tbl, wh, salt=False, max_dates=1)
    pending = pending_via_anti_join(spark, pages_tbl, wh)
    assert pending == pages_tbl.partitions()[1:]


def test_new_snapshot_invalidates(spark, pages_tbl, tmp_path, corpus):
    """Appending new input data reopens affected partitions (snapshot id
    changes ⇒ lineage rows no longer match)."""
    wh = str(tmp_path / "wh")
    run_extract(spark, pages_tbl, wh, salt=False)
    # append more rows → new snapshot
    from pyspark.sql import functions as F

    extra = (
        spark.read.parquet(str(corpus))
        .limit(10)
        .withColumn("url", F.concat(F.col("url"), F.lit("?v=2")))
        .withColumn("partition_date", F.to_date("warc_ts"))
    )
    pages_tbl.append(extra)
    r = run_extract(spark, pages_tbl, wh, salt=False)
    assert r.skipped == []  # all partitions reprocessed
    assert len(r.processed) > 0


def test_preflight_rejects_bad_inputs(spark, tmp_path):
    from pdf_extractor_spark.plans.extract_plan import (
        PreflightError,
        preflight,
    )
    from pdf_extractor_spark.tables.icetable import IceTable

    import pytest as _pytest

    missing = IceTable(tmp_path / "nope")
    with _pytest.raises(PreflightError, match="missing"):
        preflight(spark, missing, str(tmp_path / "wh"))

    bad = IceTable(tmp_path / "bad")
    df = spark.range(3).selectExpr("cast(id as string) as url")
    df = df.withColumn("partition_date", df.url)
    bad.append(df)
    with _pytest.raises(PreflightError, match="lacks columns"):
        preflight(spark, bad, str(tmp_path / "wh"))


def test_maintenance_between_kill_and_resume(spark, pages_tbl, tmp_path):
    """VERDICT r2 #8: the interaction of table maintenance with the
    resume path. Sequence: partial extract ("crash" after 2 of 4 dates)
    → compact() the extracted table → expire_snapshots() → resume.
    Resume must still (a) skip exactly the completed dates (lineage is
    keyed on the PAGES snapshot, which maintenance of the OUTPUT table
    never touches), (b) produce the same final table as an uninterrupted
    run, and (c) keep time travel valid for every retained snapshot."""
    wh = str(tmp_path / "wh")
    tbl = IceTable(f"{wh}/extracted")

    r1 = run_extract(spark, pages_tbl, wh, salt=False, max_dates=2)
    assert len(r1.processed) == 2

    # maintenance while "crashed": force-rewrite every partition, then GC
    snap_before = tbl.snapshot_id()
    tbl.compact(spark, min_files=1)
    assert tbl.current_snapshot()["operation"] == "compact"
    gone = tbl.expire_snapshots(keep_last=1)
    assert gone["snapshots"] >= 1
    # compaction rewrote files and GC dropped the originals — the table
    # still reads the 2 completed partitions in full
    assert set(tbl.partitions()) == set(r1.processed)
    n_after_maint = tbl.read(spark).count()
    assert n_after_maint > 0

    # resume: completed dates stay skipped, the rest get processed
    r2 = run_extract(spark, pages_tbl, wh, salt=False)
    assert sorted(r2.skipped) == sorted(r1.processed)
    assert len(r2.processed) == N_DAYS - 2
    assert tbl.read(spark).count() == N_ROWS

    # lineage sees one ok row per date, all against the pages snapshot
    recs = LineageLog(f"{wh}/lineage").records()
    ok = [r for r in recs if r["status"] == "ok"]
    assert len(ok) == N_DAYS
    assert {r["input_snapshot_id"] for r in ok} == {pages_tbl.snapshot_id()}

    # byte-identical to an uninterrupted run
    wh_ref = str(tmp_path / "wh_ref")
    run_extract(spark, pages_tbl, wh_ref, salt=False)
    a = {
        (r.url, r.extracted_text)
        for r in IceTable(f"{wh_ref}/extracted").read(spark).collect()
    }
    b = {(r.url, r.extracted_text) for r in tbl.read(spark).collect()}
    assert a == b

    # time travel: every RETAINED snapshot resolves and reads
    for h in tbl.history():
        assert tbl.read_snapshot(spark, h["snapshot_id"]).count() >= 0
    # the pre-compaction snapshot was expired — it must be gone, not
    # half-readable
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        tbl.read_snapshot(spark, snap_before)


def test_dates_per_job_batching_kill_and_resume(spark, pages_tbl, tmp_path):
    """Round-4 (VERDICT r3 #3): K dates per Spark job. A chunked run must
    produce the byte-identical table of a serial run, per-date lineage
    rows must exist for every date, and a chunk killed after its data
    commit but before lineage must re-run whole on resume and converge
    to the same table."""
    wh_a = str(tmp_path / "wh_a")
    wh_b = str(tmp_path / "wh_b")
    wh_c = str(tmp_path / "wh_c")
    run_extract(spark, pages_tbl, wh_a, salt=False)  # serial reference

    # chunked full run: 4 dates in chunks of 3 → chunks [3, 1]
    r = run_extract(spark, pages_tbl, wh_b, salt=False, dates_per_job=3)
    assert len(r.processed) == N_DAYS and not r.failed
    lineage_b = LineageLog(f"{wh_b}/lineage")
    ok_dates = {
        rec["partition_date"]
        for rec in lineage_b.records()
        if rec["status"] == "ok"
    }
    assert len(ok_dates) == N_DAYS  # per-DATE lineage despite chunking

    # killed chunk: fail injected for a date inside the first chunk —
    # the whole chunk must be marked failed, then resume re-runs it
    dates = sorted(pages_tbl.partitions())
    with pytest.raises(RuntimeError):
        run_extract(
            spark, pages_tbl, wh_c, salt=False, dates_per_job=3,
            fail_dates={dates[1]},
        )
    lineage_c = LineageLog(f"{wh_c}/lineage")
    failed = {
        str(rec["partition_date"])
        for rec in lineage_c.records()
        if rec["status"] == "failed"
    }
    assert failed == {str(d) for d in dates[:3]}  # chunk-granular failure
    r2 = run_extract(spark, pages_tbl, wh_c, salt=False, dates_per_job=3)
    assert sorted(r2.processed) == dates  # all dates re-run (none "ok" yet)

    tables = []
    for wh in (wh_a, wh_b, wh_c):
        tables.append({
            (r.url, r.extracted_text, r.doc_type)
            for r in _read_extracted(spark, wh).collect()
        })
    assert tables[0] == tables[1] == tables[2]


def test_url_filter_gate(spark, corpus, tmp_path):
    """run_extract(url_filter=True) drops rejectable pages BEFORE the
    extract stage: planted blocklist/trap urls never land in the
    warehouse, clean pages are untouched, the rejected count is
    reported, and resume stays a no-op."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.build import PAGES_SCHEMA
    from pdf_extractor_spark.queries.webtext import URL_BLOCKLIST

    bad_urls = [
        "https://best-casino.example/win",
        "https://deep.example.org/" + "/".join(f"s{i}" for i in range(9)),
    ]
    p = tmp_path / "pages_url.parquet"
    extra = pa.table(
        {
            "url": bad_urls,
            "warc_ts": [dt.datetime(2025, 6, 14, 10, 0, 0)] * 2,
            "html": [b"<html><body><p>trap page</p></body></html>"] * 2,
            "text": [None, None],
            "lang": ["en", "en"],
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(pa.concat_tables([pq.read_table(corpus), extra]), p)
    tbl = ingest_corpus_to_icetable(spark, p, tmp_path / "pages_url")

    # ungated baseline: the planted pages extract like any other
    wh0 = str(tmp_path / "wh0")
    r0 = run_extract(spark, tbl, wh0, salt=False)
    assert r0.url_rejected == 0
    urls0 = {
        r["url"]
        for r in _read_extracted(spark, wh0).select("url").collect()
    }
    assert set(bad_urls) <= urls0

    # expected reject set from a plain-Python restatement of the rules
    def py_reject(u: str) -> bool:
        host = u.split("/")[2].lower()
        segs = [s for s in u.split("/")[3:] if s]
        frac = round(
            sum(c.isdigit() for c in host) / len(host), 5
        ) if host else 0.0
        return (
            any(w in host for w in URL_BLOCKLIST)
            or len(u) > 256
            or frac > 0.4
            or len(segs) > 8
        )

    expected_rejects = {u for u in urls0 if py_reject(u)}
    assert set(bad_urls) <= expected_rejects

    wh1 = str(tmp_path / "wh1")
    r1 = run_extract(spark, tbl, wh1, salt=False, url_filter=True)
    assert r1.url_rejected == len(expected_rejects)
    urls1 = {
        r["url"]
        for r in _read_extracted(spark, wh1).select("url").collect()
    }
    assert urls1 == urls0 - expected_rejects

    # resume: no-op — no chunk re-runs, so no re-counting either
    r2 = run_extract(spark, tbl, wh1, salt=False, url_filter=True)
    assert r2.processed == [] and r2.url_rejected == 0


def test_sort_clustered_optimize_after_extract(spark, pages_tbl, tmp_path):
    """The --optimize-sort maintenance step on a REAL extracted
    warehouse: compact(sort_by=['url']) re-clusters each partition's
    files so the url bounds the table already records (stats_cols
    default) skip files under a selective predicate, with the row set
    unchanged and resume still a no-op."""
    wh = str(tmp_path / "wh")
    run_extract(spark, pages_tbl, wh, salt=False)
    ext = IceTable(f"{wh}/extracted")
    pre_rows = sorted(
        r["url"] for r in ext.read(spark).select("url").collect()
    )
    probe = pre_rows[len(pre_rows) * 9 // 10]  # a url near the top

    ext.compact(spark, min_files=1, sort_by=["url"], files_per_partition=3)
    live = ext.files()
    pruned = ext.files(where=[("url", ">=", probe)])
    assert 0 < len(pruned) < len(live)  # clustered bounds skip files
    got = ext.read(spark, where=[("url", ">=", probe)])
    assert sorted(r["url"] for r in got.collect()) == [
        u for u in pre_rows if u >= probe
    ]
    assert (
        sorted(r["url"] for r in ext.read(spark).select("url").collect())
        == pre_rows
    )
    # extraction resume is unaffected by the maintenance rewrite
    r2 = run_extract(spark, pages_tbl, wh, salt=False)
    assert r2.processed == [] and len(r2.skipped) == N_DAYS
