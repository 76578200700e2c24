"""The end-to-end extraction plan (SURVEY.md §4.3), resumable per partition.

Physical shape per partition-date::

    IceTable scan (manifest-pruned to ONE pending date)   -- no file listing
    → Project(url, warc_ts, html)                          -- column pruning
    → salted repartition (byte-length buckets)             -- skew fix
    → mapInPandas(extract)                                 -- Arrow batches
    → overwrite_partitions(extracted, date)                -- idempotent commit
    → lineage.append(ok | failed row)                      -- driver-side

Why a driver loop over PARTITIONS (not one mega-job): each iteration is a
full-cluster distributed job over one crawl-day (≈ hundreds of GB at design
scale); committing per partition gives (a) honest per-partition wall_time /
row counts in lineage, (b) atomic idempotent re-runs of exactly the failed
partitions, (c) bounded blast radius — one poisoned day never rolls back a
month. This is the standard Iceberg incremental-batch topology; the loop is
O(days), never O(rows).

Resume: completed (date, snapshot, extractor_version) triples come from the
lineage log; pending dates prune at the MANIFEST level, so Spark never lists
completed partitions' files. The equivalent relational form (left_anti join
pages↔lineage) is tested in tests/test_resume.py for parity.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from pdf_extractor_spark.operators.extract import (
    extract_stage,
    extract_stage_dispatch,
    with_partition_date,
)
from pdf_extractor_spark.operators.skew import salted_repartition
from pdf_extractor_spark.plans.lineage import LineageLog
from pdf_extractor_spark.tables.icetable import IceTable
from pdf_extractor_spark.version import EXTRACTOR_VERSION


class PreflightError(RuntimeError):
    pass


REQUIRED_PAGES_COLUMNS = {"url", "warc_ts", "html"}


def preflight(spark: SparkSession, pages: IceTable, warehouse: str) -> None:
    """Driver-side preflight before launching any stage — the graft of the
    reference's model preflight (O24, /root/reference/pdf_processor.py:
    106-137), turned from per-request network probes into one-time checks
    of the things THIS pipeline depends on: source table exists, required
    columns present, warehouse writable. Fails fast with a precise error
    instead of burning cluster time."""
    import os
    import tempfile

    if not pages.exists():
        raise PreflightError(f"pages table missing at {pages.root}")
    schema = {f.name for f in pages.read(spark).schema}
    missing = REQUIRED_PAGES_COLUMNS - schema
    if missing:
        raise PreflightError(f"pages table lacks columns: {sorted(missing)}")
    os.makedirs(warehouse, exist_ok=True)
    try:
        with tempfile.NamedTemporaryFile(dir=warehouse):
            pass
    except OSError as e:
        raise PreflightError(f"warehouse {warehouse} not writable: {e}") from e


@dataclass
class ExtractRunResult:
    input_snapshot_id: int
    processed: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    failed: list[str] = field(default_factory=list)
    # pages dropped by the stage-zero URL gate (url_filter=True only)
    url_rejected: int = 0


def run_extract(
    spark: SparkSession,
    pages: IceTable,
    warehouse: str,
    salt: bool = True,
    num_partitions: int | None = None,
    fail_dates: set[str] | None = None,
    max_dates: int | None = None,
    strategy: str = "dispatch",
    with_blocks: bool = True,
    dates_per_job: int = 1,
    url_filter: bool = False,
) -> ExtractRunResult:
    """Run (or resume) extraction of every pending partition of ``pages``.

    ``strategy`` picks the skew plan: ``"dispatch"`` (default; two-branch —
    small rows keep scan splits with zero shuffle, giants repartition
    one-per-task) or ``"salt"`` (byte-bucket salted full repartition,
    operators/skew.py; for inputs whose file layout is pathological enough
    that even the small mass needs re-balancing). ``salt=False`` with
    ``strategy="salt"`` disables re-balancing entirely.

    ``fail_dates`` injects a failure after processing those dates' data but
    before their lineage commit — the kill-and-resume test hook (SURVEY.md
    §5.2 property 3). ``max_dates`` bounds work per invocation (also used by
    the kill test).

    ``dates_per_job`` batches K pending dates into ONE Spark job (round-4):
    the scan prunes to the K partitions, the extract stage runs once over
    their union, the table commit replaces all K partitions atomically,
    and per-date lineage rows are derived from a single
    groupBy(partition_date) over the committed output. At 10^3 pending
    daily partitions the serial per-date loop pays 10^3 job/commit
    latencies with the cluster idle in between; chunking amortizes that
    to 10^3/K while keeping resume granularity (a killed chunk re-runs
    whole — the overwrite is idempotent, lineage rows are per date).

    ``url_filter=True`` applies the stage-zero URL gate
    (queries/webtext.url_reject_expr: host blocklist, length,
    digit-host fraction, crawler-trap path depth) BEFORE the extract
    stage — the RefinedWeb/C4 reject-by-url-first shape; rejected
    pages never reach the Arrow parser. Deterministic, so resume
    semantics are unchanged; the dropped count lands in
    ``ExtractRunResult.url_rejected``."""
    extracted_tbl = IceTable(f"{warehouse}/extracted")
    lineage = LineageLog(f"{warehouse}/lineage")

    snap_id = pages.snapshot_id()
    all_dates = pages.partitions()
    done = lineage.completed_partitions(EXTRACTOR_VERSION, snap_id)
    pending = [d for d in all_dates if d not in done]
    result = ExtractRunResult(
        input_snapshot_id=snap_id, skipped=[d for d in all_dates if d in done]
    )

    if max_dates is not None:
        pending = pending[:max_dates]

    k = max(1, dates_per_job)
    for i in range(0, len(pending), k):
        chunk = pending[i : i + k]
        t0 = time.monotonic()
        attempts = {d: lineage.attempts(d) + 1 for d in chunk}
        try:
            src = pages.read(spark, partitions=chunk)
            n_url_rejected = 0
            if url_filter:
                # Stage-zero URL gate (web_url_filter's rules as one
                # predicate): reject crawler-trap / blocklisted /
                # generated-host pages BEFORE the Arrow extract stage
                # parses a byte of their HTML. The rejected count is
                # one extra job over the pruned url column only — the
                # html bytes that dominate this table's IO are never
                # read for it (column pruning), so at 100 TB the count
                # costs ~a url-column scan, never a corpus scan.
                from pdf_extractor_spark.queries.webtext import (
                    url_reject_expr,
                )

                n_url_rejected = (
                    src.select("url").filter(url_reject_expr("url")).count()
                )
                src = src.filter(~url_reject_expr("url"))
            if strategy == "dispatch":
                extracted = extract_stage_dispatch(src, with_blocks=with_blocks)
            else:
                src = salted_repartition(src, num_partitions, enabled=salt)
                extracted = extract_stage(src, with_blocks=with_blocks)
            out = with_partition_date(extracted)
            # ONE atomic commit replaces every partition in the chunk —
            # readers see all K new dates or none
            extracted_tbl.overwrite_partitions(out)
            if fail_dates and set(chunk) & fail_dates:
                raise RuntimeError(f"injected failure in chunk {chunk}")
            # per-date counts from the committed output: one job, one
            # groupBy over just the chunk's partitions
            from pyspark.sql import functions as F

            out_df = extracted_tbl.read(spark, partitions=chunk)
            stats = {
                r["partition_date"]: r
                for r in out_df.groupBy(
                    F.col("partition_date").cast("string").alias(
                        "partition_date"
                    )
                )
                .agg(
                    F.count("*").alias("n"),
                    F.sum(
                        F.when(
                            F.col("error").isNotNull()
                            & (F.col("error") != ""),
                            1,
                        ).otherwise(0)
                    ).alias("ne"),
                )
                .collect()
            }
            wall = time.monotonic() - t0
            lineage.append(
                [
                    {
                        "partition_date": date,
                        "input_snapshot_id": snap_id,
                        # extraction is 1:1 row-preserving by design
                        "rows_in": stats[date]["n"] if date in stats else 0,
                        "rows_out": stats[date]["n"] if date in stats else 0,
                        "n_errors": int(stats[date]["ne"] or 0)
                        if date in stats
                        else 0,
                        "extractor_version": EXTRACTOR_VERSION,
                        # chunk wall clock: the dates ran as one job, so
                        # each date's row carries the shared job time
                        "wall_time_s": wall,
                        "attempt": attempts[date],
                        "status": "ok",
                    }
                    for date in chunk
                ]
            )
            result.processed.extend(chunk)
            result.url_rejected += n_url_rejected
        except Exception:
            wall = time.monotonic() - t0
            lineage.append(
                [
                    {
                        "partition_date": date,
                        "input_snapshot_id": snap_id,
                        "rows_in": 0,
                        "rows_out": 0,
                        "extractor_version": EXTRACTOR_VERSION,
                        "wall_time_s": wall,
                        "attempt": attempts[date],
                        "status": "failed",
                    }
                    for date in chunk
                ]
            )
            result.failed.extend(chunk)
            if fail_dates and set(chunk) & fail_dates:
                raise
    return result


def pending_via_anti_join(spark, pages: IceTable, warehouse: str) -> list[str]:
    """The relational form of the resume set — pages partitions LEFT ANTI
    lineage(ok, version, snapshot). The driver loop uses the manifest-set
    form (zero cluster work); this exists for parity testing and as the
    pattern a pure-SQL deployment would use (broadcast anti-join: lineage is
    O(partitions) rows, always broadcastable)."""
    from pyspark.sql import functions as F

    lineage = LineageLog(f"{warehouse}/lineage")
    snap_id = pages.snapshot_id()
    parts_df = spark.createDataFrame(
        [(d,) for d in pages.partitions()], "partition_date string"
    )
    done_df = (
        lineage.read(spark)
        .filter(
            (F.col("status") == "ok")
            & (F.col("extractor_version") == EXTRACTOR_VERSION)
            & (F.col("input_snapshot_id") == F.lit(snap_id))
        )
        .select(F.col("partition_date").cast("string").alias("partition_date"))
    )
    pending = parts_df.join(
        F.broadcast(done_df), on="partition_date", how="left_anti"
    )
    return sorted(r[0] for r in pending.collect())
