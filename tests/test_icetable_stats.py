"""Per-file column min/max stats in IceTable manifests (the Iceberg
lower/upper-bounds analog — round-4 VERDICT missing #3):

- IO proof: under a selective non-partition predicate, ``files(where=)``
  lists FEWER files and ``read(where=)``'s scan opens only those
  (``inputFiles()``), while returning exactly the rows a full-scan
  filter returns — skipping is an optimization, never a semantics
  change;
- range predicates on a timestamp column skip too (bounds are encoded
  as epoch-micros integers);
- conservatism: files without usable bounds (stats disabled, non-ASCII
  strings) are never skipped; a stats-free table answers identically;
- appends merge: the re-manifested partition keeps bounds for old AND
  new files;
- maintenance interplay: compact() rewrites files and the new manifest
  carries fresh bounds; time travel to the pre-compact snapshot is
  unchanged.
"""

from __future__ import annotations

import datetime

import pytest

from pdf_extractor_spark.tables.icetable import IceTable


def _mkdf(spark, n0: int, n1: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n0, n1)
        .select(
            F.format_string("https://site-%05d.example/page", "id").alias(
                "url"
            ),
            (
                F.lit(datetime.datetime(2025, 6, 1, tzinfo=datetime.timezone.utc))
                + F.make_interval(mins=F.col("id").cast("int"))
            ).alias("warc_ts"),
            F.lit("2025-06-01").alias("partition_date"),
        )
    )


@pytest.fixture()
def ts_micros_conf(spark):
    """INT96 parquet timestamps carry no footer statistics — production
    tables that want warc_ts bounds write TIMESTAMP_MICROS."""
    key = "spark.sql.parquet.outputTimestampType"
    old = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    yield
    spark.conf.set(key, old)


def test_file_skipping_lists_and_opens_fewer_files(
    spark, tmp_path, ts_micros_conf
):
    t = IceTable(tmp_path / "t")
    # 4 files with disjoint url ranges inside ONE partition
    t.append(_mkdf(spark, 0, 400).repartitionByRange(4, "url"))
    all_files = t.files()
    assert len(all_files) == 4

    probe = "https://site-00007.example/page"
    where = [("url", "=", probe)]
    pruned = t.files(where=where)
    assert len(pruned) < len(all_files)  # fewer files LISTED

    got = t.read(spark, where=where)
    opened = {f.removeprefix("file://") for f in got.inputFiles()}
    assert opened <= set(pruned)  # fewer files OPENED
    expected = t.read(spark).filter(f"url = '{probe}'")
    assert sorted(got.collect()) == sorted(expected.collect())

    # a probe matching nothing anywhere: every file skipped, zero rows
    nowhere = [("url", "=", "zzz-not-a-url")]
    assert t.files(where=nowhere) == []
    assert t.read(spark, where=nowhere).count() == 0


def test_timestamp_range_predicate_skips(spark, tmp_path, ts_micros_conf):
    t = IceTable(tmp_path / "t")
    t.append(_mkdf(spark, 0, 400).repartitionByRange(4, "warc_ts"))
    cut = datetime.datetime(
        2025, 6, 1, 5, 30, tzinfo=datetime.timezone.utc
    )  # minute 330 of 400 → only the tail file(s) survive
    where = [("warc_ts", ">=", cut)]
    pruned = t.files(where=where)
    assert 0 < len(pruned) < len(t.files())
    got = t.read(spark, where=where)
    full = t.read(spark).filter(
        "warc_ts >= timestamp'2025-06-01 05:30:00'"
    )
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in full.collect()
    )
    assert got.count() == 70


def test_stats_free_table_never_skips_but_answers_identically(
    spark, tmp_path
):
    t = IceTable(tmp_path / "t", stats_cols=())
    t.append(_mkdf(spark, 0, 200).repartitionByRange(4, "url"))
    probe = "https://site-00003.example/page"
    where = [("url", "=", probe)]
    assert len(t.files(where=where)) == len(t.files())  # nothing skipped
    assert t.read(spark, where=where).count() == 1  # filter still applied


def test_non_ascii_bounds_are_conservative(spark, tmp_path):
    from pyspark.sql import functions as F

    t = IceTable(tmp_path / "t")
    df = spark.createDataFrame(
        [("ünïcode-url-ÿ", "2025-06-01"), ("średni-url-ż", "2025-06-01")],
        "url string, partition_date string",
    ).repartition(1)
    t.append(df.select("url", F.lit(None).cast("timestamp").alias("warc_ts"), "partition_date"))
    # non-ASCII min/max → no bound recorded → file kept under any probe
    assert len(t.files(where=[("url", "=", "anything")])) == len(t.files())


def test_append_merges_stats_across_old_and_new_files(
    spark, tmp_path, ts_micros_conf
):
    t = IceTable(tmp_path / "t")
    t.append(_mkdf(spark, 0, 100).repartition(1))
    t.append(_mkdf(spark, 100, 200).repartition(1))
    assert len(t.files()) == 2
    lo = [("url", "=", "https://site-00005.example/page")]
    hi = [("url", "=", "https://site-00155.example/page")]
    assert len(t.files(where=lo)) == 1
    assert len(t.files(where=hi)) == 1
    assert t.files(where=lo) != t.files(where=hi)
    assert t.read(spark, where=lo).count() == 1
    assert t.read(spark, where=hi).count() == 1


def test_compact_refreshes_stats_and_time_travel_unchanged(
    spark, tmp_path, ts_micros_conf
):
    t = IceTable(tmp_path / "t")
    t.append(_mkdf(spark, 0, 100).repartition(1))
    t.append(_mkdf(spark, 100, 200).repartition(1))
    pre = t.snapshot_id()
    pre_rows = sorted(r["url"] for r in t.read(spark).collect())
    t.compact(spark)
    assert len(t.files()) == 1
    # the compacted file's manifest carries fresh full-range bounds:
    # an out-of-range probe still skips everything
    assert t.files(where=[("url", "=", "zzz")]) == []
    # and an in-range probe keeps (and finds) the single file
    probe = [("url", "=", "https://site-00150.example/page")]
    assert len(t.files(where=probe)) == 1
    assert t.read(spark, where=probe).count() == 1
    # time travel to the pre-compact snapshot is untouched
    old = sorted(
        r["url"] for r in t.read_snapshot(spark, pre).collect()
    )
    assert old == pre_rows


def test_sort_compact_clusters_files_for_skipping(
    spark, tmp_path, ts_micros_conf
):
    """compact(sort_by=) is the write-side half of file skipping: after
    append-order writes every file spans the whole url range (bounds
    exclude nothing); the sort-clustered rewrite gives each file a
    narrow url slice, so the SAME stats machinery now skips most files
    under a selective range predicate — with identical query answers."""
    from pyspark.sql import functions as F

    t = IceTable(tmp_path / "t")
    df = _mkdf(spark, 0, 400)
    # 4 appends INTERLEAVED by the url's units digit (string position 18)
    # → each file covers ~the whole url range
    for cls in ("048", "159", "26", "37"):
        t.append(
            df.filter(F.col("url").substr(18, 1).isin(list(cls)))
            .repartition(1)
        )
    assert len(t.files()) == 4
    where = [("url", ">=", "https://site-00300.example/page")]
    assert len(t.files(where=where)) == 4  # unclustered: nothing skips

    pre = t.snapshot_id()
    pre_rows = sorted(r["url"] for r in t.read(spark).collect())
    t.compact(spark, sort_by=["url"], files_per_partition=4)

    live = t.files()
    assert 3 <= len(live) <= 5  # ~files_per_partition (range split approx)
    pruned = t.files(where=where)
    assert 0 < len(pruned) < len(live)  # clustered: tail file(s) only
    got = t.read(spark, where=where)
    assert got.count() == 100
    assert sorted(r["url"] for r in t.read(spark).collect()) == pre_rows
    # time travel to the pre-rewrite snapshot is untouched
    assert (
        sorted(r["url"] for r in t.read_snapshot(spark, pre).collect())
        == pre_rows
    )


def test_sort_compact_multi_partition_respects_partitions(
    spark, tmp_path, ts_micros_conf
):
    from pyspark.sql import functions as F

    t = IceTable(tmp_path / "t")
    base = _mkdf(spark, 0, 200)
    for pdate in ("2025-06-01", "2025-06-02"):
        d = base.withColumn("partition_date", F.lit(pdate))
        for cls in ("02468", "13579"):  # even / odd units digit
            t.append(
                d.filter(F.col("url").substr(18, 1).isin(list(cls)))
                .repartition(1)
            )
    assert len(t.files()) == 4
    t.compact(spark, sort_by=["url"], files_per_partition=2)
    got = t.read(spark)
    assert got.count() == 400
    # rows stay in their table partitions after the range rewrite
    per_part = {
        r["partition_date"]: r["n"]
        for r in got.groupBy(F.col("partition_date").cast("string").alias(
            "partition_date")).agg(F.count("*").alias("n")).collect()
    }
    assert per_part == {"2025-06-01": 200, "2025-06-02": 200}


def test_files_per_partition_requires_sort_by(spark, tmp_path):
    t = IceTable(tmp_path / "t")
    t.append(_mkdf(spark, 0, 10).repartition(1))
    with pytest.raises(ValueError, match="requires sort_by"):
        t.compact(spark, files_per_partition=2)


def test_sort_by_without_stats_warns(spark, tmp_path):
    """compact(sort_by=C) where C has no manifest bounds still rewrites
    (row-group stats benefit remains) but warns loudly that files()
    cannot skip on C."""
    t = IceTable(tmp_path / "t", stats_cols=("url",))
    t.append(_mkdf(spark, 0, 40).repartition(2))
    with pytest.warns(UserWarning, match="not in\\s+stats_cols"):
        t.compact(spark, sort_by=["warc_ts"], files_per_partition=2)
    assert t.read(spark).count() == 40
