"""IceTable.read_incremental — the CDC/daily-delta consumer primitive:

- (from, to] returns exactly the rows the appends in that range added,
  computed from manifest diffs alone (immutable files = the diff IS
  the delta);
- compact snapshots in the range are skipped — their "added" files
  are rewrites of already-delivered rows, and including them would
  double-feed the consumer (pinned: rows BEFORE the compaction are
  not re-delivered after it);
- overwrite/upsert snapshots in the range raise (deletes are not
  expressible as an append-only delta);
- consuming in two windows == consuming in one (resumable cursor).
"""

import pytest

from pdf_extractor_spark.tables.icetable import IceTable


@pytest.fixture()
def tbl(tmp_path):
    return IceTable(tmp_path / "t")


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id int, v string, partition_date string"
    )


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_incremental_returns_exactly_the_delta(spark, tbl):
    tbl.append(_df(spark, [(1, "a", "2025-06-14")]))          # snap 0
    tbl.append(_df(spark, [(2, "b", "2025-06-14"),
                           (3, "c", "2025-06-15")]))          # snap 1
    tbl.append(_df(spark, [(4, "d", "2025-06-15")]))          # snap 2
    assert _ids(tbl.read_incremental(spark, 0)) == [2, 3, 4]
    assert _ids(tbl.read_incremental(spark, 0, 1)) == [2, 3]
    assert _ids(tbl.read_incremental(spark, 1, 2)) == [4]
    assert _ids(tbl.read_incremental(spark, 2)) == []
    # two windows == one window (resumable cursor)
    two = _ids(tbl.read_incremental(spark, 0, 1)) + _ids(
        tbl.read_incremental(spark, 1, 2)
    )
    assert sorted(two) == _ids(tbl.read_incremental(spark, 0, 2))


def test_compaction_does_not_double_feed(spark, tbl):
    tbl.append(_df(spark, [(1, "a", "2025-06-14")]))          # snap 0
    tbl.append(_df(spark, [(2, "b", "2025-06-14")]))          # snap 1
    tbl.compact(spark)                                        # snap 2
    tbl.append(_df(spark, [(3, "c", "2025-06-14")]))          # snap 3
    # the compaction rewrote rows 1-2 into new files; the delta after
    # snap 1 must contain ONLY row 3
    assert _ids(tbl.read_incremental(spark, 1)) == [3]


def test_delete_bearing_snapshots_raise(spark, tbl):
    tbl.append(_df(spark, [(1, "a", "2025-06-14")]))          # snap 0
    tbl.overwrite_partitions(_df(spark, [(9, "z", "2025-06-14")]))  # 1
    with pytest.raises(ValueError, match="append-only delta"):
        tbl.read_incremental(spark, 0)
    tbl2_rows = [(9, "z2", "2025-06-14")]
    tbl.upsert(spark, _df(spark, tbl2_rows), keys=["id"])     # snap 2
    with pytest.raises(ValueError, match="append-only delta"):
        tbl.read_incremental(spark, 1)


def test_sort_rewrite_does_not_double_feed(spark, tbl):
    """The sort-clustered rewrite commits through the same 'compact'
    operation, so a CDC consumer skips it exactly like a plain
    compaction — re-clustering a table never re-feeds old rows."""
    tbl.append(_df(spark, [(1, "a", "2025-06-14")]))          # snap 0
    tbl.append(_df(spark, [(2, "b", "2025-06-14")]))          # snap 1
    tbl.compact(
        spark, min_files=1, sort_by=["id"], files_per_partition=2
    )                                                         # snap 2
    tbl.append(_df(spark, [(3, "c", "2025-06-14")]))          # snap 3
    assert _ids(tbl.read_incremental(spark, 1)) == [3]
    assert _ids(tbl.read_incremental(spark, 0)) == [2, 3]
