"""IceTable.upsert — MERGE keep-incoming (SCD1) over the atomic-rename
snapshot layer:

- matched keys are replaced (wherever they live), unmatched insert;
- a key can MOVE partitions: the old partition's copy disappears in the
  same atomic commit that lands the new one;
- copy-on-write is pruned: partitions holding no matched key keep their
  exact file set (re-referenced, never rewritten);
- a partition emptied by the merge reads back empty — not stale;
- prior snapshots still time-travel to the pre-merge rows;
- upsert on a fresh table is an append;
- a conflicting commit during the rewrite raises instead of silently
  dropping either side's rows.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from pdf_extractor_spark.tables.icetable import IceTable


@pytest.fixture()
def tbl(tmp_path):
    return IceTable(tmp_path / "t")


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id int, v string, partition_date string"
    )


def _rows(tbl, spark, **kw):
    # the reader's partition-value inference types the column as DATE;
    # stringify for comparison against the written string values
    return {
        (r.id, r.v, str(r.partition_date))
        for r in tbl.read(spark, **kw).collect()
    }


def test_update_insert_and_untouched(spark, tbl):
    tbl.append(
        _df(spark, [(1, "a", "2025-06-14"), (2, "b", "2025-06-14"),
                    (3, "c", "2025-06-15")])
    )
    before_files = set(tbl.partition_files(
        tbl.current_snapshot()["partitions"]["2025-06-15"]
    ))
    tbl.upsert(
        spark,
        _df(spark, [(1, "a2", "2025-06-14"), (4, "d", "2025-06-14")]),
        keys=["id"],
    )
    assert _rows(tbl, spark) == {
        (1, "a2", "2025-06-14"),
        (2, "b", "2025-06-14"),
        (3, "c", "2025-06-15"),
        (4, "d", "2025-06-14"),
    }
    # untouched partition re-referenced, not rewritten
    after_files = set(tbl.partition_files(
        tbl.current_snapshot()["partitions"]["2025-06-15"]
    ))
    assert after_files == before_files


def test_key_moves_partition_and_empties_old(spark, tbl):
    tbl.append(_df(spark, [(1, "a", "2025-06-14"), (2, "b", "2025-06-15")]))
    snap_before = tbl.snapshot_id()
    # id=1 re-arrives under a NEW partition date: the old copy must
    # vanish in the same commit, leaving 2025-06-14 empty but committed
    tbl.upsert(spark, _df(spark, [(1, "a9", "2025-06-16")]), keys=["id"])
    assert _rows(tbl, spark) == {
        (1, "a9", "2025-06-16"),
        (2, "b", "2025-06-15"),
    }
    assert _rows(tbl, spark, partitions=["2025-06-14"]) == set()
    # ... and time travel still sees the pre-merge row
    old = tbl.read_snapshot(spark, snap_before)
    assert {(r.id, r.v) for r in old.collect()} == {(1, "a"), (2, "b")}


def test_upsert_fresh_table_is_append(spark, tbl):
    tbl.upsert(spark, _df(spark, [(1, "a", "2025-06-14")]), keys=["id"])
    assert _rows(tbl, spark) == {(1, "a", "2025-06-14")}


def test_conflicting_commit_raises(spark, tbl, monkeypatch):
    tbl.append(_df(spark, [(1, "a", "2025-06-14")]))
    real_stage = tbl._stage_write
    raced = []

    def stage_and_race(df):
        added = real_stage(df)
        if not raced:  # fire once: the inner append re-enters this hook
            raced.append(True)
            # another writer lands between our read and our commit
            tbl.append(_df(spark, [(9, "z", "2025-06-15")]))
        return added

    monkeypatch.setattr(tbl, "_stage_write", stage_and_race)
    with pytest.raises(RuntimeError, match="upsert conflict"):
        tbl.upsert(spark, _df(spark, [(1, "a2", "2025-06-14")]), keys=["id"])
    # the concurrent append's row is intact; ours never half-landed
    assert _rows(tbl, spark) == {
        (1, "a", "2025-06-14"),
        (9, "z", "2025-06-15"),
    }
