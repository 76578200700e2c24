"""Per-partition lineage log (north_rule: "per-partition lineage + metrics").

Schema (FIXTURES.md §4)::

    partition_date DATE, input_snapshot_id BIGINT, rows_in BIGINT,
    rows_out BIGINT, n_errors BIGINT, extractor_version STRING,
    wall_time_s DOUBLE, attempt INT, status STRING

Storage: append-only parquet files under ``<root>/lineage/`` written
driver-side with pyarrow — lineage rows are O(partitions), tiny by design,
so they never need an executor. Readable by Spark/duckdb for audits and by
``completed_partitions`` for resume.

Resume rule: a partition is DONE iff some lineage row has status='ok' AND
the same extractor_version AND the same input snapshot id. Bumping the
extractor version or appending new input data to a partition both invalidate
it — exactly Iceberg's snapshot-based incremental-processing contract.
"""

from __future__ import annotations

import datetime as dt
import pathlib
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("partition_date", pa.date32()),
        pa.field("input_snapshot_id", pa.int64()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("n_errors", pa.int64()),
        pa.field("extractor_version", pa.string()),
        pa.field("wall_time_s", pa.float64()),
        pa.field("attempt", pa.int32()),
        pa.field("status", pa.string()),
    ]
)


class LineageLog:
    def __init__(self, root: str | pathlib.Path):
        self.root = pathlib.Path(root)

    def _files(self) -> list[pathlib.Path]:
        return sorted(self.root.glob("*.parquet")) if self.root.exists() else []

    def records(self) -> list[dict]:
        rows: list[dict] = []
        for f in self._files():
            rows.extend(pq.read_table(f).to_pylist())
        return rows

    def append(self, rows: list[dict]) -> None:
        if not rows:
            return
        self.root.mkdir(parents=True, exist_ok=True)
        norm = []
        for r in rows:
            r = dict(r)
            if isinstance(r["partition_date"], str):
                r["partition_date"] = dt.date.fromisoformat(r["partition_date"])
            r.setdefault("n_errors", 0)
            norm.append(r)
        table = pa.Table.from_pylist(norm, schema=LINEAGE_SCHEMA)
        tmp = self.root / f".tmp-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, tmp)
        tmp.rename(self.root / f"run-{uuid.uuid4().hex}.parquet")

    def completed_partitions(
        self, extractor_version: str, input_snapshot_id: int
    ) -> set[str]:
        done: set[str] = set()
        for r in self.records():
            if (
                r["status"] == "ok"
                and r["extractor_version"] == extractor_version
                and r["input_snapshot_id"] == input_snapshot_id
            ):
                done.add(r["partition_date"].isoformat())
        return done

    def attempts(self, partition_date: str) -> int:
        return sum(
            1
            for r in self.records()
            if r["partition_date"].isoformat() == partition_date
        )

    def read(self, spark):
        """Lineage as a Spark DataFrame (for audits / the anti-join form).

        The schema is passed EXPLICITLY: without it Spark samples one file,
        so a warehouse mixing pre-0.1.1 files (no n_errors column) with new
        ones would get a nondeterministic schema — n_errors silently
        present or absent depending on which file was sampled."""
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("partition_date", T.DateType()),
                T.StructField("input_snapshot_id", T.LongType()),
                T.StructField("rows_in", T.LongType()),
                T.StructField("rows_out", T.LongType()),
                T.StructField("n_errors", T.LongType()),
                T.StructField("extractor_version", T.StringType()),
                T.StructField("wall_time_s", T.DoubleType()),
                T.StructField("attempt", T.IntegerType()),
                T.StructField("status", T.StringType()),
            ]
        )
        files = [str(f) for f in self._files()]
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*files)
