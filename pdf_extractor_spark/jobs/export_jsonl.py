"""Export the extracted table as compressed JSONL shards — the delivery
format training pipelines consume.

    python -m pdf_extractor_spark.jobs.export_jsonl \
        --warehouse /path/to/wh --out /path/to/jsonl \
        [--partitions 2025-06-14 2025-06-15] [--min-chars 1] [--shards N]

Shape: one JSON object per line {"url","ts","text","n_chars"}, zstd
parquet-side compression is swapped for gzip text shards (Spark's JSON
writer, whole-stage-codegen `to_json` path — no Python). Partition
pruning happens at the manifest level; `--shards` controls output file
count (repartition before write — the only shuffle, sized to the
delivery target, e.g. shard-per-GB)."""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from pyspark.sql import functions as F

from pdf_extractor_spark.jobs.extract_job import build_session
from pdf_extractor_spark.tables.icetable import IceTable


def export_jsonl(
    spark,
    warehouse: str,
    out: str,
    partitions: list[str] | None = None,
    min_chars: int = 1,
    shards: int | None = None,
) -> int:
    tbl = IceTable(f"{warehouse}/extracted")
    # date_format renders in the SESSION timezone but the literal 'Z'
    # claims UTC — pin the session to UTC for the export so a caller-
    # supplied session in another timezone cannot emit mislabeled stamps
    tz_key = "spark.sql.session.timeZone"
    prev_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "UTC")
    try:
        df = (
            tbl.read(spark, partitions=partitions)
            .filter(F.col("n_chars") >= min_chars)
            .select(
                "url",
                F.date_format(
                    "warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("ts"),
                F.col("extracted_text").alias("text"),
                "n_chars",
            )
        )
        if shards:
            df = df.repartition(shards)
        df.write.mode("overwrite").option("compression", "gzip").json(out)
        return spark.read.json(out).count()
    finally:
        spark.conf.set(tz_key, prev_tz)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", nargs="*", default=None)
    ap.add_argument("--min-chars", type=int, default=1)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args(argv)

    spark = build_session(args.master, args.shuffle_partitions)
    n = export_jsonl(
        spark, args.warehouse, args.out, args.partitions,
        args.min_chars, args.shards,
    )
    print(json.dumps({"exported_rows": n, "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
