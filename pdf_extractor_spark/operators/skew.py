"""Byte-length-bucketed salting — the custom skew fix (SURVEY.md §4.2).

AQE's skew handling only rebalances JOIN/AGG shuffle stages; a
``mapInPandas`` over a handful of 50 MB rows stalls one task while the other
cores idle. Fix: classify each row into a byte-length bucket, derive a salt
whose fan-out depends on the bucket, and hash-repartition on (bucket, salt):

- small rows (the mass) get a fine-grained salt (4 × num_partitions groups)
  → uniform spread, many small groups per task;
- big/giant rows get an effectively per-row salt → every giant payload lands
  alone, spread across the cluster instead of stacking on one task.

All expressions are built-in (JVM-side, whole-stage-codegen-friendly):
``length`` on the binary column, a ``when`` ladder, ``xxhash64``, ``pmod``.
Zero Python. Salts are url-derived (no ``rand()``) so task contents are
deterministic across retries and resume.

At 100 TB: this is one extra shuffle of the payload column — explicitly
optional (``enabled=False`` passes through) for inputs already written with
size-balanced files; the bench measures both paths on the giant-blob corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# byte-length bucket boundaries; rows >= the last bound are "giant"
BUCKET_BOUNDS = [256 * 1024, 2 * 1024 * 1024, 16 * 1024 * 1024]
SMALL_FANOUT_PER_PARTITION = 4  # salt groups per output partition, small rows
PER_ROW_FANOUT = 1 << 20  # effectively per-row salt for big/giant rows
# buckets with index >= this get the per-row salt
PER_ROW_BUCKET = 2


def size_bucket(payload_len: Column) -> Column:
    """0 = smallest … len(BUCKET_BOUNDS) = giant."""
    expr = F.lit(len(BUCKET_BOUNDS))
    for i, bound in reversed(list(enumerate(BUCKET_BOUNDS))):
        expr = F.when(payload_len < F.lit(bound), F.lit(i)).otherwise(expr)
    return expr


def salt_for(bucket: Column, url: Column, num_partitions: int) -> Column:
    small_fanout = max(1, num_partitions * SMALL_FANOUT_PER_PARTITION)
    fanout = F.when(
        bucket >= F.lit(PER_ROW_BUCKET), F.lit(PER_ROW_FANOUT)
    ).otherwise(F.lit(small_fanout))
    return F.pmod(F.xxhash64(url), fanout)


def salted_repartition(
    pages: DataFrame,
    num_partitions: int | None = None,
    enabled: bool = True,
) -> DataFrame:
    """Repartition pages so payload bytes — not row counts — balance across
    tasks. See module docstring."""
    if not enabled:
        return pages
    if num_partitions is None:
        num_partitions = int(
            pages.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    plen = F.length(F.col("html"))
    bucket = size_bucket(plen)
    salt = salt_for(bucket, F.col("url"), num_partitions)
    return (
        pages.withColumn("_bucket", bucket)
        .withColumn("_salt", salt)
        .repartition(num_partitions, "_bucket", "_salt")
        .drop("_bucket", "_salt")
    )
