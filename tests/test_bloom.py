"""Seen-n-gram Bloom gate invariants (cross-engine value parity is
covered by the catalog oracle suite):

- the Arrow-batch bitmap twin is BIT-IDENTICAL to the relational form,
  including under a different input partitioning (cluster-size
  independence of the partial-bitmap merge);
- no false negatives, ever: every exactly-seen shingle is bloom-hit,
  so n_bloom_hit >= n_exact per document;
- false positives exist and are refuted: an undersized filter
  (m_bits = 2^10 on a corpus of ~3*10^4 shingles) must produce
  n_false_pos > 0 while STILL never missing a truly-seen shingle —
  proving the filter approximates and the exact layer catches it;
- the relational probe's set-bit join broadcasts (the <= m_bits
  position table never shuffles the probe mass).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.queries.dedup import (
    dedup_bloom_probe,
    dedup_bloom_probe_bitmap,
    dedup_bloom_probe_bitmap_of,
    dedup_bloom_probe_of,
)

SF = "/root/testdata/sf0.001"


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_bitmap_twin_bit_identical(spark):
    rel = _collect(dedup_bloom_probe(spark, SF))
    bm = _collect(dedup_bloom_probe_bitmap(spark, SF))
    assert rel == bm
    # partition-count independence: the OR of per-partition bitmaps is
    # the same filter whatever the partitioning
    docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(13)
    bm13 = _collect(dedup_bloom_probe_bitmap_of(docs))
    assert rel == bm13


def test_no_false_negatives(spark):
    for row in dedup_bloom_probe(spark, SF).collect():
        assert row["n_bloom_hit"] >= row["n_exact"], row
        assert row["n_false_pos"] == row["n_bloom_hit"] - row["n_exact"]
        assert 0 <= row["seen_pm"] <= 1000


def test_undersized_filter_shows_false_positives(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tiny = dedup_bloom_probe_of(docs, m_bits=1 << 10).collect()
    assert sum(r["n_false_pos"] for r in tiny) > 0
    for r in tiny:
        assert r["n_bloom_hit"] >= r["n_exact"], r
    # and the bitmap twin agrees at ANY filter size
    tiny_bm = dedup_bloom_probe_bitmap_of(docs, m_bits=1 << 10).collect()
    assert sorted(map(tuple, tiny)) == sorted(map(tuple, tiny_bm))


def test_probe_join_broadcasts(spark):
    plan = dedup_bloom_probe(spark, SF)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "BroadcastHashJoin" in plan
