"""The composed near-dup pipeline (LSH → exact-Jaccard verify →
cluster → keep-one): structural invariants the catalog oracle's value
hash can't express — the survivor set must be free of verified
near-duplicates, and clustering must respect the verified edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.queries.dedup import (
    NEAR_DUP_JACCARD,
    _doc_shingles,
    dedup_minhash_lsh_pairs,
    dedup_near_pipeline,
)

SF = "/root/testdata/sf0.001"


def _verified_pairs(spark):
    pairs = dedup_minhash_lsh_pairs(spark, SF)
    sh = _doc_shingles(spark, SF)
    return (
        pairs.join(
            sh.select(
                F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
            ),
            on="doc_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
            ),
            on="doc_b",
        )
        .withColumn(
            "n_inter",
            F.expr("size(array_intersect(sh_a, sh_b))"),
        )
        .filter(
            F.expr(
                "CAST(n_inter AS DOUBLE) / "
                "(size(sh_a) + size(sh_b) - n_inter)"
                f" >= {NEAR_DUP_JACCARD}"
            )
        )
        .select("doc_a", "doc_b")
    )


def test_survivor_set_is_duplicate_free(spark):
    labels = dedup_near_pipeline(spark, SF)
    verified = _verified_pairs(spark)
    assert verified.count() > 0  # the corpus DOES contain near-dups

    # no verified near-dup pair survives with BOTH endpoints kept
    kept = labels.filter(F.col("keep") == 1).select("doc_id")
    both_kept = (
        verified.join(
            kept.withColumnRenamed("doc_id", "doc_a"), on="doc_a"
        )
        .join(kept.withColumnRenamed("doc_id", "doc_b"), on="doc_b")
        .count()
    )
    assert both_kept == 0

    # exactly one survivor per cluster, and it is the minimum doc_id
    per_cluster = labels.groupBy("cluster_id").agg(
        F.sum("keep").alias("n_keep"),
        F.min("doc_id").alias("min_doc"),
        F.count("*").alias("n_members"),
    )
    assert per_cluster.filter("n_keep <> 1").count() == 0
    assert per_cluster.filter("min_doc <> cluster_id").count() == 0
    # the pipeline found multi-member clusters (it actually deduped)
    assert per_cluster.filter("n_members > 1").count() > 0

    # every document is assigned exactly once
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert labels.count() == n_docs
    assert labels.select("doc_id").distinct().count() == n_docs


def test_verified_edges_land_in_one_cluster(spark):
    """Both endpoints of every VERIFIED pair share a cluster, and an
    UNVERIFIED candidate (LSH false positive) must not merge clusters on
    its own — clustering consumes verified edges only."""
    labels = dedup_near_pipeline(spark, SF).select("doc_id", "cluster_id")
    verified = _verified_pairs(spark)
    la = labels.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "cluster_id", "ca"
    )
    lb = labels.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "cluster_id", "cb"
    )
    split = (
        verified.join(la, on="doc_a").join(lb, on="doc_b")
        .filter("ca <> cb")
        .count()
    )
    assert split == 0

    # candidates REJECTED by verification exist (LSH produces false
    # positives here) — the verify stage is doing real work
    n_cand = dedup_minhash_lsh_pairs(spark, SF).count()
    assert n_cand > verified.count()
