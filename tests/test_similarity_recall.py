"""ANN quality regression against the exact brute-force top-k.

The query-directed multiprobe path must reach recall >= 0.9 even here —
and random near-orthogonal embeddings are LSH's WORST case (recall ≈
scan fraction, measured by scripts/ann_probe_sweep.py); real clustered
embeddings reach the same recall with far fewer probes. The single-probe
IVF floor is loose: it only guards that the bucketing itself still
works."""

from __future__ import annotations

import pytest

from pdf_extractor_spark.queries import CATALOG


def _pairs(spark, name, sf):
    return {
        (r.query_id, r.neighbor_id)
        for r in CATALOG[name].fn(spark, sf).collect()
    }


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_multiprobe_recall(spark, sf):
    exact = _pairs(spark, "embedding_topk", sf)
    ivf = _pairs(spark, "embedding_ivf_topk", sf)
    multi = _pairs(spark, "embedding_ivf_multiprobe", sf)
    r_ivf = len(ivf & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi > r_ivf
    assert r_ivf >= 0.15
    assert r_multi >= 0.9


def test_learned_centroid_recall_and_scan_bound(spark):
    """The learned-centroid IVF default: recall >= 0.9 while scanning
    <= 25% of the table on the clustered fixture, with the FIXED probe
    budget — no per-dataset knob (the round-2 multiprobe needed a
    hand-picked MP_PROBES_CLUSTERED; learned centroids do not)."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries import similarity as sim

    exact = _pairs(spark, "embedding_topk_clustered", "ignored")
    approx = _pairs(spark, "embedding_centroid_clustered", "ignored")
    assert len(approx & exact) / len(exact) >= 0.9

    # measured scan fraction: sum over queries of probed-bucket sizes
    emb = sim._prep(sim._clustered_emb(spark))
    cents = sim._learn_centroids(emb)
    dists = "array(" + ", ".join(
        sim._cdist_expr(c, cents) for c in range(sim.N_CENTROIDS)
    ) + ")"
    emb = (
        emb.withColumn("dists", F.expr(dists))
        .withColumn("rd", F.expr("transform(dists, x -> round(x, 9))"))
        .withColumn(
            "bucket",
            F.expr("CAST(array_position(rd, array_min(rd)) - 1 AS BIGINT)"),
        )
    )
    sizes = {
        r["bucket"]: r["n"]
        for r in emb.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(sizes.values())
    from pyspark.sql import Window

    pw = Window.partitionBy("vec_id").orderBy(
        F.expr("round(pc.dist, 9)").asc(), F.col("pc.cid").asc()
    )
    probed = (
        emb.filter(F.col("vec_id") < sim.N_QUERIES)
        .withColumn(
            "pc",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {sim.N_CENTROIDS - 1}), "
                    "c -> struct(CAST(c AS BIGINT) AS cid, "
                    "element_at(dists, c + 1) AS dist))"
                )
            ),
        )
        .withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= sim.CENTROID_PROBES)
        .select("vec_id", F.col("pc.cid").alias("qb"))
        .collect()
    )
    scanned = sum(sizes.get(r["qb"], 0) for r in probed) / (
        sim.N_QUERIES * n_total
    )
    assert scanned <= 0.25, scanned


def test_clustered_multiprobe_recall_at_low_cost(spark):
    """On clustered embeddings (the realistic regime) the SAME multiprobe
    scheme reaches recall >= 0.9 probing only MP_PROBES_CLUSTERED=4 of 16
    buckets — the scale-path claim that random vectors cannot show."""
    from pdf_extractor_spark.queries.similarity import (
        MP_PLANES,
        MP_PROBES_CLUSTERED,
    )

    assert MP_PROBES_CLUSTERED / (1 << MP_PLANES) <= 0.25  # cheap probes
    exact = _pairs(spark, "embedding_topk_clustered", "ignored")
    multi = _pairs(spark, "embedding_multiprobe_clustered", "ignored")
    assert len(multi & exact) / len(exact) >= 0.9
