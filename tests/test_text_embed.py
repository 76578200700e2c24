"""text_embed_hash → ANN loop: the engine-produced hashed embeddings
must behave like embeddings — exact-duplicate documents embed to
identical vectors, and exact cosine top-k over them recovers the
duplicate partner at cosine 1."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.queries import similarity as sim
from pdf_extractor_spark.queries.dedup import dedup_exact
from pdf_extractor_spark.queries.textstats import (
    EMBED_DIMS,
    text_embeddings,
)

SF = "/root/testdata/sf0.001"


def test_exact_dups_recovered_at_cosine_one(spark, tmp_path):
    # sf0.001 carries no exact duplicates — build a corpus that does:
    # 40 real docs + copies of 5 of them under fresh doc_ids
    docs = spark.read.parquet(f"{SF}/documents.parquet").orderBy("doc_id")
    base = docs.limit(40)
    copies = (
        base.limit(5)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    dup_dir = str(tmp_path / "dup_corpus")
    base.unionByName(copies).write.parquet(f"{dup_dir}/documents.parquet")

    groups = (
        dedup_exact(spark, dup_dir)
        .filter("n_dups >= 2")
        .select("canonical_doc_id")
        .collect()
    )
    assert len(groups) == 5
    dup_queries = [r[0] for r in groups]

    emb = sim._prep(text_embeddings(spark, dup_dir)).filter("nrm > 0")
    q = emb.filter(F.col("vec_id").isin(dup_queries)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    top = sim._topk(
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"{sim._DOT_S} / (qn * cn)"))
    )
    best = {
        r["query_id"]: r["cosine"]
        for r in top.filter("rank = 1").collect()
    }
    # every duplicated query's nearest neighbor is its identical partner
    assert set(best) == set(dup_queries)
    assert all(cos >= 0.99999 for cos in best.values()), best


def test_embedding_shape_and_determinism(spark):
    emb = text_embeddings(spark, SF)
    rows = emb.orderBy("vec_id").limit(3).collect()
    assert all(len(r["embedding"]) == EMBED_DIMS for r in rows)
    again = text_embeddings(spark, SF).orderBy("vec_id").limit(3).collect()
    assert [tuple(r["embedding"]) for r in rows] == [
        tuple(r["embedding"]) for r in again
    ]
    # signed counts: a doc's embedding L1 mass is bounded by token count
    chk = (
        emb.withColumn(
            "l1", F.expr("aggregate(embedding, 0D, (a, x) -> a + abs(x))")
        )
        .join(
            spark.read.parquet(f"{SF}/documents.parquet").select(
                F.col("doc_id").alias("vec_id"),
                F.expr(
                    "CAST(size(filter(split(text, ' '), t -> t <> '')) "
                    "AS DOUBLE)"
                ).alias("n_toks"),
            ),
            on="vec_id",
        )
        .filter("l1 > n_toks")
        .count()
    )
    assert chk == 0


def test_embedding_cosine_near_dup_recall_and_precision(spark):
    """dedup_embedding_cosine (round-4): centered-SRP LSH candidates +
    exact raw-cosine verify. Precision is exact BY CONSTRUCTION (every
    reported pair passed the verify filter — assert reported ⊆ truth),
    recall vs the brute-force tau-0.99 truth must hold at both SFs
    (measured 1.0 with 8x8 banding; raw uncentered banding measured
    0.72-0.75 — the centering is load-bearing, see textstats.py)."""
    from pdf_extractor_spark.queries import textstats as ts

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = ts._nz_text_embeddings(spark, sf)
        qa = emb.select(
            F.col("vec_id").alias("id_a"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        qb = emb.select(
            F.col("vec_id").alias("id_b"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        truth = {
            (r.id_a, r.id_b)
            for r in qa.crossJoin(qb)
            .filter("id_a < id_b")
            .withColumn("cos", F.expr(f"{sim._DOT_S} / (qn * cn)"))
            .filter(F.expr(f"round(cos, 9) >= {ts.EC_TAU}"))
            .select("id_a", "id_b")
            .collect()
        }
        found = {
            (r.doc_id_a, r.doc_id_b)
            for r in ts.dedup_embedding_cosine(spark, sf).collect()
        }
        assert found <= truth, sf  # verify step makes precision exact
        assert len(found & truth) / max(len(truth), 1) >= 0.9, sf


def test_embedding_cosine_exact_dups_always_pair(spark, tmp_path):
    """Exact duplicates center to identical vectors → identical sign
    bits in EVERY band → always candidates → always reported at
    cosine 1.0 (the no-probabilistic-miss guarantee of the design)."""
    from pdf_extractor_spark.queries import textstats as ts

    docs = spark.read.parquet(f"{SF}/documents.parquet").orderBy("doc_id")
    base = docs.limit(40)
    copies = (
        base.limit(5).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    dup_dir = str(tmp_path / "dup_corpus")
    base.unionByName(copies).write.parquet(f"{dup_dir}/documents.parquet")

    pairs = {
        (r.doc_id_a, r.doc_id_b): r.cosine
        for r in ts.dedup_embedding_cosine(spark, dup_dir).collect()
    }
    originals = [r.doc_id for r in base.limit(5).collect()]
    for oid in originals:
        key = (oid, oid + 1_000_000)
        assert key in pairs, (key, sorted(pairs))
        assert pairs[key] == 1.0


def test_embedding_cosine_plan_no_cartesian(spark):
    """The candidate join must be a (band, bkt) equi-join — never a
    CartesianProduct over documents. The ONLY nested-loop join allowed
    is the broadcast of the single-row corpus-mean table."""
    from pdf_extractor_spark.queries import textstats as ts

    plan = ts.dedup_embedding_cosine(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_text_centroid_recall_and_scan_bound(spark):
    """The text-vector SCALE path (round-4): engine-produced hashed
    embeddings through the learned-centroid IVF must reach recall >= 0.9
    vs the exact text_embed_topk baseline at the FIXED probe budget
    (TEXT_CENTROID_PROBES, no per-dataset knob), scanning a bounded
    fraction of the table (<= 0.40; 5/16 cells = 0.31 balanced, the
    500-doc sf0.001 corpus's cells are mildly uneven at 0.37). Both SFs: sf0.01 is
    the adversarial 500-doc corpus where one neighbor sits in a
    far-ranked cell (measured recall 0.933 there, 1.0 at sf0.001/sf0.1)."""
    from pdf_extractor_spark.queries import textstats as ts

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = {
            (r.query_id, r.neighbor_id)
            for r in ts.text_embed_topk(spark, sf).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ts.text_embed_centroid_topk(spark, sf).collect()
        }
        assert len(approx & exact) / len(exact) >= 0.9, sf

    # measured scan fraction at sf0.001 (normalized clustering space)
    sf = "/root/testdata/sf0.001"
    emb = ts._nz_text_embeddings(spark, sf).withColumn(
        "u", F.expr("transform(v, x -> x / nrm)")
    )
    cents = sim._learn_centroids(emb, None, "u")
    dists = "array(" + ", ".join(
        sim._cdist_expr(c, cents, "u") for c in range(sim.N_CENTROIDS)
    ) + ")"
    emb = (
        emb.withColumn("dists", F.expr(dists))
        .withColumn("rd", F.expr("transform(dists, x -> round(x, 9))"))
        .withColumn(
            "bucket",
            F.expr("CAST(array_position(rd, array_min(rd)) - 1 AS BIGINT)"),
        )
        .localCheckpoint(eager=True)
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
        emb.orderBy("vec_id")
        .limit(ts.N_EMBED_QUERIES)
        .select(
            "vec_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {sim.N_CENTROIDS - 1}), "
                    "c -> struct(CAST(c AS BIGINT) AS cid, "
                    "element_at(dists, c + 1) AS dist))"
                )
            ).alias("pc"),
        )
        .withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= ts.TEXT_CENTROID_PROBES)
        .select("vec_id", F.col("pc.cid").alias("qb"))
        .collect()
    )
    scanned = sum(sizes.get(r["qb"], 0) for r in probed)
    assert scanned / (ts.N_EMBED_QUERIES * n_total) <= 0.40
