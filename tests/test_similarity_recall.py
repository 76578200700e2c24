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


def test_rounding_parity_fuzz_three_engines(spark):
    """ADVICE r3: the centroid pipeline pins three rounding
    implementations as identical — Python Decimal HALF_UP (_roundn),
    Spark round(), DuckDB round(). Facts this test pins:

    1. _roundn == Spark round() on EVERY double, including adversarial
       exact-.5-boundary values — both quantize the shortest decimal
       repr with HALF_UP (Spark: BigDecimal.valueOf/Double.toString;
       Python: Decimal(repr(x))). An exact-binary Decimal(x) form was
       measured to disagree by 1 ulp on boundary values; _roundn
       deliberately uses repr(x).
    2. All three engines agree on PIPELINE-SHAPED values — uniform
       randoms and 64-term squared-distance sums at the pipeline's
       magnitudes — at both 6 and 9 dp. These are the values the oracle
       hash gate actually sees.
    3. DuckDB's scaled-double round CAN flip a tie on constructed
       boundary values k*10^-n + 5*10^-(n+1); when it does, the
       disagreement is exactly one unit in the last place, never worse.
       This is the documented residual risk: it only exists for values
       whose shortest repr lands exactly on a decimal .5 boundary,
       which arbitrary-double arithmetic does not produce."""
    import random

    import duckdb

    from pdf_extractor_spark.queries.similarity import _roundn

    rng = random.Random(123)
    pipeline_vals = [rng.uniform(-16, 16) for _ in range(4000)]
    pipeline_vals += [
        sum((rng.uniform(-8, 8)) ** 2 for _ in range(64)) for _ in range(500)
    ]
    # adversarial .5-boundary shapes at both scales
    boundary_vals = [k * 1e-6 + 5e-7 for k in range(-200, 200)]
    boundary_vals += [k * 1e-9 + 5e-10 for k in range(-200, 200)]
    vals = pipeline_vals + boundary_vals
    n_pipe = len(pipeline_vals)
    for n in (6, 9):
        ulp = 10.0 ** (-n)
        py = [_roundn(x, n) for x in vals]
        sdf = spark.createDataFrame(
            [(i, x) for i, x in enumerate(vals)], "i long, x double"
        )
        sp = [
            r["r"]
            for r in sdf.selectExpr("i", f"round(x, {n}) AS r")
            .orderBy("i")
            .collect()
        ]
        con = duckdb.connect()
        dk = [
            r[0]
            for r in con.execute(
                f"SELECT round(x, {n}) FROM (SELECT unnest(?) AS x)",
                [vals],
            ).fetchall()
        ]
        con.close()
        # fact 1: Python == Spark everywhere, boundaries included
        mismatch_ps = [(v, a, b) for v, a, b in zip(vals, py, sp) if a != b]
        assert not mismatch_ps, (n, mismatch_ps[:5])
        # fact 2: three-way agreement on pipeline-shaped values
        mismatch_pd_pipe = [
            (v, a, b)
            for v, a, b in zip(vals[:n_pipe], py[:n_pipe], dk[:n_pipe])
            if a != b
        ]
        assert not mismatch_pd_pipe, (n, mismatch_pd_pipe[:5])
        # fact 3: DuckDB boundary flips are exactly 1 ulp, never worse
        for v, a, b in zip(vals[n_pipe:], py[n_pipe:], dk[n_pipe:]):
            if a != b:
                assert abs(a - b) < 1.5 * ulp, (n, v, a, b)


def test_quantize_int8_roundtrip(spark):
    """Quantization invariants (cross-engine parity is the catalog
    gate): codes stay in [-127, 127], the max-|x| dimension maps to
    ±127 exactly, and reconstruction error is bounded by half a
    quantization step per dimension."""
    from pdf_extractor_spark.queries.similarity import (
        embedding_quantize_int8,
    )

    rows = embedding_quantize_int8(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).collect()
    }
    for r in rows:
        v = [float(x) for x in emb[r["vec_id"]]]
        ma = max(abs(x) for x in v)
        assert abs(r["max_abs"] - ma) < 1e-5
        assert r["q_l1"] <= 127 * r["n_dims"]
        assert abs(r["q_sum"]) <= r["q_l1"]
        if ma > 0:
            # worst-case per-dim error is (ma/127)/2 -> mse bound
            step = ma / 127.0
            assert r["mse"] <= (step / 2) ** 2 + 1e-12, r
            # round-trip beats 1% relative RMS on these vectors
            rms = (sum(x * x for x in v) / len(v)) ** 0.5
            assert r["mse"] ** 0.5 <= 0.02 * max(rms, 1e-9) + step


def test_pq_shortlist_rerank_recall(spark):
    """PQ/ADC shortlist + exact re-rank: recall@TOP_K >= 0.8 vs the
    exact L2 brute force on the isotropic fixture (PQ's WORST case —
    i.i.d. dimensions carry no per-subspace structure; measured 0.86 at
    sf0.001, 0.82 at sf0.01 with the 64-bit code). The raw-ADC top-k
    (no re-rank) measures ~0.26 here — the shortlist+re-rank SHAPE, not
    bitrate, is what makes PQ usable, which is why the entry ships that
    shape."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from pdf_extractor_spark.queries.similarity import (
        _SQD_S,
        N_QUERIES,
        TOP_K,
        _emb,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = _pairs(spark, "embedding_pq_topk", sf)
        emb = _emb(spark, sf)
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        c = emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("v").alias("xv")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.expr("round(dist, 9)").asc(), F.col("neighbor_id").asc()
        )
        exact = {
            (r.query_id, r.neighbor_id)
            for r in c.join(
                F.broadcast(q), F.expr("query_id <> neighbor_id")
            )
            .withColumn("dist", F.expr(_SQD_S.format(a="qv", b="xv")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .collect()
        }
        recall = len(got & exact) / len(exact)
        assert recall >= 0.8, (sf, recall)


def test_pq_codes_compact_and_complete(spark):
    """Every vector gets PQ_M codes in [0, N_CENTROIDS) and a full-dim
    reconstruction — the 64-double vector compresses to 16 4-bit codes
    (64 bits) losslessly at the schema level."""
    from pdf_extractor_spark.queries.similarity import (
        DIM,
        N_CENTROIDS,
        PQ_M,
        _emb,
        _pq_encode,
    )

    enc = _pq_encode(_emb(spark, "/root/testdata/sf0.001"))
    rows = enc.collect()
    n_vecs = len(rows)
    assert n_vecs > 0
    for r in rows:
        for m in range(PQ_M):
            assert 0 <= r[f"code{m}"] < N_CENTROIDS
        assert len(r["recon"]) == DIM


def test_ivfpq_clustered_recall_and_cascade(spark):
    """IVF-PQ on the clustered fixture (where coarse cells are
    meaningful): rerank recall@TOP_K >= 0.8 vs exact L2 (measured
    0.84), and the candidate cascade is real — every reported pair's
    neighbor shares a probed cell with the query (coarse pruning is
    load-bearing, not decorative)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from pdf_extractor_spark.queries.similarity import (
        _SQD_S,
        N_QUERIES,
        TOP_K,
        _assign_buckets,
        _clustered_emb,
        _ivfpq_search,
        CENTROID_PROBES,
    )

    clus = _clustered_emb(spark)
    got = {
        (r.query_id, r.neighbor_id)
        for r in _ivfpq_search(clus).collect()
    }
    q = clus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = clus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("xv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.expr("round(dist, 9)").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        c.join(F.broadcast(q), F.expr("query_id <> neighbor_id"))
        .withColumn("dist", F.expr(_SQD_S.format(a="qv", b="xv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .collect()
    )
    by_q: dict = {}
    for r in exact:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    got_by_q: dict = {}
    for qq, nn in got:
        got_by_q.setdefault(qq, set()).add(nn)
    recall = sum(
        len(got_by_q.get(qq, set()) & nn) for qq, nn in by_q.items()
    ) / (len(by_q) * TOP_K)
    assert recall >= 0.8, recall

    # cascade: every reported neighbor lives in one of its query's
    # probed cells
    bucketed = _assign_buckets(clus, f"vec_id >= {N_QUERIES}")
    cell = {r.vec_id: r.bucket for r in bucketed.select("vec_id", "bucket").collect()}
    probes: dict = {}
    for r in (
        bucketed.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "rd")
        .collect()
    ):
        order = sorted(range(len(r.rd)), key=lambda cc: (r.rd[cc], cc))
        probes[r.vec_id] = set(order[:CENTROID_PROBES])
    for qq, nn in got:
        assert cell[nn] in probes[qq], (qq, nn)
