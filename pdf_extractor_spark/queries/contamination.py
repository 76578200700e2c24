"""Benchmark decontamination: flag training documents sharing word
n-grams with a held-out evaluation set.

The operation every LLM training-data pipeline runs before export
(published recipe: n-gram overlap against each benchmark's text, n in
the 8-13 range; here N_CONTAM=4 because the synthetic corpus vocabulary
is ~30 words — 4-grams give a ~810k-point space where planted near-dups
overlap by dozens of grams while chance collisions stay rare; measured
flagged counts 18 / 10 / 1529 of ~487 / 487 / 4878 training docs at
sf0.001 / 0.01 / 0.1).

The benchmark set is carved deterministically from `documents`
(doc_id % BENCH_MOD = 0) so tests and oracles need no external data —
in production it would be a small fixed table of eval-set texts.

Physical shape, sized for 10^12 training docs vs ~10^5 benchmark docs:
the benchmark n-gram set is tiny (|bench| × ~tokens) and is BROADCAST;
the training mass explodes its n-grams map-side and probes the
broadcast hash relation — the 100 TB side never shuffles for the join.
The only full shuffle is the groupBy(doc_id) overlap count, keyed on
the uniform doc_id. Plan-asserted in tests/test_plans.py.

Reference lineage: the reference validates extracted items against
expected patterns (pdf_processor.py:560-600 validation pass); this is
that membership-check semantic scaled to corpus-vs-benchmark n-gram
containment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.queries.dedup import TOKS_D, TOKS_S

N_CONTAM = 4  # n-gram length for overlap detection
BENCH_MOD = 41  # doc_id % BENCH_MOD = 0 -> benchmark (eval) set


def _ngrams_spark(n: int) -> str:
    return (
        f"CASE WHEN size(toks) >= {n} THEN array_distinct(transform("
        f"sequence(0, size(toks) - {n}), "
        f"i -> array_join(slice(toks, i + 1, {n}), ' '))) "
        "ELSE array(text) END"
    )


def _ngrams_duck(n: int) -> str:
    return (
        f"CASE WHEN len(toks) >= {n} THEN list_distinct(list_transform("
        f"range(len(toks) - {n} + 1), "
        f"i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))) "
        "ELSE [text] END"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _grams_of(docs: DataFrame, n: int) -> DataFrame:
    return docs.withColumn("toks", F.expr(TOKS_S)).select(
        "doc_id", F.expr(_ngrams_spark(n)).alias("grams")
    )


# Production n-gram length for REAL text (published decontamination
# recipes use 8-13-grams: long enough that natural-language boilerplate
# like "as well as the" cannot chance-collide). N_CONTAM=4 above is the
# FIXTURE setting, sized for the synthetic ~30-word vocabulary — using
# it on natural text would silently drop clean docs.
N_CONTAM_PROD = 8


def contamination_of(
    train_docs: DataFrame, bench_docs: DataFrame, n: int = N_CONTAM
) -> DataFrame:
    """Generic two-table form: flag TRAINING docs (doc_id, text) whose
    word n-grams overlap any BENCHMARK doc's (text). The doc_id may be
    any joinable/groupable type (BIGINT in the catalog, the corpus
    job's (hi, lo) struct key works too). Output one row per training
    doc: (doc_id, n_overlap, contaminated) — integer-only columns for
    exact cross-engine hash parity."""
    bench_grams = (
        bench_docs.withColumn("toks", F.expr(TOKS_S))
        .select(
            F.explode(
                F.expr(_ngrams_spark(n))
            ).alias("gram")
        )
        .distinct()
    )
    train = _grams_of(train_docs, n)
    # the broadcast is the load-bearing physical property: the training
    # mass probes the benchmark set map-side; grams arrays are already
    # distinct per doc, so a plain count is the distinct-overlap count
    overlap = (
        train.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench_grams), on="gram", how="inner")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        train.select("doc_id")
        .join(overlap, on="doc_id", how="left")
        .select(
            "doc_id",
            F.expr("CAST(coalesce(n_overlap, 0) AS BIGINT)").alias(
                "n_overlap"
            ),
            F.expr(
                "CAST(CASE WHEN coalesce(n_overlap, 0) > 0 THEN 1 "
                "ELSE 0 END AS INT)"
            ).alias("contaminated"),
        )
    )


def decontaminate_of(docs: DataFrame) -> DataFrame:
    """Catalog form: the benchmark is carved out of the one table by
    doc_id % BENCH_MOD (so tests and oracles need no external data);
    training docs are everything else."""
    return contamination_of(
        docs.filter(F.col("doc_id") % BENCH_MOD != 0),
        docs.filter(F.col("doc_id") % BENCH_MOD == 0),
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate_of(_docs(spark, sf_dir))


DECONTAMINATE_SQL = f"""
WITH grams_t AS (
  SELECT doc_id, {_ngrams_duck(N_CONTAM)} AS grams FROM (
    SELECT doc_id, text, {TOKS_D} AS toks FROM documents
  )
),
bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM grams_t
  WHERE doc_id % {BENCH_MOD} = 0
),
train AS (SELECT * FROM grams_t WHERE doc_id % {BENCH_MOD} <> 0),
overlap AS (
  SELECT t.doc_id, COUNT(*) AS n_overlap
  FROM (SELECT doc_id, unnest(grams) AS gram FROM train) t
  JOIN bench b ON t.gram = b.gram
  GROUP BY t.doc_id
)
SELECT t.doc_id,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(CASE WHEN coalesce(o.n_overlap, 0) > 0 THEN 1 ELSE 0 END
            AS INT) AS contaminated
FROM train t LEFT JOIN overlap o ON t.doc_id = o.doc_id
"""


# ---------------------------------------------------------------------------
# FUZZY decontamination (containment form): exact n-gram overlap is
# brittle in both directions on real web text — long grams (8-13) miss
# mutated/paraphrased copies of an eval item, and ANY shared boilerplate
# line flags a clean doc (measured on the webtext fixture: exact 8-gram
# overlap flags 751 of ~1170 train docs — the per-host boilerplate
# lines collide). The containment form fixes both: score each
# (train, bench) pair by the FRACTION of the BENCHMARK doc's short
# n-grams present in the training doc. Paraphrase mutations kill few
# 3-grams, so true copies keep high containment; a shared boilerplate
# line is a tiny fraction of a bench doc's grams, so it cannot reach
# the threshold. Measured: fuzzy@500pm flags exactly the fixture's 4
# planted near-dup-of-benchmark pairs, nothing else.
#
# Physical shape at 10^12 train docs: the benchmark gram table
# (bench_id, gram) and the per-bench sizes are tiny and BROADCAST; the
# training mass explodes grams map-side and probes; the only shuffle is
# the groupBy(doc_id, bench_id) count — bounded by |bench| per doc.

FUZZY_N = 3  # word n-gram length (short = mutation-robust)
FUZZY_PM = 500  # containment threshold, per-mille of the bench doc


def contamination_fuzzy_of(
    train_docs: DataFrame,
    bench_docs: DataFrame,
    n: int = FUZZY_N,
    pm: int = FUZZY_PM,
) -> DataFrame:
    """doc_id, bench_id, n_inter, n_bench, cont_pm — every
    (training doc, benchmark doc) pair where >= pm/1000 of the
    benchmark doc's distinct word n-grams appear in the training doc.
    Integer-only: the threshold is the cross-multiplied comparison
    n_inter * 1000 >= pm * n_bench (no division in the filter)."""
    bench = bench_docs.withColumn("toks", F.expr(TOKS_S)).select(
        F.col("doc_id").alias("bench_id"),
        F.explode(F.expr(_ngrams_spark(n))).alias("gram"),
    )
    bsz = bench.groupBy("bench_id").agg(
        F.count("*").cast("long").alias("n_bench")
    )
    train = _grams_of(train_docs, n).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    inter = (
        train.join(F.broadcast(bench), on="gram", how="inner")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        inter.join(F.broadcast(bsz), on="bench_id", how="inner")
        .filter(F.expr(f"n_inter * 1000 >= {pm} * n_bench"))
        .select(
            "doc_id",
            "bench_id",
            "n_inter",
            "n_bench",
            F.expr("CAST(n_inter * 1000 DIV n_bench AS BIGINT)").alias(
                "cont_pm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# SEMANTIC decontamination (embedding-cosine form): the third rung of
# the ladder. Exact long-gram overlap (contamination_of) misses
# paraphrases and drowns in boilerplate; containment
# (contamination_fuzzy_of) survives mutation but still needs LEXICAL
# overlap — a rephrased eval item with few shared 3-grams slips
# through. The semantic form flags (train, bench) pairs whose hashed
# token embeddings (queries/textstats.py feature hashing) point the
# same way: cosine >= SEM_COS_PM/1000.
#
# Dimensionality matters and is measured (tests/test_webtext.py): at
# the ANN family's EMBED_DIMS=16 the webtext fixture's best impostor
# pair reaches cos 0.93 — above any threshold that keeps all four
# planted near-dup-of-benchmark pairs (lowest: 0.92). At SEM_DIMS=64
# the planted pairs sit at >= 0.945 and the best impostor at 0.798 —
# a clean margin on both sides of 0.9.
#
# Integer-exact threshold: embeddings are integer vectors, so
# cos >= pm/1000 is evaluated WITHOUT floats as
#   dot > 0  AND  10^6 * dot^2 >= pm^2 * |a|^2 * |b|^2
# in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the waterfill
# discipline (corpus_select.py): at design scale a 10^5-token doc has
# |a|^2 ~ 10^10, so the right side reaches ~10^26, past BIGINT but
# comfortably inside 38 digits. No float ever enters the filter, so
# cross-engine parity is exact by construction.
#
# Physical shape at 10^12 train docs: bench vectors are tiny
# (|bench| × SEM_DIMS BIGINTs) and BROADCAST; every train doc computes
# |bench| integer dot products map-side — the train mass never
# shuffles and only flagged pairs ever leave the scan. For benchmark
# suites large enough that |bench| per-doc dots bind, the bucketed
# escalation is the text_embed_centroid machinery (textstats.py) —
# same vectors, learned-centroid cells, probe-bounded.

SEM_DIMS = 64  # embedding buckets (precision measured above)
SEM_COS_PM = 900  # cosine threshold, per-mille


def semantic_contamination_of(
    train_docs: DataFrame,
    bench_docs: DataFrame,
    dims: int = SEM_DIMS,
    pm: int = SEM_COS_PM,
) -> DataFrame:
    """doc_id, bench_id, dot, na2, nb2, cos_sq_ppm — every
    (training doc, benchmark doc) pair whose hashed-token embeddings
    have cosine >= pm/1000, decided by the exact integer comparison
    10^6·dot² >= pm²·na2·nb2 (dot > 0). cos_sq_ppm = the squared
    cosine in parts-per-million, an exact integral division."""
    from pdf_extractor_spark.queries.textstats import text_embed_hash_of

    arr = "array(" + ", ".join(f"e_{d}" for d in range(dims)) + ")"
    n2 = "aggregate({v}, CAST(0 AS BIGINT), (a, x) -> a + x * x)"
    t = (
        text_embed_hash_of(train_docs, dims)
        .select("doc_id", F.expr(arr).alias("tv"))
        .withColumn("na2", F.expr(n2.format(v="tv")))
        .filter("na2 > 0")
    )
    b = (
        text_embed_hash_of(bench_docs, dims)
        .select(F.col("doc_id").alias("bench_id"), F.expr(arr).alias("bv"))
        .withColumn("nb2", F.expr(n2.format(v="bv")))
        .filter("nb2 > 0")
    )
    pairs = t.crossJoin(F.broadcast(b)).withColumn(
        "dot",
        F.expr(
            "aggregate(zip_with(tv, bv, (x, y) -> x * y), "
            "CAST(0 AS BIGINT), (a, x) -> a + x)"
        ),
    )
    lhs = "CAST(1000000 AS DECIMAL(38, 0)) * dot * dot"
    rhs = f"CAST({pm * pm} AS DECIMAL(38, 0)) * na2 * nb2"
    den = "CAST(na2 AS DECIMAL(38, 0)) * nb2"
    return (
        pairs.filter(F.expr(f"dot > 0 AND {lhs} >= {rhs}"))
        .select(
            "doc_id",
            "bench_id",
            "dot",
            "na2",
            "nb2",
            F.expr(f"CAST({lhs} DIV ({den}) AS BIGINT)").alias(
                "cos_sq_ppm"
            ),
        )
    )
