"""Similarity search over the `embeddings` table (array<float>, 64-dim).

- `embedding_topk`: brute-force cosine top-k — the exactness baseline.
  Query side is tiny and broadcast; the big side streams through a
  projection + per-query top-k (window row_number). At 100 TB the window
  partitions by query_id, so state per task is one heap per query.
- `embedding_ivf_topk`: the scale path — IVF-style bucketing: every vector
  is assigned to its nearest of C deterministic hyperplane-sign buckets
  (an LSH/IVF hybrid: sign bits of dot products with fixed pseudo-random
  hyperplanes derived from md5, so both engines derive identical
  centroids with no training step). Search probes only the query's
  bucket: the candidate join is an equi-join on bucket id — at scale this
  turns O(N·Q) into O(N·Q / C) with a shuffle keyed on bucket.

Float discipline for oracle parity: all arithmetic is promoted to DOUBLE
before any sum (float32 accumulation order would diverge between
engines), ranking uses round(cos, 9) with a deterministic id tie-break,
and reported cosines are round(·, 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_PLANES = 3    # 2^3 = 8 IVF buckets (single-probe path)

# Multiprobe path: its own, finer bucketing + query-directed probing
# (Lv et al., "Multi-Probe LSH"): probe the T buckets MOST LIKELY to hold
# the query's neighbors — rank all 2^P sign-flip masks by the summed
# hyperplane margins |dot_p| of the flipped planes (small margin = likely
# flip) and take the T cheapest. On this synthetic table (random
# near-orthogonal embeddings — LSH's worst case) T=14/16 is needed for
# recall >= 0.9; on clustered embeddings the same scheme reaches 0.94
# at T=4/16 (~30% scanned) — `embedding_multiprobe_clustered` over the
# committed clustered fixture demonstrates it, and T is the recall/cost
# knob either way (sweep: scripts/ann_probe_sweep.py).
MP_PLANES = 4
MP_PROBES = 14
MP_PROBES_CLUSTERED = 4

from pathlib import Path as _Path

CLUSTERED_PATH = (
    _Path(__file__).resolve().parent.parent.parent
    / "fixtures" / "golden" / "embeddings_clustered.parquet"
)

_VEC_S = "transform(embedding, x -> CAST(x AS DOUBLE))"
_VEC_D = "embedding::DOUBLE[]"
DIM = 64

# NOTE (measured, round 2): expanding these folds into explicit 64-term
# scalar sums was A/B'd and is SLOWER on Spark (expression-tree blowup
# defeats codegen; multiprobe 1.3 s → 4.0 s at sf0.1/local[8]) — the
# higher-order-function fold stays.
_NORM_S = "sqrt(aggregate(v, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"
_NORM_D = "sqrt(list_sum(list_transform(v, x -> x * x)))"
_DOT_S = (
    "aggregate(zip_with(qv, cv, (x, y) -> x * y), CAST(0 AS DOUBLE), "
    "(acc, x) -> acc + x)"
)
_DOT_D = "list_sum(list_transform(list_zip(qv, cv), z -> z[1] * z[2]))"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _prep(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def _clustered_emb(spark: SparkSession) -> DataFrame:
    return _prep(spark.read.parquet(str(CLUSTERED_PATH)))


def _prep(raw: DataFrame) -> DataFrame:
    return raw.withColumn("v", F.expr(_VEC_S)).withColumn(
        "nrm", F.expr(_NORM_S)
    )


def _topk(joined: DataFrame, k: int = TOP_K) -> DataFrame:
    """The float-discipline-critical ranking shared by every ANN query
    (including textstats.text_embed_topk): round(cos, 9) rank key,
    neighbor-id tie-break, round(cos, 5) output."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.expr("round(cos, 9)").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cos", 5).alias("cosine"),
        )
    )


# --------------------------------------------------------------------------
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _brute_topk(_emb(spark, sf_dir))


def embedding_topk_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force baseline over the clustered fixture — the recall
    denominator for `embedding_multiprobe_clustered`. `sf_dir` ignored."""
    return _brute_topk(_clustered_emb(spark))


def _brute_topk(emb: DataFrame) -> DataFrame:
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    joined = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"{_DOT_S} / (qn * cn)"))
    )
    return _topk(joined)


def _brute_topk_sql(source: str) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, v, {_NORM_D} AS nrm
  FROM (SELECT vec_id, {_VEC_D} AS v FROM {source})
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT_D.replace("qv", "q.v").replace("cv", "c.v")}
           / (q.nrm * c.nrm) AS cos
  FROM e q JOIN e c
    ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rank, round(cos, 5) AS cosine FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY round(cos, 9) DESC, neighbor_id
  ) AS BIGINT) AS rank
  FROM pairs
) WHERE rank <= {TOP_K}
"""


EMBEDDING_TOPK_SQL = _brute_topk_sql("embeddings")
EMBEDDING_TOPK_CLUSTERED_SQL = _brute_topk_sql(f"'{CLUSTERED_PATH}'")


# --------------------------------------------------------------------------
# IVF/LSH bucketing: hyperplane h_p has components derived from
# md5(p||'|'||dim): take the first hex digit, map to {-7.5..7.5} via
# (digit - 7.5). Deterministic, identical in both engines, no training.
# The md5 derivation runs ONCE here in Python and the coefficients are
# inlined as exact half-integer literals — the previous in-SQL form
# recomputed 64 constant md5s per plane PER ROW. The dot product is an
# explicit left-to-right 64-term sum, bit-identical across engines.
import hashlib as _hashlib


def _plane_coeffs(p: int) -> list[float]:
    return [
        int(_hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) - 7.5
        for d in range(1, 65)
    ]


def _plane_arr(p: int, side: str) -> str:
    coeffs = _plane_coeffs(p)
    if side == "spark":
        return (
            "array(" + ", ".join(f"CAST({c} AS DOUBLE)" for c in coeffs) + ")"
        )
    return "[" + ", ".join(f"CAST({c} AS DOUBLE)" for c in coeffs) + "]"


def _plane_expr(p: int, vec: str, side: str) -> str:
    # same fold structure as the dot product (HOFs beat flat 64-term
    # sums on Spark — see the _DOT_S note); the coefficient array is a
    # foldable literal, evaluated once, not 64 md5s per row
    if side == "spark":
        return (
            f"aggregate(zip_with({vec}, {_plane_arr(p, 'spark')}, "
            "(x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    return (
        f"list_sum(list_transform(list_zip({vec}, {_plane_arr(p, 'duck')}), "
        "z -> z[1] * z[2]))"
    )


def _bucket_exprs(side: str, vec: str, n_planes: int = N_PLANES) -> str:
    bits = []
    for p in range(n_planes):
        bit = 1 << (n_planes - 1 - p)
        bits.append(
            f"(CASE WHEN {_plane_expr(p, vec, side)} >= 0 "
            f"THEN {bit} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def _mask_score_expr(mask: int, side: str) -> str:
    """Probe cost of flipping the planes in ``mask``: sum of their |dot|
    margins. Small total margin = high flip likelihood = probe early."""
    terms = [
        f"abs(d_{p})"
        for p in range(MP_PLANES)
        if mask >> (MP_PLANES - 1 - p) & 1
    ]
    if not terms:
        return "CAST(0 AS DOUBLE)"
    return " + ".join(terms)


def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn(
        "bucket", F.expr(_bucket_exprs("spark", "v"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qb"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("bucket").alias("cb"),
    )
    joined = (
        c.join(F.broadcast(q), on=[F.col("qb") == F.col("cb")])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"{_DOT_S} / (qn * cn)"))
    )
    return _topk(joined)


# --------------------------------------------------------------------------
# Query-directed multiprobe IVF (MP_PLANES-bit bucketing): rank all 2^P
# sign-flip masks per query by summed |margin| of the flipped planes and
# probe the MP_PROBES cheapest buckets. The mask ranking runs over a
# 2^P-row exploded QUERY side (tiny — it stays broadcast); the candidate
# side is untouched and the join remains a bucket-key equi-join, so at
# scale the cost is O(N · Q · T / C) with no new shuffle shape.
# Cross-engine parity: the rank key is round(score, 9) with a mask
# tie-break — the same float discipline as the cosine ranking.
def embedding_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _multiprobe(_emb(spark, sf_dir), MP_PROBES)


def embedding_multiprobe_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same query-directed multiprobe over the committed CLUSTERED
    embedding fixture (scripts/build_clustered_embeddings.py): recall
    0.94 vs exact at 4/16 probes (~30% of the table scanned) — the
    regime real embedding spaces put the scale path in. `sf_dir` is
    ignored (fixture-backed, like extract_pages)."""
    return _multiprobe(_clustered_emb(spark), MP_PROBES_CLUSTERED)


def _multiprobe(emb: DataFrame, n_probes: int) -> DataFrame:
    from pyspark.sql import Window

    for p in range(MP_PLANES):
        emb = emb.withColumn(f"d_{p}", F.expr(_plane_expr(p, "v", "spark")))
    emb = emb.withColumn(
        "bucket", F.expr(_bucket_exprs("spark", "v", MP_PLANES))
    )
    mask_structs = ", ".join(
        f"struct(CAST({m} AS BIGINT) AS mask, "
        f"{_mask_score_expr(m, 'spark')} AS score)"
        for m in range(1 << MP_PLANES)
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.expr("round(ms.score, 9)").asc(), F.col("ms.mask").asc()
    )
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("bucket").alias("qb0"),
            *[F.col(f"d_{p}") for p in range(MP_PLANES)],
        )
        .withColumn("ms", F.explode(F.expr(f"array({mask_structs})")))
        .withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= n_probes)
        .withColumn("qb", F.expr("CAST(qb0 ^ ms.mask AS BIGINT)"))
        .select("query_id", "qv", "qn", "qb")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("bucket").alias("cb"),
    )
    joined = (
        c.join(F.broadcast(q), on=[F.col("qb") == F.col("cb")])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"{_DOT_S} / (qn * cn)"))
    )
    return _topk(joined)


# --------------------------------------------------------------------------
# Learned-centroid IVF — data-dependent bucketing (the round-3 default):
# instead of fixed random hyperplanes, the bucket set is C centroids
# LEARNED from the data by a deterministic k-means-style pass — seeds =
# the C lowest-vec_id sample vectors, one Lloyd refinement over a
# SAMPLE_N-vector sample — computed DRIVER-SIDE at plan-build time (one
# tiny TakeOrdered collect, like a stats pass) and inlined as literal
# arrays, so vector→bucket assignment stays a pure broadcast-free
# projection. On clustered data (every real embedding space) the learned
# cells align with the clusters, so a FIXED probe budget (CENTROID_PROBES
# of N_CENTROIDS cells ⇒ ≤25% of the table scanned when balanced) gets
# ≥0.9 recall with no per-dataset knob — test-enforced on the clustered
# fixture (tests/test_similarity_recall.py).
#
# Cross-engine parity without shipping literals to DuckDB: the oracle
# RE-DERIVES the identical centroids relationally (sample → seed assign
# → per-dim means). Every floating step is pinned: distances are
# LEFT-FOLD sums (Python accumulation loop == Spark `aggregate` fold ==
# DuckDB `list_reduce`, and 0.0+x == x exactly), assignment ranks on
# round(dist, 9) with a centroid-id tie-break, and centroid coordinates
# are rounded HALF-UP to 6 decimals (Decimal in Python == round() in
# both engines), so both engines see bit-identical centroids.
SAMPLE_N = 256
N_CENTROIDS = 16
LLOYD_ITERS = 2  # round-4: a second refinement pass (round-3 used 1)
# measurably improves cell balance — the round-3 note's "biggest cell is
# 19% of the clustered fixture" — and lifts recall at fixed probe
# budget; the DuckDB oracle re-derives every iteration in lockstep
CENTROID_PROBES = 2  # measured on the clustered fixture: T=1 → recall
# 0.88 @ 8.5% scanned, T=2 → recall 1.00 @ 19%, T=3 → 1.00 @ 28%; the
# fixed default T=2 clears the recall ≥ 0.9 / scan ≤ 25% contract with
# margin on both sides (tests/test_similarity_recall.py enforces it)

from decimal import ROUND_HALF_UP, Decimal as _Dec


def _roundn(x: float, n: int) -> float:
    # Quantize the SHORTEST decimal repr (repr(x)), not the exact binary
    # expansion (_Dec(x)): Spark's round() on doubles goes through
    # BigDecimal.valueOf == Double.toString == shortest round-trip repr,
    # so this form is definitionally identical to Spark HALF_UP on every
    # double. (The exact-binary form disagrees by 1 ulp on values whose
    # shortest repr lands exactly on a .5 decimal boundary — caught by
    # tests/test_similarity_recall.py::test_rounding_parity_fuzz.)
    # DuckDB's scaled-double round can still flip ties on such boundary
    # values; pipeline values (sums of squares of arbitrary doubles)
    # never land there — the fuzz test pins both facts.
    q = _Dec(1).scaleb(-n)
    return float(_Dec(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _sqdist_py(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _learn_centroids(
    emb: DataFrame,
    sample_where: str | None = f"vec_id >= {N_QUERIES}",
    vec_col: str = "v",
) -> list[list[float]]:
    """Deterministic one-iteration k-means over the sample; returns
    min(N_CENTROIDS, |sample|) lists of floats (dim = the data's, means
    rounded half-up to 6 dp; an empty cell keeps its raw seed). ``emb``
    must be
    _prep()-ed. ``sample_where`` filters the sample universe (None =
    whole table; the default excludes the fixture tables' query ids).
    ``vec_col`` picks the clustering space (``u`` = the L2-normalized
    copy, for corpora where raw magnitude would dominate)."""
    base = emb.filter(F.expr(sample_where)) if sample_where else emb
    rows = (
        base.orderBy("vec_id")
        .limit(SAMPLE_N)
        .select("vec_id", F.col(vec_col).alias("v"))
        .collect()
    )
    sample = [list(r["v"]) for r in rows]  # already vec_id-ascending
    # fewer sample vectors than N_CENTROIDS just means fewer cells —
    # exactly what the relational oracle's `seeds ... LIMIT 16` yields
    # on a tiny input (the SQL side never had the 16-cell assumption)
    n_c = min(N_CENTROIDS, len(sample))
    cents: list[list[float]] = sample[:n_c]  # seeds
    for _ in range(LLOYD_ITERS):
        prev = cents
        members: list[list[list[float]]] = [[] for _ in range(n_c)]
        for v in sample:
            best = min(
                range(n_c),
                key=lambda c: (_roundn(_sqdist_py(v, prev[c]), 9), c),
            )
            members[best].append(v)  # appended in vec_id order
        cents = []
        for c in range(n_c):
            if not members[c]:
                cents.append(prev[c])  # empty cell keeps its previous seat
                continue
            cent = []
            for d in range(len(prev[c])):
                acc = 0.0
                for v in members[c]:  # left fold in vec_id order
                    acc += v[d]
                cent.append(_roundn(acc / len(members[c]), 6))
            cents.append(cent)
    return cents


def _cent_lit(cent: list[float]) -> str:
    # repr() round-trips doubles, both engines parse the decimal string
    # to the same nearest double; the bare D-suffix literal keeps the
    # expression tree small (a CAST node per element doubled Catalyst's
    # node count and the 16×64-literal plan must stay compact)
    return "array(" + ", ".join(f"{x!r}D" for x in cent) + ")"


def _cdist_expr(c: int, cents: list[list[float]], vec: str = "v") -> str:
    return (
        f"aggregate(zip_with({vec}, {_cent_lit(cents[c])}, "
        "(x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    )


def _assign_buckets(
    emb: DataFrame,
    sample_where: str | None,
    normalize: bool = False,
) -> DataFrame:
    """Learn N_CENTROIDS centroids (deterministic k-means, see
    _learn_centroids) and add (dists, rd, bucket) columns to a
    _prep()-ed (vec_id, v, nrm) DataFrame. ``normalize=True`` clusters
    and assigns on the L2-normalized copy ``u`` (spherical k-means).

    ONE array column holds all 16 centroid distances, so every
    downstream use references `dists`/`rd` instead of re-inlining the
    16×64-literal folds (a least()+CASE argmin expanded each fold
    ~270× after projection collapse — enough to OOM the driver during
    optimization). argmin = array_position of the min, which returns
    the FIRST match — the lowest-centroid-id tie-break for free."""
    vec_col = "v"
    if normalize:
        vec_col = "u"
        emb = emb.withColumn("u", F.expr("transform(v, x -> x / nrm)"))
    cents = _learn_centroids(emb, sample_where, vec_col)
    dists_expr = "array(" + ", ".join(
        _cdist_expr(c, cents, vec_col) for c in range(len(cents))
    ) + ")"
    return (
        emb.withColumn("dists", F.expr(dists_expr))
        .withColumn("rd", F.expr("transform(dists, x -> round(x, 9))"))
        .withColumn(
            "bucket",
            F.expr(
                "CAST(array_position(rd, array_min(rd)) - 1 AS BIGINT)"
            ),
        )
    )


def _centroid_search(
    emb: DataFrame,
    n_probes: int,
    k: int = TOP_K,
    query_lowest_n: int | None = None,
    sample_where: str | None = f"vec_id >= {N_QUERIES}",
    normalize: bool = False,
) -> DataFrame:
    """Learned-centroid IVF over a _prep()-ed (vec_id, v, nrm) DataFrame.

    Defaults reproduce the fixture-table contract (queries = vec_id <
    N_QUERIES, sample excludes them). ``query_lowest_n`` instead takes
    the N lowest vec_ids as queries (TakeOrderedAndProject, the
    engine-produced-embedding contract where ids are arbitrary doc
    keys), with the sample drawn from the WHOLE table.

    ``normalize=True`` clusters and assigns on the L2-NORMALIZED copy
    (spherical k-means: ||u_a - u_b||² = 2 - 2·cos), for corpora whose
    raw vectors are all-positive counts — there, unnormalized k-means
    buckets by document LENGTH, nearly orthogonal to the cosine
    objective the search ranks by. Reported cosines still come from the
    raw vectors (identical values either way)."""
    from pyspark.sql import Window

    emb = _assign_buckets(emb, sample_where, normalize)
    pw = Window.partitionBy("query_id").orderBy(
        F.expr("round(pc.dist, 9)").asc(), F.col("pc.cid").asc()
    )
    q_base = (
        emb.orderBy("vec_id").limit(query_lowest_n)
        if query_lowest_n is not None
        else emb.filter(F.col("vec_id") < N_QUERIES)
    )
    q = (
        q_base.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            "dists",
        )
        .withColumn(
            "pc",
            F.explode(
                F.expr(
                    # size(dists), not the N_CENTROIDS literal: a tiny
                    # input learns fewer cells (see _learn_centroids)
                    "transform(sequence(0, size(dists) - 1), "
                    "c -> struct(CAST(c AS BIGINT) AS cid, "
                    "element_at(dists, c + 1) AS dist))"
                )
            ),
        )
        .withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= n_probes)
        .select("query_id", "qv", "qn", F.col("pc.cid").alias("qb"))
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("bucket").alias("cb"),
    )
    joined = (
        c.join(F.broadcast(q), on=[F.col("qb") == F.col("cb")])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"{_DOT_S} / (qn * cn)"))
    )
    return _topk(joined, k)


def embedding_centroid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-centroid IVF top-k over the driver embeddings table."""
    return _centroid_search(_emb(spark, sf_dir), CENTROID_PROBES)


def embedding_centroid_clustered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Learned-centroid IVF over the clustered fixture — the default
    data-dependent bucketing at its intended operating point: recall
    ≥ 0.9 scanning ≤ 25% with the FIXED probe budget (no per-dataset
    knob). `sf_dir` ignored (fixture-backed)."""
    return _centroid_search(_clustered_emb(spark), CENTROID_PROBES)


# DuckDB re-derivation of the same centroids + search.
_SQD_D = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "z -> (z[1] - z[2]) * (z[1] - z[2])), (x, y) -> x + y)"
)


def _centroid_sql(source: str, n_probes: int) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, v, {_NORM_D} AS nrm
  FROM (SELECT vec_id, {_VEC_D} AS v FROM {source})
),
{_centroid_sql_body(
    dim=DIM,
    n_probes=n_probes,
    k=TOP_K,
    qids_sql=f"SELECT vec_id FROM e WHERE vec_id < {N_QUERIES}",
    sample_where=f"WHERE vec_id >= {N_QUERIES}",
)}"""


def _centroid_sql_body(
    dim: int,
    n_probes: int,
    k: int,
    qids_sql: str,
    sample_where: str,
    vec: str = "v",
) -> str:
    """The centroid re-derivation + search, generic over a CTE
    ``e(vec_id, v, nrm)`` the caller has already defined (the fixture
    tables define it from parquet; textstats defines it from the
    engine's hashed embeddings). ``vec`` picks the clustering space —
    pass ``u`` when the caller's ``e`` carries an L2-normalized copy
    (the Spark side's ``normalize=True``). Returns the WITH-chain
    remainder + final SELECT — same float discipline as the Spark
    side."""
    return f"""{_centroid_assign_sql(dim, sample_where, vec)},
qids AS ({qids_sql}),
qp AS (
  SELECT vec_id, cid AS qb FROM (
    SELECT eq.vec_id, c.cid, row_number() OVER (
      PARTITION BY eq.vec_id
      ORDER BY round({_SQD_D.format(a=f"eq.{vec}", b="c.v")}, 9), c.cid
    ) AS rn
    FROM (SELECT e.* FROM e JOIN qids USING (vec_id)) eq
    CROSS JOIN cent c
  ) WHERE rn <= {n_probes}
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT_D.replace("qv", "q.v").replace("cv", "c.v")}
           / (q.nrm * c.nrm) AS cos
  FROM (SELECT e.*, qp.qb FROM e JOIN qp USING (vec_id)) q
  JOIN (SELECT e.*, assign.bucket FROM e JOIN assign USING (vec_id)) c
    ON q.qb = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rank, round(cos, 5) AS cosine FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY round(cos, 9) DESC, neighbor_id
  ) AS BIGINT) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


def _centroid_assign_sql(
    dim: int, sample_where: str, vec: str = "v", suffix: str = ""
) -> str:
    """The sample→seeds→Lloyd→cent→assign WITH-chain fragment, generic
    over a caller-defined CTE ``e(vec_id, v, nrm[, u])`` — the relational
    re-derivation of _learn_centroids + _assign_buckets. Ends after the
    ``assign`` CTE with NO trailing comma (callers append their own
    continuation). Shared by the centroid search oracle and the
    semantic-dedup oracle. ``suffix`` renames every internal CTE
    (sample{suffix}, cent{suffix}, ...) so several chains can coexist in
    one statement (the PQ oracle instantiates one per subspace); the
    default "" leaves the existing oracles byte-identical."""
    # one assign→means→coalesce block per Lloyd iteration, chained:
    # cent{i} refines cent{i-1} (seeds for i=1), exactly mirroring the
    # Python loop in _learn_centroids (empty cell keeps its previous
    # seat via the LEFT JOIN coalesce)
    sfx = suffix
    lloyd = ""
    prev = f"seeds{sfx}"
    for i in range(1, LLOYD_ITERS + 1):
        lloyd += f"""a{i}{sfx} AS (
  SELECT vec_id, v, cid FROM (
    SELECT s.vec_id, s.v, c.cid, row_number() OVER (
      PARTITION BY s.vec_id
      ORDER BY round({_SQD_D.format(a="s.v", b="c.v")}, 9), c.cid
    ) AS rn
    FROM sample{sfx} s CROSS JOIN {prev} c
  ) WHERE rn = 1
),
m{i}{sfx} AS (
  SELECT cid, d,
         round(list_reduce(list(val ORDER BY vec_id), (x, y) -> x + y)
               / COUNT(*), 6) AS cv
  FROM (
    SELECT a{i}{sfx}.cid, a{i}{sfx}.vec_id, t.d, a{i}{sfx}.v[t.d + 1] AS val
    FROM a{i}{sfx} CROSS JOIN (SELECT unnest(range({dim})) AS d) t
  )
  GROUP BY cid, d
),
cent{i}{sfx} AS (
  SELECT s.cid, list(coalesce(m.cv, s.v[t.d + 1]) ORDER BY t.d) AS v
  FROM {prev} s
  CROSS JOIN (SELECT unnest(range({dim})) AS d) t
  LEFT JOIN m{i}{sfx} m ON m.cid = s.cid AND m.d = t.d
  GROUP BY s.cid
),
"""
        prev = f"cent{i}{sfx}"
    return f"""sample{sfx} AS (
  SELECT vec_id, {vec} AS v FROM e {sample_where}
  ORDER BY vec_id LIMIT {SAMPLE_N}
),
seeds{sfx} AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v
  FROM (SELECT vec_id, v FROM sample{sfx} ORDER BY vec_id LIMIT {N_CENTROIDS})
),
{lloyd}cent{sfx} AS (SELECT cid, v FROM {prev}),
assign{sfx} AS (
  SELECT vec_id, cid AS bucket FROM (
    SELECT e.vec_id, c.cid, row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round({_SQD_D.format(a=f"e.{vec}", b="c.v")}, 9), c.cid
    ) AS rn
    FROM e CROSS JOIN cent{sfx} c
  ) WHERE rn = 1
)"""


EMBEDDING_CENTROID_TOPK_SQL = _centroid_sql("embeddings", CENTROID_PROBES)
EMBEDDING_CENTROID_CLUSTERED_SQL = _centroid_sql(
    f"'{CLUSTERED_PATH}'", CENTROID_PROBES
)


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public paper): semantic
# near-duplicate PRUNING scoped to learned-centroid cells. Cluster the
# corpus with the same deterministic k-means as the IVF search, then
# compare pairs ONLY within a cell and keep one representative per
# semantic-duplicate group (lowest id — deterministic, matching the
# paper's "keep one random point per group" up to the choice rule).
#
# Scale shape: the all-pairs comparison is confined to cells — O(N²/C)
# work with C grown ~N/cell_target at deployment (standard IVF sizing),
# i.e. LINEAR total work, never a global O(N²); the cell self-join is a
# plain bucket equi-join (shuffle keyed on bucket; at production C the
# key space is wide, at the 16-cell test scale AQE coalesces it). Cross-
# cell near-dups are invisible by design — that approximation IS the
# algorithm (the paper reports the within-cluster restriction loses
# almost nothing on web corpora because semantic dups co-cluster; on
# the clustered fixture the loss is exactly ZERO — all 5,697 global
# cos >= 0.9 pairs land within one cell, test-pinned in
# tests/test_semantic_dedup.py::test_within_cell_coverage_is_total_...).
SEMANTIC_TAU = 0.9  # measured on the clustered fixture: 5,697 of the
# ~2M pairs sit at raw cosine >= 0.9 (max 0.9444, p99.9 0.9089) — the
# threshold catches the genuinely-clustered mass with non-trivial but
# bounded drop counts; 0.95 would drop nothing on this fixture.


def semantic_dedup_of(
    emb: DataFrame,
    tau: float,
    normalize: bool = False,
    sample_where: str | None = None,
) -> DataFrame:
    """SemDeDup over a _prep()-ed (vec_id, v, nrm) DataFrame: returns
    (vec_id, bucket, keep) for EVERY vector — keep=0 iff a same-cell
    vector with a SMALLER id has raw cosine ≥ tau (the greedy
    keep-lowest-id representative rule; precision is exact by
    construction since every drop is justified by a verified cosine).

    ``normalize=True`` clusters on the L2-normalized copy (spherical
    k-means — use for all-positive count vectors, see _centroid_search);
    the cosine test always uses the RAW vectors. The assigned table is
    materialized once (localCheckpoint — at deployment scale this is a
    staged parquet write) so the self-join's two sides don't re-run the
    centroid folds."""
    assigned = (
        _assign_buckets(emb, sample_where, normalize)
        .select("vec_id", "v", "nrm", "bucket")
        .localCheckpoint(eager=True)
    )
    a = assigned.select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    b = assigned.select(
        "vec_id",
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        "bucket",
    )
    dropped = (
        b.join(a, on="bucket")
        .filter(F.col("a_id") < F.col("vec_id"))
        .withColumn("cos", F.expr(f"{_DOT_S} / (qn * cn)"))
        .filter(F.expr(f"round(cos, 9) >= {tau}"))
        .select("vec_id")
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return assigned.join(dropped, on="vec_id", how="left").select(
        "vec_id",
        "bucket",
        F.expr(
            "CAST(CASE WHEN is_dup IS NULL THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("keep"),
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the clustered embedding fixture (the corpus with
    genuine semantic structure; the sf-dir embeddings are random — no
    pair reaches cosine 0.52). `sf_dir` ignored (fixture-backed, like
    the other `_clustered` entries)."""
    return semantic_dedup_of(_clustered_emb(spark), SEMANTIC_TAU)


def _semantic_sql_body(
    dim: int, tau: float, vec: str = "v", id_col: str = "vec_id"
) -> str:
    """WITH-chain remainder + final SELECT for SemDeDup, generic over a
    caller-defined CTE ``e(vec_id, v, nrm[, u])`` — mirrors
    semantic_dedup_of exactly (same assign chain as the centroid search
    oracle, raw-cosine pair test, keep-lowest-id)."""
    dot = _DOT_D.replace("qv", "a.v").replace("cv", "b.v")
    return f"""{_centroid_assign_sql(dim, "", vec)},
ab AS (
  SELECT e.vec_id, e.v, e.nrm, asg.bucket
  FROM e JOIN assign asg ON asg.vec_id = e.vec_id
),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM ab a JOIN ab b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round({dot} / (a.nrm * b.nrm), 9) >= {tau}
)
SELECT ab.vec_id AS {id_col}, ab.bucket,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM ab LEFT JOIN drops d ON d.vec_id = ab.vec_id
"""


DEDUP_SEMANTIC_SQL = f"""
WITH e AS (
  SELECT vec_id, v, {_NORM_D} AS nrm
  FROM (SELECT vec_id, {_VEC_D} AS v FROM '{CLUSTERED_PATH}')
),
{_semantic_sql_body(DIM, SEMANTIC_TAU)}"""


_BUCKET_D = _bucket_exprs("duck", "v")
_MP_BUCKET_D = _bucket_exprs("duck", "v", MP_PLANES)
_MP_DOTS_D = ", ".join(
    f"{_plane_expr(p, 'v', 'duck')} AS d_{p}" for p in range(MP_PLANES)
)
_MP_MASKS_D = ", ".join(
    f"{{'mask': CAST({m} AS BIGINT), 'score': {_mask_score_expr(m, 'duck')}}}"
    for m in range(1 << MP_PLANES)
)
def _multiprobe_sql(source: str, n_probes: int) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, v, {_NORM_D} AS nrm, {_MP_BUCKET_D} AS bucket, {_MP_DOTS_D}
  FROM (SELECT vec_id, {_VEC_D} AS v FROM {source})
),
qm AS (
  SELECT vec_id, v, nrm, bucket, unnest([{_MP_MASKS_D}]) AS ms
  FROM e WHERE vec_id < {N_QUERIES}
),
q AS (
  SELECT vec_id, v, nrm, CAST(xor(bucket, ms.mask) AS BIGINT) AS qb
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY round(ms.score, 9) ASC, ms.mask ASC
    ) AS pr
    FROM qm
  ) WHERE pr <= {n_probes}
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT_D.replace("qv", "q.v").replace("cv", "c.v")}
           / (q.nrm * c.nrm) AS cos
  FROM q JOIN e c ON q.qb = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rank, round(cos, 5) AS cosine FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY round(cos, 9) DESC, neighbor_id
  ) AS BIGINT) AS rank
  FROM pairs
) WHERE rank <= {TOP_K}
"""


EMBEDDING_IVF_MULTIPROBE_SQL = _multiprobe_sql("embeddings", MP_PROBES)
EMBEDDING_MULTIPROBE_CLUSTERED_SQL = _multiprobe_sql(
    f"'{CLUSTERED_PATH}'", MP_PROBES_CLUSTERED
)
EMBEDDING_IVF_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, v, {_NORM_D} AS nrm, {_BUCKET_D} AS bucket
  FROM (SELECT vec_id, {_VEC_D} AS v FROM embeddings)
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT_D.replace("qv", "q.v").replace("cv", "c.v")}
           / (q.nrm * c.nrm) AS cos
  FROM e q JOIN e c
    ON q.vec_id < {N_QUERIES} AND q.bucket = c.bucket
   AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rank, round(cos, 5) AS cosine FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY round(cos, 9) DESC, neighbor_id
  ) AS BIGINT) AS rank
  FROM pairs
) WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# int8 vector quantization report — the storage/transport compression
# step a production vector pipeline runs before indexing (4x smaller
# than float32; scalar per-vector quantization, the faiss SQ8 shape):
# q_i = round(x_i * 127 / max|x|), reconstruction x̂_i = q_i * max|x|/127.
# Pure projection (zero shuffles, trivially linear at 10^12 vectors).
#
# Oracle discipline: the quantized codes are INTEGERS, so the gate
# compares exact integer checksums (signed sum + L1 norm of q) rather
# than float arrays; max|x| comes from an ordered fold (greatest is
# order-free anyway) and the reconstruction MSE follows the module's
# round(·, 9) float convention.
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.expr(_VEC_S)
    )
    return (
        emb.withColumn(
            "ma",
            F.expr(
                "aggregate(v, CAST(0 AS DOUBLE), "
                "(a, x) -> greatest(a, abs(x)))"
            ),
        )
        .withColumn(
            "q",
            F.expr(
                "CASE WHEN ma = 0 THEN transform(v, x -> 0) "
                "ELSE transform(v, x -> "
                "CAST(round(x * 127.0 / ma) AS INT)) END"
            ),
        )
        .select(
            "vec_id",
            F.expr("CAST(size(q) AS BIGINT)").alias("n_dims"),
            F.expr(
                "CAST(aggregate(q, 0L, (a, x) -> a + x) AS BIGINT)"
            ).alias("q_sum"),
            F.expr(
                "CAST(aggregate(q, 0L, (a, x) -> a + abs(x)) AS BIGINT)"
            ).alias("q_l1"),
            F.expr("round(ma, 5)").alias("max_abs"),
            F.expr(
                "CASE WHEN ma = 0 THEN CAST(0.0 AS DOUBLE) ELSE round("
                "aggregate(zip_with(v, q, (x, c) -> "
                "(x - c * ma / 127.0) * (x - c * ma / 127.0)), "
                "CAST(0 AS DOUBLE), (a, x) -> a + x) / size(q), 9) END"
            ).alias("mse"),
        )
    )


EMBEDDING_QUANTIZE_SQL = f"""
WITH base AS (
  SELECT vec_id, {_VEC_D} AS v FROM embeddings
),
ma AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS ma
  FROM base
),
q AS (
  SELECT vec_id, v, ma,
         CASE WHEN ma = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(round(x * 127.0 / ma)
                   AS INT)) END AS q
  FROM ma
)
SELECT vec_id,
       CAST(len(q) AS BIGINT) AS n_dims,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
       round(ma, 5) AS max_abs,
       CASE WHEN ma = 0 THEN CAST(0.0 AS DOUBLE) ELSE round(
         list_sum(list_transform(list_zip(v, q), z ->
           (z[1] - z[2] * ma / 127.0) * (z[1] - z[2] * ma / 127.0)))
         / len(q), 9) END AS mse
FROM q
"""


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search" — public paper; reference parity: the
# vector-store compression a 10^12-doc embedding table needs — 64
# doubles -> PQ_M single-byte codes per vector). Each vector splits
# into PQ_M contiguous subvectors; every subspace learns an INDEPENDENT
# N_CENTROIDS codebook with the SAME deterministic k-means as the IVF
# path (_learn_centroids — Python may use libm freely; the engine
# expressions consume only the resulting 6-dp literals). A vector's
# code is its per-subspace argmin centroid id (round(·,9) + lowest-id
# tie-break, the established float discipline). Search is ADC
# (asymmetric distance computation): the query stays EXACT, the corpus
# vector is replaced by its RECONSTRUCTION — the concatenation of its
# assigned sub-centroids — so distance is one 64-dim sqdist fold, and
# at scale the scanned bytes drop 64x while queries stay full-precision.

PQ_M = 16           # subspaces -> 16 codes = 64-bit vector ids
PQ_SUB = DIM // PQ_M  # dims per subspace
PQ_SHORTLIST = 50   # ADC shortlist size; only these get exact re-rank


_SQD_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _pq_codebooks(
    emb: DataFrame, sample_where: str | None = f"vec_id >= {N_QUERIES}"
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Adds v0..v{PQ_M-1} subvector columns and learns one codebook per
    subspace over the sample (queries excluded, matching the IVF
    discipline)."""
    e2 = emb
    for m in range(PQ_M):
        e2 = e2.withColumn(
            f"v{m}", F.expr(f"slice(v, {PQ_SUB * m + 1}, {PQ_SUB})")
        )
    books = [
        _learn_centroids(e2, sample_where, vec_col=f"v{m}")
        for m in range(PQ_M)
    ]
    return e2, books


def _pq_lit(book: list[list[float]]) -> str:
    return "array(" + ", ".join(_cent_lit(c) for c in book) + ")"


def _pq_encode(
    emb: DataFrame,
    sample_where: str | None = f"vec_id >= {N_QUERIES}",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, v, [keep...], code0..code{PQ_M-1}, recon) — the PQ
    codes and the reconstructed vector (assigned sub-centroids
    concatenated). Codes are argmin over ONE materialized distance
    array per subspace (the _assign_buckets pattern); everything is a
    pure projection. ``keep`` carries extra caller columns through
    (IVF-PQ keeps the coarse bucket)."""
    e2, books = _pq_codebooks(emb, sample_where)
    for m in range(PQ_M):
        dists = "array(" + ", ".join(
            _cdist_expr(c, books[m], f"v{m}")
            for c in range(len(books[m]))
        ) + ")"
        e2 = e2.withColumn(f"rd{m}", F.expr(
            f"transform({dists}, x -> round(x, 9))"
        )).withColumn(
            f"code{m}",
            F.expr(
                f"CAST(array_position(rd{m}, array_min(rd{m})) - 1 "
                "AS BIGINT)"
            ),
        ).drop(f"rd{m}")
    recon = "concat(" + ", ".join(
        f"element_at({_pq_lit(books[m])}, CAST(code{m} + 1 AS INT))"
        for m in range(PQ_M)
    ) + ")"
    return e2.withColumn("recon", F.expr(recon)).select(
        "vec_id", "v", *keep,
        *[f"code{m}" for m in range(PQ_M)], "recon"
    )


def _pq_search(emb: DataFrame, k: int = TOP_K) -> DataFrame:
    """The production PQ pipeline: ADC over the compressed corpus
    selects a PQ_SHORTLIST-candidate shortlist per query (round(.,9) +
    id tie-break), then ONLY the shortlist is re-ranked with exact
    full-precision distances. At 10^12 vectors the exact pass touches
    PQ_SHORTLIST rows per query instead of the corpus — the compressed
    scan does the winnowing."""
    enc = _pq_encode(emb)
    q = enc.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = enc.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("recon").alias("cv"),
        F.col("v").alias("xv"),
    )
    joined = c.join(
        F.broadcast(q), F.expr("query_id <> neighbor_id")
    ).withColumn("adc", F.expr(_SQD_S.format(a="qv", b="cv")))
    from pyspark.sql import Window

    ws = Window.partitionBy("query_id").orderBy(
        F.expr("round(adc, 9)").asc(), F.col("neighbor_id").asc()
    )
    short = joined.withColumn(
        "srank", F.row_number().over(ws)
    ).filter(F.col("srank") <= PQ_SHORTLIST)
    rer = short.withColumn("dist", F.expr(_SQD_S.format(a="qv", b="xv")))
    wr = Window.partitionBy("query_id").orderBy(
        F.expr("round(dist, 9)").asc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.expr("round(dist, 5)").alias("dist"),
        )
    )


def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC shortlist + exact re-rank top-k over the driver
    embeddings table."""
    return _pq_search(_emb(spark, sf_dir))


def _pq_sql(source: str, k: int = TOP_K) -> str:
    chains = ",\n".join(
        _centroid_assign_sql(
            PQ_SUB,
            f"WHERE vec_id >= {N_QUERIES}",
            vec=f"v[{PQ_SUB * m + 1}:{PQ_SUB * (m + 1)}]",
            suffix=f"_s{m}",
        )
        for m in range(PQ_M)
    )
    code_joins = " ".join(
        f"JOIN assign_s{m} a{m} USING (vec_id) "
        f"JOIN cent_s{m} c{m} ON a{m}.bucket = c{m}.cid"
        for m in range(PQ_M)
    )
    rv = " || ".join(f"c{m}.v" for m in range(PQ_M))
    adc = _SQD_D.format(a="q.v", b="c.rv")
    sqd = _SQD_D.format(a="q.v", b="c.v")
    return f"""
WITH e AS (
  SELECT vec_id, v, {_NORM_D} AS nrm
  FROM (SELECT vec_id, {_VEC_D} AS v FROM {source})
),
{chains},
recon AS (
  SELECT e.vec_id, {rv} AS rv
  FROM e {code_joins}
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {adc} AS adc
  FROM (SELECT * FROM e WHERE vec_id < {N_QUERIES}) q
  JOIN recon c ON q.vec_id <> c.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY round(adc, 9), neighbor_id
    ) AS srank FROM pairs
  ) WHERE srank <= {PQ_SHORTLIST}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         {sqd} AS dist
  FROM short s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, rank, round(dist, 5) AS dist FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY round(dist, 9), neighbor_id
  ) AS BIGINT) AS rank FROM rer
) WHERE rank <= {k}
"""


EMBEDDING_PQ_TOPK_SQL = _pq_sql("embeddings")


# ---------------------------------------------------------------------------
# IVF-PQ — the full trillion-scale composite (the FAISS IVFPQ recipe,
# Jégou et al. 2011 §V): learned-centroid COARSE buckets prune the
# corpus to the probed cells, PQ/ADC winnows the probed cells to a
# PQ_SHORTLIST shortlist, exact full-precision distance re-ranks only
# the shortlist. At 10^12 vectors the cost cascade is: coarse probe
# touches probes/cells of the corpus, ADC reads 64-bit codes (not
# 512-byte vectors) for that slice, and the exact pass touches
# PQ_SHORTLIST rows per query. Codebooks here quantize RAW subvectors
# (shared across cells); FAISS's default quantizes cell RESIDUALS — a
# recall refinement orthogonal to the plan shape, documented as the
# upgrade path.


def _ivfpq_search(
    emb: DataFrame, n_probes: int = CENTROID_PROBES, k: int = TOP_K
) -> DataFrame:
    from pyspark.sql import Window

    emb = _assign_buckets(emb, f"vec_id >= {N_QUERIES}")
    enc = _pq_encode(emb, keep=("bucket",))
    # queries probe their n_probes nearest cells (the IVF discipline)
    pw = Window.partitionBy("query_id").orderBy(
        F.expr("round(pc.dist, 9)").asc(), F.col("pc.cid").asc()
    )
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            "dists",
        )
        .withColumn(
            "pc",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(dists) - 1), "
                    "c -> struct(CAST(c AS BIGINT) AS cid, "
                    "element_at(dists, c + 1) AS dist))"
                )
            ),
        )
        .withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= n_probes)
        .select("query_id", "qv", F.col("pc.cid").alias("qb"))
    )
    c = enc.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket").alias("cb"),
        F.col("recon").alias("cv"),
        F.col("v").alias("xv"),
    )
    joined = (
        c.join(F.broadcast(q), on=[F.col("qb") == F.col("cb")])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", F.expr(_SQD_S.format(a="qv", b="cv")))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.expr("round(adc, 9)").asc(), F.col("neighbor_id").asc()
    )
    short = joined.withColumn(
        "srank", F.row_number().over(ws)
    ).filter(F.col("srank") <= PQ_SHORTLIST)
    rer = short.withColumn("dist", F.expr(_SQD_S.format(a="qv", b="xv")))
    wr = Window.partitionBy("query_id").orderBy(
        F.expr("round(dist, 9)").asc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.expr("round(dist, 5)").alias("dist"),
        )
    )


def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite top-k over the driver embeddings table."""
    return _ivfpq_search(_emb(spark, sf_dir))


def _ivfpq_sql(
    source: str, n_probes: int = CENTROID_PROBES, k: int = TOP_K
) -> str:
    coarse = _centroid_assign_sql(DIM, f"WHERE vec_id >= {N_QUERIES}")
    pq_chains = ",\n".join(
        _centroid_assign_sql(
            PQ_SUB,
            f"WHERE vec_id >= {N_QUERIES}",
            vec=f"v[{PQ_SUB * m + 1}:{PQ_SUB * (m + 1)}]",
            suffix=f"_s{m}",
        )
        for m in range(PQ_M)
    )
    code_joins = " ".join(
        f"JOIN assign_s{m} a{m} USING (vec_id) "
        f"JOIN cent_s{m} c{m} ON a{m}.bucket = c{m}.cid"
        for m in range(PQ_M)
    )
    rv = " || ".join(f"c{m}.v" for m in range(PQ_M))
    adc = _SQD_D.format(a="q.v", b="c.rv")
    sqd = _SQD_D.format(a="q.v", b="c.v")
    qsqd = _SQD_D.format(a="eq.v", b="c.v")
    return f"""
WITH e AS (
  SELECT vec_id, v, {_NORM_D} AS nrm
  FROM (SELECT vec_id, {_VEC_D} AS v FROM {source})
),
{coarse},
{pq_chains},
qids AS (SELECT vec_id FROM e WHERE vec_id < {N_QUERIES}),
qp AS (
  SELECT vec_id, cid AS qb FROM (
    SELECT eq.vec_id, c.cid, row_number() OVER (
      PARTITION BY eq.vec_id
      ORDER BY round({qsqd}, 9), c.cid
    ) AS rn
    FROM (SELECT e.* FROM e JOIN qids USING (vec_id)) eq
    CROSS JOIN cent c
  ) WHERE rn <= {n_probes}
),
recon AS (
  SELECT e.vec_id, {rv} AS rv
  FROM e {code_joins}
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {adc} AS adc
  FROM (SELECT e.vec_id, e.v, qp.qb FROM e JOIN qp USING (vec_id)) q
  JOIN (SELECT r.vec_id, r.rv, a.bucket
        FROM recon r JOIN assign a USING (vec_id)) c
    ON q.qb = c.bucket AND q.vec_id <> c.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY round(adc, 9), neighbor_id
    ) AS srank FROM pairs
  ) WHERE srank <= {PQ_SHORTLIST}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         {sqd} AS dist
  FROM short s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, rank, round(dist, 5) AS dist FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY round(dist, 9), neighbor_id
  ) AS BIGINT) AS rank FROM rer
) WHERE rank <= {k}
"""


EMBEDDING_IVFPQ_TOPK_SQL = _ivfpq_sql("embeddings")
