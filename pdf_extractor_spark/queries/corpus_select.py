"""Training-set selection: the capstone composite over `documents` —
quality-score filter + language gate + fingerprint dedup in ONE pass.

This is the query a 100 TB training-data pipeline actually runs after
extraction: keep documents whose quality composite clears a threshold,
whose language is confidently identified, and which are the canonical
(lowest-id) representative of their near-dup fingerprint cluster.

Physical shape: one scan → projection (all features are built-in
expressions) → a single window shuffle keyed on the fingerprint (dedup
representative selection). No joins; the feature computations reuse the
exact expression templates of text_quality / text_lang_id /
text_fingerprint, so the oracle stays a mechanical CTE composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_extractor_spark.queries.dedup import (
    SHINGLES_D,
    SHINGLES_S,
    TOKS_D,
    TOKS_S,
)
from pdf_extractor_spark.queries.textstats import (
    _FP_D,
    _FP_S,
    _LANG_ORDER,
    _hits_duck,
    _hits_spark,
    _pred_case,
    _PUNCT_RE,
    _quality_exprs,
)

QUALITY_MIN = 0.5


def features_of(docs: DataFrame) -> DataFrame:
    """Shared quality/lang feature prep over an ARBITRARY (doc_id, text)
    DataFrame (the SINGLE Spark-side copy — corpus_select,
    corpus_sample_stratified, and jobs/corpus_job.py all build on it, so
    the compositions cannot silently diverge)."""
    df = (
        docs.withColumn("toks", F.expr(TOKS_S))
        .withColumn("n_tokens", F.expr("CAST(size(toks) AS BIGINT)"))
        .withColumn(
            "n_punct",
            F.expr(
                f"CAST(size(regexp_extract_all(text, '{_PUNCT_RE}', 1)) AS BIGINT)"
            ),
        )
    )
    for lg in _LANG_ORDER:
        df = df.withColumn(f"hits_{lg}", F.expr(_hits_spark(lg)))
    return df.withColumn(
        "quality", F.expr(_quality_exprs()["quality"])
    ).withColumn("lang_pred", F.expr(_pred_case()))


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return features_of(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _features(spark, sf_dir).withColumn("fingerprint", F.expr(_FP_S))
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("quality") >= QUALITY_MIN)
            & (F.col("lang_pred") != "und")
            & (F.col("rn") == 1)
        )
        .select("doc_id", "lang_pred", "quality", "fingerprint")
    )


_HITS_D = ",\n         ".join(
    f"{_hits_duck(lg)} AS hits_{lg}" for lg in _LANG_ORDER
)
CORPUS_SELECT_SQL = f"""
WITH feat AS (
  SELECT doc_id,
         {_quality_exprs()["quality"]} AS quality,
         {_pred_case()} AS lang_pred,
         {_FP_D} AS fingerprint
  FROM (
    SELECT doc_id, text, toks,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{_PUNCT_RE}', 1)) AS BIGINT)
             AS n_punct,
           {_HITS_D}
    FROM (SELECT doc_id, text, {TOKS_D} AS toks FROM documents)
  )
)
SELECT doc_id, lang_pred, quality, fingerprint FROM (
  SELECT *, row_number() OVER (
    PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM feat
)
WHERE quality >= {QUALITY_MIN} AND lang_pred <> 'und' AND rn = 1
"""


# --------------------------------------------------------------------------
# Stratified corpus sampling — the training-mix construction step that
# runs downstream of corpus_select: a deterministic per-(lang,
# quality-band) document budget, selected by HASH order (md5 of doc_id),
# never rand() — the same corpus and budget always yield the same
# sample, on any cluster size, resumable for free.
#
# Two-phase shape so it holds at 100 TB: a naive per-stratum
# row_number window would shuffle EVERY document onto a handful of
# stratum keys (one task per stratum — the classic few-hot-keys skew).
# Instead: (1) aggregate per-stratum counts (map-side-combined, tiny),
# broadcast them back, and PRE-FILTER by hash threshold ≈
# MARGIN×budget/count — a pure projection that drops all but
# ~MARGIN×budget rows per stratum with zero document shuffle; (2) run
# the exact-rank window on the tiny survivor set only. The hash
# fraction is h/2^32 with h the first 32 md5 bits — a power-of-two
# denominator, so the double compare is exact and identical across
# engines.
#
# MARGIN bounds the silent-underfill risk: survivors per large stratum
# ~ Poisson(MARGIN×B). At MARGIN=2 (B=25), P(survivors < B) ≈ 4e-5 per
# stratum — rare but real across many strata/corpora. At MARGIN=4,
# P(Poisson(100) < 25) ≈ 2e-19: never, for any realistic number of
# runs, while the survivor set stays ~100 rows per stratum.
SAMPLE_BUDGET = 25  # docs per (lang_pred, quality_band) stratum
SAMPLE_MARGIN = 4
_H32 = "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
_H32_D = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
_BAND = "CAST(least(floor(quality * 4), 3) AS INT)"


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_stratified_of(_features(spark, sf_dir))


def sample_stratified_of(
    featured: DataFrame, budget: int = SAMPLE_BUDGET
) -> DataFrame:
    """Two-phase stratified sampler over an ARBITRARY featured DataFrame
    (needs doc_id, quality, lang_pred — i.e. features_of() output)."""
    feat = (
        featured
        .withColumn("quality_band", F.expr(_BAND))
        .withColumn("h", F.expr(_H32))
        .select("doc_id", "lang_pred", "quality_band", "h")
    )
    counts = feat.groupBy("lang_pred", "quality_band").agg(
        F.count("*").alias("cnt")
    )
    pre = feat.join(
        F.broadcast(counts), on=["lang_pred", "quality_band"]
    ).filter(
        F.expr(
            "h / 4294967296.0 < "
            f"least({SAMPLE_MARGIN}.0 * {budget} / cnt, 1.0)"
        )
    )
    w = Window.partitionBy("lang_pred", "quality_band").orderBy(
        "h", "doc_id"
    )
    return (
        pre.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= budget)
        .select("doc_id", "lang_pred", "quality_band", "sample_rank")
    )


CORPUS_SAMPLE_SQL = f"""
WITH feat AS (
  SELECT doc_id, lang_pred, {_BAND} AS quality_band, {_H32_D} AS h
  FROM (
    SELECT doc_id,
           {_quality_exprs()["quality"]} AS quality,
           {_pred_case()} AS lang_pred
    FROM (
      SELECT doc_id, text, toks,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '{_PUNCT_RE}', 1)) AS BIGINT)
               AS n_punct,
             {_HITS_D}
      FROM (SELECT doc_id, text, {TOKS_D} AS toks FROM documents)
    )
  )
),
counts AS (
  SELECT lang_pred, quality_band, COUNT(*) AS cnt
  FROM feat GROUP BY 1, 2
),
pre AS (
  SELECT f.doc_id, f.lang_pred, f.quality_band, f.h
  FROM feat f JOIN counts c USING (lang_pred, quality_band)
  WHERE f.h / 4294967296.0 < least({SAMPLE_MARGIN}.0 * {SAMPLE_BUDGET} / c.cnt, 1.0)
)
SELECT doc_id, lang_pred, quality_band, sample_rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY lang_pred, quality_band ORDER BY h, doc_id
  ) AS BIGINT) AS sample_rank
  FROM pre
) WHERE sample_rank <= {SAMPLE_BUDGET}
"""


# --------------------------------------------------------------------------
# Corpus mix report — the per-(source, predicted-language) composition
# table a pipeline publishes before fixing a training mix: document
# counts, token totals, mean quality, and each cell's share of all
# corpus tokens.
#
# Cross-engine float discipline: a naive avg(quality) sums doubles in
# engine/partition order and can differ in the last ulp. Instead the
# 5-dp quality is scaled to an exact BIGINT (quality_micro) and summed
# as integers (order-free), and every reported double derives from one
# division of exact integers — bit-identical everywhere. Same for
# token_share: BIGINT token sums, one double division, one round.
#
# Physical shape at 100 TB: one scan → hash agg on (source, lang_pred)
# with map-side partial aggregation (group count ~ sources × langs,
# tiny); the grand total joins back as a BROADCAST of a 1-row agg —
# never a global single-partition window over the result.
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_mix_report_of(_features(spark, sf_dir))


def corpus_mix_report_of(featured: DataFrame) -> DataFrame:
    grouped = (
        featured.withColumn(
            "quality_micro",
            F.expr("CAST(round(quality * 100000) AS BIGINT)"),
        )
        .groupBy("source", "lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("quality_micro").alias("q_micro_sum"),
        )
    )
    # materialize the tiny grouped aggregate ONCE: the grand-total agg
    # and the crossJoin left side are otherwise independent plan
    # branches, and Spark shares no subplans — the full scan + regex
    # feature pipeline would execute TWICE just to derive a 1-row total
    # (confirmed from the executed plan: 2 FileScans without this).
    # grouped is O(sources × langs) rows, so the checkpoint is free.
    grouped = grouped.localCheckpoint(eager=True)
    total = grouped.agg(
        F.sum("sum_tokens").alias("total_tokens")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang_pred",
            "n_docs",
            F.expr("CAST(sum_tokens AS BIGINT)").alias("sum_tokens"),
            F.expr(
                "round(CAST(q_micro_sum AS DOUBLE)"
                " / (CAST(n_docs AS DOUBLE) * 100000.0), 5)"
            ).alias("mean_quality"),
            F.expr(
                "round(CAST(sum_tokens AS DOUBLE)"
                " / CAST(total_tokens AS DOUBLE), 5)"
            ).alias("token_share"),
        )
    )


CORPUS_MIX_SQL = f"""
WITH feat AS (
  SELECT doc_id, source, n_tokens,
         {_quality_exprs()["quality"]} AS quality,
         {_pred_case()} AS lang_pred
  FROM (
    SELECT doc_id, source, text, toks,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{_PUNCT_RE}', 1)) AS BIGINT)
             AS n_punct,
           {_HITS_D}
    FROM (SELECT doc_id, source, text, {TOKS_D} AS toks FROM documents)
  )
),
grouped AS (
  SELECT source, lang_pred, COUNT(*) AS n_docs,
         SUM(n_tokens) AS sum_tokens,
         SUM(CAST(round(quality * 100000) AS BIGINT)) AS q_micro_sum
  FROM feat GROUP BY source, lang_pred
)
SELECT source, lang_pred, n_docs,
       CAST(sum_tokens AS BIGINT) AS sum_tokens,
       round(CAST(q_micro_sum AS DOUBLE)
             / (CAST(n_docs AS DOUBLE) * 100000.0), 5) AS mean_quality,
       round(CAST(sum_tokens AS DOUBLE)
             / CAST((SELECT SUM(sum_tokens) FROM grouped) AS DOUBLE), 5)
         AS token_share
FROM grouped
"""


# --------------------------------------------------------------------------
# Deterministic shuffle-sharding — the training-export step after
# selection/sampling: give every document a stable (shard, position)
# under a seeded hash so the exported order is fully mixed, identical
# on every rerun and every cluster size, and resumable per shard.
#
# Physical shape at 100 TB: shard assignment is a pure projection
# (seeded md5); the intra-shard order is a PER-SHARD sort, never a
# global one. N_SHARDS here is 8 for the fixture; a production export
# sizes it to corpus_bytes / shard_bytes (~10^5 shards of ~256 MB), so
# each row_number window partition is one output file's worth — there
# is no hot key and no total ordering across shards anywhere.
N_SHARDS = 8


def shuffle_hash_expr(key: str) -> str:
    """Seeded 32-bit shuffle hash of `key` (Spark SQL) — the ONE
    definition both the catalog entry (keyed on doc_id) and the corpus
    job's --mix-shards export (keyed on url) compose, so the two paths
    cannot silently diverge."""
    return (
        f"CAST(conv(substr(md5(concat('shuf1|', CAST({key} AS STRING))), "
        "1, 8), 16, 10) AS BIGINT)"
    )


def _shuffle_hash_duck(key: str) -> str:
    return (
        f"('0x' || substr(md5('shuf1|' || CAST({key} AS VARCHAR)), "
        "1, 8))::BIGINT"
    )


_SHUF_H = shuffle_hash_expr("doc_id")
_SHUF_H_D = _shuffle_hash_duck("doc_id")


def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_shuffle_shards_of(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def corpus_shuffle_shards_of(docs: DataFrame) -> DataFrame:
    df = docs.select("doc_id", F.expr(_SHUF_H).alias("h")).withColumn(
        "shard", F.expr(f"CAST(h % {N_SHARDS} AS INT)")
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return df.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


CORPUS_SHUFFLE_SQL = f"""
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM (
  SELECT doc_id, {_SHUF_H_D} AS h,
         CAST({_SHUF_H_D} % {N_SHARDS} AS INT) AS shard
  FROM documents
)
"""


# --------------------------------------------------------------------------
# Sequence packing — the step between the shuffled export and the
# trainer: concatenate every document's tokens (plus one EOS each) in
# the seeded shuffle order and chop the stream into fixed
# SEQ_LEN-token training sequences (GPT-style concat-and-chop; a
# document may straddle a sequence boundary). The output is the
# packing MANIFEST: for every document, which sequence its tokens
# start in, at what offset, and how many sequences it spans — exactly
# what a loader needs to materialize sequence s without scanning the
# corpus.
#
# Physical shape at 100 TB: identical to corpus_shuffle_shards — shard
# assignment is a pure seeded-hash projection, and the cumulative
# token count is a PER-SHARD window (hash exchange on `shard`, sort
# within partition), never a global ordering. Every output column is
# exact BIGINT arithmetic on the prefix sum, so the manifest is
# rerun-identical on any cluster size.
SEQ_LEN = 256


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_pack_sequences_of(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def corpus_pack_sequences_of(docs: DataFrame) -> DataFrame:
    df = docs.select(
        "doc_id",
        F.expr(_SHUF_H).alias("h"),
        # +1: every document is terminated by one EOS token
        F.expr(f"CAST(size({TOKS_S}) + 1 AS BIGINT)").alias("cost"),
    ).withColumn("shard", F.expr(f"CAST(h % {N_SHARDS} AS INT)"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    df = df.withColumn(
        "tok_start",
        F.coalesce(
            F.sum("cost").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    )
    return df.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        F.col("cost").alias("n_tokens_eos"),
        "tok_start",
        F.expr(f"tok_start DIV {SEQ_LEN}").alias("seq_first"),
        F.expr(f"(tok_start + cost - 1) DIV {SEQ_LEN}").alias("seq_last"),
        F.expr(f"tok_start % {SEQ_LEN}").alias("offset_in_seq"),
        F.expr(
            f"(tok_start + cost - 1) DIV {SEQ_LEN}"
            f" - tok_start DIV {SEQ_LEN} + 1"
        ).alias("n_seqs"),
    )


CORPUS_PACK_SQL = f"""
WITH base AS (
  SELECT doc_id, {_SHUF_H_D} AS h,
         CAST({_SHUF_H_D} % {N_SHARDS} AS INT) AS shard,
         CAST(len({TOKS_D}) + 1 AS BIGINT) AS cost
  FROM documents
),
cum AS (
  SELECT doc_id, shard, h, cost,
         CAST(row_number() OVER w AS BIGINT) AS pos,
         coalesce(sum(cost) OVER (
           w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tok_start
  FROM base
  WINDOW w AS (PARTITION BY shard ORDER BY h, doc_id)
)
SELECT doc_id, shard, pos,
       cost AS n_tokens_eos,
       tok_start,
       tok_start // {SEQ_LEN} AS seq_first,
       (tok_start + cost - 1) // {SEQ_LEN} AS seq_last,
       tok_start % {SEQ_LEN} AS offset_in_seq,
       (tok_start + cost - 1) // {SEQ_LEN}
         - tok_start // {SEQ_LEN} + 1 AS n_seqs
FROM cum
"""


# --------------------------------------------------------------------------
# Per-rule filter report — the pipeline-health dashboard a C4/Gopher
# style cleaning stage publishes: for each gating rule, how many
# documents fail it, plus the pass-all / fail-any totals. The rules are
# deliberately INTEGER comparisons (cross-multiplied thresholds), so
# the report is bit-exact across engines with no float rounding
# anywhere:
#   too_short    n_tokens < 20
#   lang_unknown no stopword hit in any supported language
#   low_ttr      distinct/total < 1/2        (2·n_distinct < n_tokens)
#   dup_2grams   1 - n2_distinct/(n-1) >= 1/10 (10·((n-1)-n2d) >= n-1)
#
# Physical shape: ONE projection pass over the corpus (all four flags
# are array-function expressions — no explode, no join), then a single
# 1-row aggregate unpivoted to the tall (rule, n_docs) report. At
# 100 TB this is a map-side-combined scan: the only exchange carries
# seven partial sums.
FILTER_MIN_TOKENS = 20


def _filter_flags(hits: list[str]) -> dict[str, str]:
    nt = "n_tokens"
    return {
        "f_short": f"CASE WHEN {nt} < {FILTER_MIN_TOKENS} THEN 1 ELSE 0 END",
        "f_lang": (
            f"CASE WHEN greatest({', '.join(hits)}) = 0 THEN 1 ELSE 0 END"
        ),
        "f_ttr": f"CASE WHEN n_distinct * 2 < {nt} THEN 1 ELSE 0 END",
        "f_dup": (
            f"CASE WHEN {nt} >= 2 AND "
            f"({nt} - 1 - n2_distinct) * 10 >= ({nt} - 1) "
            "THEN 1 ELSE 0 END"
        ),
    }


_FILTER_RULES = ["too_short", "lang_unknown", "low_ttr", "dup_2grams"]
_FLAG_OF = dict(zip(_FILTER_RULES, ["f_short", "f_lang", "f_ttr", "f_dup"]))


def corpus_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_filter_report_of(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def corpus_filter_report_of(docs: DataFrame) -> DataFrame:
    """(rule, n_docs): one row per gating rule + total/fail_any/pass_all."""
    df = (
        docs.withColumn("toks", F.expr(TOKS_S))
        .withColumn("n_tokens", F.expr("CAST(size(toks) AS BIGINT)"))
        .withColumn(
            "n_distinct",
            F.expr("CAST(size(array_distinct(toks)) AS BIGINT)"),
        )
        .withColumn("shingles", F.expr(SHINGLES_S))
        .withColumn(
            "n2_distinct", F.expr("CAST(size(shingles) AS BIGINT)")
        )
    )
    for lg in _LANG_ORDER:
        df = df.withColumn(f"hits_{lg}", F.expr(_hits_spark(lg)))
    flags = _filter_flags([f"hits_{lg}" for lg in _LANG_ORDER])
    for name, expr in flags.items():
        df = df.withColumn(name, F.expr(expr))
    agg = df.agg(
        F.count("*").alias("n_total"),
        *[
            F.sum(_FLAG_OF[r]).cast("long").alias(f"n_{r}")
            for r in _FILTER_RULES
        ],
        F.sum(
            F.expr(
                "CASE WHEN f_short + f_lang + f_ttr + f_dup = 0 "
                "THEN 1 ELSE 0 END"
            )
        ).cast("long").alias("n_pass"),
    )
    rule_pairs = ", ".join(
        f"'{r}', n_{r}" for r in _FILTER_RULES
    )
    n = len(_FILTER_RULES) + 3
    return agg.select(
        F.expr(
            f"stack({n}, 'total', CAST(n_total AS BIGINT), {rule_pairs}, "
            "'fail_any', CAST(n_total - n_pass AS BIGINT), "
            "'pass_all', n_pass) AS (rule, n_docs)"
        )
    )


_FILTER_HITS_D = ",\n         ".join(
    f"{_hits_duck(lg)} AS hits_{lg}" for lg in _LANG_ORDER
)
_FILTER_FLAGS_D = _filter_flags([f"hits_{lg}" for lg in _LANG_ORDER])

CORPUS_FILTER_REPORT_SQL = f"""
WITH feat AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         CAST(len({SHINGLES_D}) AS BIGINT) AS n2_distinct,
         {_FILTER_HITS_D}
  FROM (SELECT doc_id, text, {TOKS_D} AS toks FROM documents)
),
flags AS (
  SELECT {_FILTER_FLAGS_D['f_short']} AS f_short,
         {_FILTER_FLAGS_D['f_lang']} AS f_lang,
         {_FILTER_FLAGS_D['f_ttr']} AS f_ttr,
         {_FILTER_FLAGS_D['f_dup']} AS f_dup
  FROM feat
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(f_short) AS BIGINT) AS n_too_short,
         CAST(sum(f_lang) AS BIGINT) AS n_lang_unknown,
         CAST(sum(f_ttr) AS BIGINT) AS n_low_ttr,
         CAST(sum(f_dup) AS BIGINT) AS n_dup_2grams,
         CAST(sum(CASE WHEN f_short + f_lang + f_ttr + f_dup = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
  FROM flags
)
SELECT 'total' AS rule, n_total AS n_docs FROM sums
UNION ALL SELECT 'too_short', n_too_short FROM sums
UNION ALL SELECT 'lang_unknown', n_lang_unknown FROM sums
UNION ALL SELECT 'low_ttr', n_low_ttr FROM sums
UNION ALL SELECT 'dup_2grams', n_dup_2grams FROM sums
UNION ALL SELECT 'fail_any', n_total - n_pass FROM sums
UNION ALL SELECT 'pass_all', n_pass FROM sums
"""


# --------------------------------------------------------------------------
# Temperature-smoothed training-mixture weights — the T5/PaLM mixture
# computation: per-source sampling probability proportional to
# (token count)^T, which up-weights small high-value sources relative
# to raw token share. T = 0.5 is deliberate: x^0.5 is IEEE-754 sqrt,
# correctly rounded in BOTH engines, so the weights are bit-identical
# cross-engine where a pow(x, 0.7) would pin a libm transcendental the
# hash gate can't trust. The normalizing total is a LEFT FOLD over the
# per-source weights ordered by source (Spark aggregate HOF == DuckDB
# list_reduce == a plain Python loop — the STATE.md float discipline),
# never an unordered SUM of doubles.
#
# Physical shape at 100 TB: one hash agg to O(sources) rows, then all
# remaining arithmetic happens on that tiny table (checkpointed once,
# the corpus_mix_report pattern, so the corpus is scanned exactly
# once); the fold and the broadcast total are O(sources).
MIX_TOKEN_BUDGET = 1_000_000


def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_mix_weights_of(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def corpus_mix_weights_of(docs: DataFrame) -> DataFrame:
    per = (
        docs.withColumn("toks", F.expr(TOKS_S))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.expr("size(toks)")).cast("long").alias("n_tokens"),
        )
        .withColumn("w", F.expr("sqrt(CAST(n_tokens AS DOUBLE))"))
        .localCheckpoint(eager=True)
    )
    total = per.agg(
        F.sort_array(F.collect_list(F.struct("source", "w"))).alias("sw")
    ).select(
        F.expr(
            "aggregate(sw, CAST(0.0 AS DOUBLE), (a, x) -> a + x.w)"
        ).alias("total_w")
    )
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("round(w, 5)").alias("weight"),
        F.expr("round(w / total_w, 6)").alias("p_sample"),
        F.expr(
            f"CAST(floor({MIX_TOKEN_BUDGET}.0 * w / total_w) AS BIGINT)"
        ).alias("alloc_tokens"),
    )


CORPUS_MIX_WEIGHTS_SQL = f"""
WITH per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
         sqrt(CAST(sum(len(toks)) AS DOUBLE)) AS w
  FROM (SELECT source, {TOKS_D} AS toks FROM documents)
  GROUP BY source
),
tot AS (
  SELECT list_reduce(list(w ORDER BY source), (a, b) -> a + b)
    AS total_w
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(w, 5) AS weight,
       round(w / total_w, 6) AS p_sample,
       CAST(floor({MIX_TOKEN_BUDGET}.0 * w / total_w) AS BIGINT)
         AS alloc_tokens
FROM per, tot
"""


# --------------------------------------------------------------------------
# Budget waterfill — the step AFTER corpus_mix_weights: mix weights say
# the RATIO a training run wants; real sources have finite capacity
# (tokens available × max allowed epochs), so the allocator must fill a
# global token budget proportionally to weight WITH per-source caps,
# redistributing the overflow of saturated sources to the rest (the
# PaLM/LLaMA data-recipe shape). Exact-integer waterfill:
#
# - sources sorted by capacity/weight ascending (cheapest-to-saturate
#   first, source as tie-break). The order is EXACT: rank by the
#   cross-multiplied comparison c_a·w_b < c_b·w_a over the O(#sources)
#   self-join (DECIMAL(38,0)/HUGEINT — ~1e23 at design scale), never
#   by the double ratio c/w — at 1e13-token/1e10-doc magnitudes two
#   distinct exact ratios can round to the same double (ulp ~1e-15 vs
#   rational gaps down to ~1/(w_a·w_b)), and a wrong tie order breaks
#   the prefix-saturation theorem (tests pin a concrete collision);
# - the saturated set is a PREFIX of that order: source k saturates iff
#   its proportional share of the remaining budget covers its cap,
#   (B - C_{k-1}) * w_k >= c_k * (W - W_{k-1}), where C/W are prefix
#   sums — the chain condition is an all-integer cross-multiplication
#   evaluated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) because at
#   the 10^12-token design scale budget × weight overflows BIGINT
#   (~1e23); a running min() turns the per-row conditions into the
#   maximal-prefix flag;
# - saturated sources get their cap; the rest get the FLOOR of their
#   proportional share of what remains (integral `div` — Spark decimal
#   div and DuckDB // agree exactly, probe-tested), so every output is
#   an exact integer and the unallocated remainder is < #unsaturated.
#
# The per-source table is O(#sources) — tiny by definition — so the
# global (unpartitioned) rank window is a driver-sized sort, never a
# data-mass shuffle.
BUDGET_PCT = 90  # allocate 90% of corpus tokens: tight enough that the
# shortest-capacity sources saturate at every SF (measured: 2 of 20 at
# sf0.01), loose enough that most stay proportional.


def corpus_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return budget_alloc_of(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def budget_alloc_of(docs: DataFrame) -> DataFrame:
    per = (
        docs.withColumn("toks", F.expr(TOKS_S))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("w_docs"),
            F.sum(F.expr("size(toks)")).cast("long").alias("cap_tokens"),
        )
    )
    return waterfill_of(per)


def waterfill_of(
    per: DataFrame, budget_tokens: int | None = None
) -> DataFrame:
    """Waterfill over an explicit (source, w_docs, cap_tokens) table —
    the seam tests use to drive design-scale magnitudes (1e13 tokens ×
    1e10 docs) through the DECIMAL chain condition.

    ``budget_tokens``: explicit global token budget (the corpus job's
    --mix-budget); default derives the budget as BUDGET_PCT% of total
    capacity (the catalog entry's contract). An explicit budget is
    clamped to total capacity — asking for more than exists allocates
    everything (every source saturates at its cap)."""
    # materialize the O(#sources) table ONCE: the totals crossJoin, the
    # rank windows, and the saturated-totals agg are four independent
    # plan branches, and Spark shares no subplans — unmaterialized, the
    # warehouse scan + token count executed 4× (FileScan count pinned
    # by tests/test_plans.py, the corpus_mix_weights precedent)
    per = per.localCheckpoint(eager=True)
    tot = per.agg(
        F.sum("cap_tokens").cast("long").alias("tot_c"),
        F.sum("w_docs").cast("long").alias("tot_w"),
    )
    # exact cap/weight rank: count sources strictly before (a) in the
    # (ratio, source) order via the cross-multiplied integer comparison
    # — a double ratio collides at design-scale magnitudes (two
    # distinct rationals within one ulp) and a wrong tie order breaks
    # the prefix theorem. O(#sources)^2 rows on a broadcast self-join
    # of the checkpointed table — driver-sized, never a data shuffle.
    other = per.select(
        F.col("source").alias("b_source"),
        F.col("w_docs").alias("b_w"),
        F.col("cap_tokens").alias("b_c"),
    )
    rank = (
        per.crossJoin(F.broadcast(other))
        .withColumn(
            "before",
            F.expr(
                "CASE WHEN CAST(b_c AS DECIMAL(38, 0)) * w_docs "
                "< CAST(cap_tokens AS DECIMAL(38, 0)) * b_w "
                "OR (CAST(b_c AS DECIMAL(38, 0)) * w_docs "
                "= CAST(cap_tokens AS DECIMAL(38, 0)) * b_w "
                "AND b_source < source) THEN 1 ELSE 0 END"
            ),
        )
        .groupBy("source")
        .agg(F.sum("before").cast("long").alias("rk"))
    )
    per = per.join(F.broadcast(rank), "source")
    ow = Window.orderBy("rk")
    prev = ow.rowsBetween(Window.unboundedPreceding, -1)
    incl = ow.rowsBetween(Window.unboundedPreceding, 0)
    flagged = (
        per.crossJoin(F.broadcast(tot))
        # budget and alloc_pm route through DECIMAL: tot_c×90 and
        # alloc×1000 overflow BIGINT past ~1e16-token totals
        .withColumn(
            "budget",
            F.expr(
                f"CAST(CAST(tot_c AS DECIMAL(38, 0)) * {BUDGET_PCT} "
                "DIV 100 AS BIGINT)"
                if budget_tokens is None
                else "CAST(least("
                f"CAST({int(budget_tokens)} AS DECIMAL(38, 0)), "
                "CAST(tot_c AS DECIMAL(38, 0))) AS BIGINT)"
            ),
        )
        .withColumn(
            "c_prev",
            F.coalesce(F.sum("cap_tokens").over(prev), F.lit(0)),
        )
        .withColumn(
            "w_prev", F.coalesce(F.sum("w_docs").over(prev), F.lit(0))
        )
        .withColumn(
            "cond",
            F.expr(
                "CASE WHEN CAST(budget - c_prev AS DECIMAL(20, 0)) "
                "* w_docs >= CAST(cap_tokens AS DECIMAL(20, 0)) "
                "* (tot_w - w_prev) THEN 1 ELSE 0 END"
            ),
        )
        .withColumn("saturated", F.min("cond").over(incl))
    )
    sat_tot = flagged.agg(
        F.sum(F.expr("saturated * cap_tokens")).cast("long").alias("sat_c"),
        F.sum(F.expr("saturated * w_docs")).cast("long").alias("sat_w"),
    )
    return (
        flagged.crossJoin(F.broadcast(sat_tot))
        .withColumn(
            "alloc_tokens",
            F.expr(
                "CAST(CASE WHEN saturated = 1 THEN cap_tokens "
                "ELSE (CAST(budget - sat_c AS DECIMAL(20, 0)) * w_docs) "
                "div (tot_w - sat_w) END AS BIGINT)"
            ),
        )
        .select(
            "source",
            "w_docs",
            "cap_tokens",
            F.expr("CAST(saturated AS INT)").alias("saturated"),
            "alloc_tokens",
            F.expr(
                "CAST(CAST(alloc_tokens AS DECIMAL(38, 0)) * 1000 "
                "DIV budget AS BIGINT)"
            ).alias("alloc_pm"),
        )
    )


CORPUS_BUDGET_ALLOC_SQL = f"""
WITH per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS w_docs,
         CAST(sum(len(toks)) AS BIGINT) AS cap_tokens
  FROM (SELECT source, {TOKS_D} AS toks FROM documents)
  GROUP BY source
),
tot AS (
  SELECT CAST(SUM(cap_tokens) AS BIGINT) AS tot_c,
         CAST(SUM(w_docs) AS BIGINT) AS tot_w
  FROM per
),
rnk AS (
  SELECT a.source,
         SUM(CASE WHEN b.cap_tokens::HUGEINT * a.w_docs
                       < a.cap_tokens::HUGEINT * b.w_docs
                  OR (b.cap_tokens::HUGEINT * a.w_docs
                      = a.cap_tokens::HUGEINT * b.w_docs
                      AND b.source < a.source)
                  THEN 1 ELSE 0 END) AS rk
  FROM per a, per b GROUP BY a.source
),
flagged AS (
  SELECT *,
    CASE WHEN (budget - c_prev)::HUGEINT * w_docs
              >= cap_tokens::HUGEINT * (tot_w - w_prev)
         THEN 1 ELSE 0 END AS cond
  FROM (
    SELECT *,
      coalesce(SUM(cap_tokens) OVER (ORDER BY rk
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_prev,
      coalesce(SUM(w_docs) OVER (ORDER BY rk
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w_prev
    FROM (
      SELECT per.*, rk, tot_c, tot_w,
             CAST(tot_c::HUGEINT * {BUDGET_PCT} // 100 AS BIGINT)
               AS budget
      FROM per JOIN rnk USING (source), tot
    )
  )
),
satd AS (
  SELECT *, MIN(cond) OVER (ORDER BY rk
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS saturated
  FROM flagged
),
stot AS (
  SELECT CAST(SUM(saturated * cap_tokens) AS BIGINT) AS sat_c,
         CAST(SUM(saturated * w_docs) AS BIGINT) AS sat_w
  FROM satd
)
SELECT source, w_docs, cap_tokens,
       CAST(saturated AS INT) AS saturated,
       alloc_tokens,
       CAST(alloc_tokens::HUGEINT * 1000 // budget AS BIGINT) AS alloc_pm
FROM (
  SELECT *,
         CAST(CASE WHEN saturated = 1 THEN cap_tokens
              ELSE ((budget - sat_c)::HUGEINT * w_docs)
                   // (tot_w - sat_w) END AS BIGINT) AS alloc_tokens
  FROM satd, stot
)
"""


# --------------------------------------------------------------------------
# Distribution-drift monitor — the pipeline-health query a daily crawl
# runs before promoting a batch: has the NEW batch's unigram
# distribution drifted from the kept corpus? Pearson chi-square against
# the corpus distribution, over the corpus-supported vocabulary, plus
# the out-of-vocabulary signal chi-square cannot see (new tokens have
# expected count 0): n_new_tokens and their per-mille mass.
#
# Cross-engine exactness discipline:
# - token counts o_t (batch) and c_t (corpus) and the totals B, C are
#   exact BIGINTs;
# - the per-token residual o_t·C − c_t·B is computed in
#   DECIMAL(38,0)/HUGEINT (≈1e25 at the 10^12-token design scale —
#   past BIGINT, the budget-alloc lesson), converted to DOUBLE once;
# - the contribution (o·C − c·B)²/(C·B·c_t) is evaluated in a PINNED
#   operation order — (r/C)·(r/B)/c — identical in both engines
#   (IEEE double ops are deterministic; only ORDER can diverge);
# - the chi-square total is an ORDERED LEFT FOLD over tokens (the
#   corpus_mix_weights discipline) — never an unordered double SUM.
#
# Both slices reduce to O(vocabulary) rows before anything expensive;
# the document mass is touched once per slice by a count aggregate.
BATCH_DRIFT_MOD = 10
BATCH_DRIFT_MIN = 8  # doc_id % 10 >= 8 -> the "new batch" (bloom/cms split)


def corpus_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drift_chi2_of(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def drift_chi2_of(docs: DataFrame) -> DataFrame:
    return drift_chi2_two(
        docs.filter(F.col("doc_id") % BATCH_DRIFT_MOD < BATCH_DRIFT_MIN),
        docs.filter(F.col("doc_id") % BATCH_DRIFT_MOD >= BATCH_DRIFT_MIN),
    )


def drift_chi2_two(corpus: DataFrame, batch: DataFrame) -> DataFrame:
    """Two-table form (needs a `text` column on each side) — the corpus
    job's --drift-check gates a new export against the PREVIOUS export
    through this seam; the catalog entry is the doc_id-mod split above."""

    def counts(side: DataFrame) -> DataFrame:
        return (
            side.withColumn("toks", F.expr(TOKS_S))
            .select(F.explode("toks").alias("token"))
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("n"))
        )

    ct = counts(corpus).withColumnRenamed("n", "c")
    bt = counts(batch).withColumnRenamed("n", "o")
    tot = (
        ct.agg(F.sum("c").cast("long").alias("big_c"))
        .crossJoin(bt.agg(F.sum("o").cast("long").alias("big_b")))
    )
    shared = (
        ct.join(bt, on="token", how="left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "contrib",
            F.expr(
                "CAST(CAST(o AS DECIMAL(20, 0)) * big_c "
                "- CAST(c AS DECIMAL(20, 0)) * big_b AS DOUBLE) "
                "/ CAST(big_c AS DOUBLE) "
                "* (CAST(CAST(o AS DECIMAL(20, 0)) * big_c "
                "- CAST(c AS DECIMAL(20, 0)) * big_b AS DOUBLE) "
                "/ CAST(big_b AS DOUBLE)) "
                "/ CAST(c AS DOUBLE)"
            ),
        )
    )
    chi2 = shared.agg(
        F.count("*").cast("long").alias("n_shared"),
        F.expr(
            "round(aggregate(sort_array(collect_list("
            "struct(token, contrib))), CAST(0.0 AS DOUBLE), "
            "(a, x) -> a + x.contrib), 2)"
        ).alias("chi2"),
    )
    new = bt.join(ct, on="token", how="left_anti").agg(
        F.count("*").cast("long").alias("n_new_tokens"),
        F.coalesce(F.sum("o"), F.lit(0)).cast("long").alias("new_mass"),
    )
    return (
        chi2.crossJoin(F.broadcast(new))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_shared",
            "chi2",
            "n_new_tokens",
            F.expr("new_mass * 1000 DIV big_b").alias("new_mass_pm"),
        )
    )


CORPUS_DRIFT_SQL = f"""
WITH ct AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT unnest(toks) AS token FROM (
      SELECT {TOKS_D} AS toks FROM documents
      WHERE doc_id % {BATCH_DRIFT_MOD} < {BATCH_DRIFT_MIN}
    )
  ) GROUP BY token
),
bt AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS o FROM (
    SELECT unnest(toks) AS token FROM (
      SELECT {TOKS_D} AS toks FROM documents
      WHERE doc_id % {BATCH_DRIFT_MOD} >= {BATCH_DRIFT_MIN}
    )
  ) GROUP BY token
),
tot AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM ct) AS big_c,
         (SELECT CAST(SUM(o) AS BIGINT) FROM bt) AS big_b
),
shared AS (
  SELECT ct.token,
         CAST(coalesce(bt.o, 0)::HUGEINT * big_c
              - ct.c::HUGEINT * big_b AS DOUBLE)
           / CAST(big_c AS DOUBLE)
         * (CAST(coalesce(bt.o, 0)::HUGEINT * big_c
                 - ct.c::HUGEINT * big_b AS DOUBLE)
            / CAST(big_b AS DOUBLE))
         / CAST(ct.c AS DOUBLE) AS contrib
  FROM ct LEFT JOIN bt USING (token), tot
),
chi AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_shared,
         round(list_reduce(list(contrib ORDER BY token),
               (a, b) -> a + b), 2) AS chi2
  FROM shared
),
new_t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_new_tokens,
         CAST(coalesce(SUM(o), 0) AS BIGINT) AS new_mass
  FROM bt WHERE token NOT IN (SELECT token FROM ct)
)
SELECT n_shared, chi2, n_new_tokens,
       new_mass * 1000 // big_b AS new_mass_pm
FROM chi, new_t, tot
"""


# --------------------------------------------------------------------------
# Weighted priority sampling (Duffield, Lund & Thorup 2007): draw K
# documents with inclusion probability increasing in token weight, plus
# the DLT estimator that makes the sample usable for unbiased subset-
# sum estimates (est_tokens sums ~ the corpus total) — the sampler a
# pipeline runs to build a weight-faithful audit slice of a 10^12-doc
# corpus without a full pass over anything but (doc_id, weight).
#
# Exactness discipline: the classical priority q_i = w_i / u_i (u_i
# uniform) is replaced by its INTEGER floor p_i = (w_i * 2^32) DIV u_i
# with u_i = md5-derived 32-bit uniform + 1, tie-broken by (u_i,
# doc_id) — fully deterministic, no libm, identical arithmetic in both
# engines (a deliberate deterministic discretization of DLT: floor can
# tie distinct rationals, the tie-break resolves them identically).
# Zero-weight docs get priority 0 and are never drawn ahead of any
# weighted doc. The estimator is est_i = max(w_i, floor(tau)) with tau
# = the (K+1)-th priority / 2^32 — DLT's threshold estimator under the
# same floor.
#
# Physical shape at 100 TB: the scan projects (doc_id, n_tokens) only;
# the global top-(K+1) compiles to TakeOrderedAndProject (per-task
# K-heaps, K+1 rows to one reducer — plan-asserted), never a corpus
# sort; the threshold is a one-row broadcast.

PRIORITY_K = 100


def corpus_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_priority_of(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def sample_priority_of(docs: DataFrame, k: int = PRIORITY_K) -> DataFrame:
    feat = (
        docs.select(
            "doc_id",
            F.expr(f"CAST(size({TOKS_S}) AS BIGINT)").alias("n_tokens"),
        )
        .withColumn("u", F.expr(_H32) + F.lit(1).cast("long"))
        .withColumn(
            "priority", F.expr("(n_tokens * 4294967296) DIV u")
        )
    )
    order = [F.desc("priority"), F.asc("u"), F.asc("doc_id")]
    topk1 = feat.orderBy(*order).limit(k + 1)
    w = Window.orderBy(*order)
    ranked = topk1.withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    )
    thr = ranked.agg(
        F.max(
            F.when(F.col("sample_rank") == k + 1, F.col("priority"))
        ).alias("thr")
    )
    return (
        ranked.filter(F.col("sample_rank") <= k)
        .crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            "n_tokens",
            "priority",
            "sample_rank",
            F.expr(
                "CAST(greatest(n_tokens, coalesce(thr, 0)) AS BIGINT)"
            ).alias("est_tokens"),
        )
    )


CORPUS_SAMPLE_PRIORITY_SQL = f"""
WITH feat AS (
  SELECT doc_id,
         CAST(len({TOKS_D}) AS BIGINT) AS n_tokens,
         {_H32_D} + 1 AS u
  FROM documents
),
pri AS (
  SELECT doc_id, n_tokens, u,
         (n_tokens * 4294967296) // u AS priority
  FROM feat
),
ranked AS (
  SELECT doc_id, n_tokens, u, priority,
         CAST(row_number() OVER (
           ORDER BY priority DESC, u, doc_id
         ) AS BIGINT) AS sample_rank
  FROM pri
  ORDER BY priority DESC, u, doc_id
  LIMIT {PRIORITY_K + 1}
),
thr AS (
  SELECT max(CASE WHEN sample_rank = {PRIORITY_K + 1} THEN priority END)
           AS thr
  FROM ranked
)
SELECT doc_id, n_tokens, priority, sample_rank,
       CAST(greatest(n_tokens, coalesce(thr, 0)) AS BIGINT)
         AS est_tokens
FROM ranked, thr WHERE sample_rank <= {PRIORITY_K}
"""
