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

from pdf_extractor_spark.queries.dedup import TOKS_D, TOKS_S
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


def corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("toks", F.expr(TOKS_S))
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
    df = (
        df.withColumn("quality", F.expr(_quality_exprs()["quality"]))
        .withColumn("lang_pred", F.expr(_pred_case()))
        .withColumn("fingerprint", F.expr(_FP_S))
    )
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
