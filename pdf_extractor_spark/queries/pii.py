"""PII scrubbing — the redaction pass a training-data pipeline runs
between extraction and export: replace emails / phone numbers / IPv4
addresses with typed placeholder tokens and report per-document match
counts.

The reference has no redaction layer (it RETURNS extracted personal
fields to the caller — /root/reference/pdf_processor.py's
structured-extraction output); a corpus pipeline must do the opposite
before text leaves the pipeline, so this is part of the brief's
training-data family.

Cross-engine verification: the Spark side runs java.util.regex
(regexp_replace / regexp_extract_all); the DuckDB oracle runs RE2 over
the SAME committed fixture — two independent regex ENGINES must agree
byte-for-byte on every scrubbed document, so the patterns are kept in
the Java∩RE2 common subset (no lookaround, no backreferences; escaped
literals, bounded classes, \\b anchors only). The fixture
(fixtures/pii_micro.parquet, built by scripts/build_pii_fixture.py)
exists because the synthetic sf* documents contain no PII-shaped
strings.

Physical shape at 100 TB: a pure projection — three regexp passes per
row inside WholeStageCodegen, zero shuffles, zero UDFs. Scrub order is
fixed (EMAIL → PHONE → IPV4) so pattern interactions are deterministic;
counts are taken on the ORIGINAL text before any replacement.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
PII_FIXTURE = REPO_ROOT / "fixtures" / "pii_micro.parquet"

# Java ∩ RE2 common-subset patterns (see module docstring).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\(\d{3}\) \d{3}-\d{4}|\+\d{1,2}-\d{3}-\d{3}-\d{4}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (pattern, placeholder) in application order — order is part of the
# operator's contract (counts are pre-scrub, replacements cascade).
PII_RULES = [
    (PII_EMAIL, "<EMAIL>"),
    (PII_PHONE, "<PHONE>"),
    (PII_IPV4, "<IP>"),
]


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_scrub_of(spark.read.parquet(str(PII_FIXTURE)))


def pii_scrub_of(docs: DataFrame) -> DataFrame:
    """rec_id, n_emails, n_phones, n_ips, text_scrubbed."""
    counts = [
        F.size(F.regexp_extract_all("text", F.lit(pat), 0))
        .cast("long")
        .alias(name)
        for (pat, _), name in zip(
            PII_RULES, ["n_emails", "n_phones", "n_ips"]
        )
    ]
    scrubbed = F.col("text")
    for pat, token in PII_RULES:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return docs.select(
        "rec_id", *counts, scrubbed.alias("text_scrubbed")
    )


def _sq(pat: str) -> str:
    """Embed a regex in a standard-SQL single-quoted literal (DuckDB
    does not treat backslash as an escape inside '...')."""
    return "'" + pat.replace("'", "''") + "'"


PII_SCRUB_SQL = f"""
SELECT rec_id,
       CAST(len(regexp_extract_all(text, {_sq(PII_EMAIL)})) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, {_sq(PII_PHONE)})) AS BIGINT)
         AS n_phones,
       CAST(len(regexp_extract_all(text, {_sq(PII_IPV4)})) AS BIGINT)
         AS n_ips,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, {_sq(PII_EMAIL)}, '<EMAIL>', 'g'),
           {_sq(PII_PHONE)}, '<PHONE>', 'g'),
         {_sq(PII_IPV4)}, '<IP>', 'g') AS text_scrubbed
FROM '{PII_FIXTURE}'
"""
