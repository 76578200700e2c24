"""URL canonicalization — the crawl-side dedup key a web pipeline
computes before ANY content pass: the same page is crawled under
mixed-case hosts, default ports, tracking params (utm_*/fbclid),
fragments, and trailing slashes; canonicalizing collapses those to one
key so url-level dedup (jobs/corpus_job.py keys on url) does not keep
N copies of one page.

The reference deals with one uploaded file per request and has no URL
layer at all; this is the brief's web-pipeline family.

Rules (each SQL-expressible identically in Spark and DuckDB, verified
cross-engine on the committed fixture AND against an independent
plain-Python spec in tests/test_urlnorm.py):
  1. scheme and host lowercase;
  2. fragment stripped;
  3. default port stripped (:80 for http, :443 for https — others kept);
  4. tracking params removed (utm_<word>, fbclid), other params kept in
     original order (NO re-sorting: a=1&b=2 vs b=2&a=1 are conservatively
     kept distinct);
  5. trailing slashes trimmed from a non-root path; empty path -> '/'.

Engine-parity note: query-param surgery is done with ARRAY functions
(split -> filter -> join), never regexp_replace with capture-group
backreferences — Java ($1) and RE2 (\\1) disagree on replacement
syntax, so replacement templates are the one regex feature this module
bans. The plan is a pure projection + one hash exchange on the canon
key for the group stats — exactly the shuffle url-dedup needs anyway.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
URL_FIXTURE = REPO_ROOT / "fixtures" / "url_micro.parquet"

_TRACK_RE = "^(utm_[A-Za-z0-9]+|fbclid)="


# the scheme/host/rest extractors, parameterized over the column (or
# expression) holding the URL — composed callers (e.g. the image-pair
# dedup over `src`) use these instead of string-surgery on the rendered
# url-column forms, which would fail silently and identically on both
# engines if the template text ever changed
def scheme_of(col: str) -> str:
    return f"lower(regexp_extract({col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"


def host0_of(col: str) -> str:
    return (
        f"lower(regexp_extract({col}, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    )


# everything after the host, fragment already excluded by the class
def rest_of(col: str) -> str:
    return (
        f"regexp_extract({col}, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)"
    )


_SCHEME = scheme_of("url")
_HOST0 = host0_of("url")
_REST = rest_of("url")


def _canon_sql(
    split_fn: str,
    filter_fn: str,
    match: str,
    join_fn: str,
    fallback: str = "url",
) -> str:
    """The canonicalization expression over columns (scheme, host0,
    rest), engine-parameterized bottom-up. `match` is the tracking-param
    predicate over the lambda var p ("p rlike '...'" /
    "regexp_matches(p, '...')"). ``fallback`` is the SQL expression a
    scheme-less input resolves to (default: the raw url column passes
    through unchanged)."""
    host = (
        "CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '') "
        "WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '') "
        "ELSE host0 END"
    )
    path0 = (
        "(CASE WHEN instr(rest, '?') > 0 "
        "THEN substr(rest, 1, instr(rest, '?') - 1) ELSE rest END)"
    )
    raw_q = (
        "(CASE WHEN instr(rest, '?') > 0 "
        "THEN substr(rest, instr(rest, '?') + 1) ELSE '' END)"
    )
    # coalesce: DuckDB's array_to_string on an empty list yields NULL
    # where Spark's array_join yields '' — same trap as dedup_lines
    q = (
        f"coalesce({join_fn}({filter_fn}({split_fn}({raw_q}, '&'), "
        f"p -> p <> '' AND NOT ({match})), '&'), '')"
    )
    path1 = (
        f"(CASE WHEN length({path0}) > 1 "
        f"THEN regexp_replace({path0}, '/+$', '') ELSE {path0} END)"
    )
    path = f"(CASE WHEN {path1} = '' THEN '/' ELSE {path1} END)"
    # scheme-less input (no '://' match -> scheme = '') resolves to
    # `fallback`: a crawl row that failed URL parsing must not be
    # silently rewritten to '://...' garbage
    return (
        f"CASE WHEN scheme = '' THEN {fallback} ELSE "
        f"concat(scheme, '://', {host}, {path}, "
        f"CASE WHEN {q} = '' THEN '' ELSE concat('?', {q}) END) END"
    )


_CANON_S = _canon_sql(
    "split", "filter", f"p rlike '{_TRACK_RE}'", "array_join"
)
_CANON_D = _canon_sql(
    "string_split", "list_filter",
    f"regexp_matches(p, '{_TRACK_RE}')", "array_to_string",
)


def url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return url_normalize_of(spark.read.parquet(str(URL_FIXTURE)))


def url_normalize_of(urls: DataFrame) -> DataFrame:
    """rec_id, url_canon, canon_group (min rec_id sharing the canon),
    group_size — the url-level dedup verdict per record."""
    df = urls.select(
        "rec_id",
        "url",
        F.expr(_SCHEME).alias("scheme"),
        F.expr(_HOST0).alias("host0"),
        F.expr(_REST).alias("rest"),
    ).select("rec_id", F.expr(_CANON_S).alias("url_canon"))
    w = Window.partitionBy("url_canon")
    return df.select(
        "rec_id",
        "url_canon",
        F.min("rec_id").over(w).alias("canon_group"),
        F.count("*").over(w).cast("long").alias("group_size"),
    )


URL_NORMALIZE_SQL = f"""
WITH parts AS (
  SELECT rec_id, url, {_SCHEME} AS scheme, {_HOST0} AS host0, {_REST} AS rest
  FROM '{URL_FIXTURE}'
),
canon AS (
  SELECT rec_id, {_CANON_D} AS url_canon FROM parts
)
SELECT rec_id, url_canon,
       min(rec_id) OVER (PARTITION BY url_canon) AS canon_group,
       CAST(count(*) OVER (PARTITION BY url_canon) AS BIGINT) AS group_size
FROM canon
"""
