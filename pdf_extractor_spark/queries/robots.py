"""Crawl politeness — robots.txt filtering of the frontier candidates,
the step every real crawler runs between "what to fetch next" and the
fetch itself.

Semantics implemented: CPython `urllib.robotparser`'s — within the
`User-agent: *` group, the FIRST rule (in file order) whose path is a
prefix of the candidate's path decides (Allow -> fetch, Disallow ->
skip); an EMPTY `Disallow:` is an allow-everything rule (it matches
first and shadows later rules — pinned by the fixture's archetype 3);
no matching rule, or no robots.txt at all, means allow. This is
deliberately the ORDER-based semantic, not Google's longest-match —
the differential test cross-verifies every (host, url) verdict against
robotparser itself, a genuine two-implementation check
(tests/test_robots.py).

Physical shape at 10^12 candidates: robots rules are a per-host
handful of rows — the rule table BROADCASTS, the prefix match is a
broadcast theta-join (substr-equality, no regex), and the first-match
pick is a per-candidate window over the few matched rules. The
candidate mass never shuffles for the verdict.

Rule-subset constraint (documented, fixture-enforced): single
`User-agent: *` group, no `*` wildcards or `$` anchors, ASCII paths —
the subset where robotparser, the relational form and the DuckDB
oracle provably agree.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
ROBOTS_FIXTURE = REPO_ROOT / "fixtures" / "robots_micro.parquet"

_HOST_RE = "^[a-z]+://([^/]+)"
_PATH_RE = "^[a-z]+://[^/]*(/.*)$"
# a rule line: "Disallow: <path>" / "Allow: <path>" (path may be empty)
_TYP_RE = "^(Disallow|Allow):"
_RULE_PATH_RE = "^(?:Disallow|Allow):\\s*(\\S*)"


def robots_rules_of(robots: DataFrame) -> DataFrame:
    """(host, rule_idx, rule_typ, rule_path) in FILE ORDER from
    (host, robots_txt) rows. An empty-path rule becomes an
    allow-everything rule (the robotparser conversion)."""
    return (
        robots.select(
            "host",
            F.posexplode(F.split("robots_txt", "\n")).alias(
                "rule_idx", "line"
            ),
        )
        .withColumn(
            "typ0", F.lower(F.regexp_extract("line", _TYP_RE, 1))
        )
        .filter(F.col("typ0") != "")
        .select(
            "host",
            F.col("rule_idx").cast("long").alias("rule_idx"),
            F.regexp_extract("line", _RULE_PATH_RE, 1).alias("rule_path"),
            "typ0",
        )
        .withColumn(
            "rule_typ",
            F.expr("CASE WHEN rule_path = '' THEN 'allow' ELSE typ0 END"),
        )
        .drop("typ0")
    )


def frontier_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every frontier candidate (absolute external outlink not yet
    crawled, the frontier_next_urls candidate set) with its robots
    verdict: url, dst_host, path, rule_idx (-1 = no rule), rule_typ
    ('' = none), allowed (0/1)."""
    from pdf_extractor_spark.operators.links import links_stage
    from pdf_extractor_spark.queries.graph import LINKPAGES_FIXTURE

    pages = spark.read.parquet(str(LINKPAGES_FIXTURE))
    links = links_stage(pages)
    page_host = F.regexp_extract("url", _HOST_RE, 1)
    cand = (
        links.filter(
            F.col("href").rlike("^[a-z]+://")
            & (F.regexp_extract("href", _HOST_RE, 1) != page_host)
        )
        .select(
            F.col("href").alias("url"),
            F.regexp_extract("href", _HOST_RE, 1).alias("dst_host"),
        )
        .distinct()
        .join(pages.select("url").distinct(), on="url", how="left_anti")
        .withColumn(
            "path",
            F.expr(
                f"coalesce(nullif(regexp_extract(url, '{_PATH_RE}', 1),"
                " ''), '/')"
            ),
        )
    )
    rules = robots_rules_of(
        spark.read.parquet(str(ROBOTS_FIXTURE))
    ).withColumnRenamed("host", "dst_host")
    matched = cand.join(
        F.broadcast(rules),
        on=[
            cand.dst_host == rules.dst_host,
            F.expr(
                "substr(path, 1, length(rule_path)) = rule_path"
            ),
        ],
        how="left",
    ).select(cand.dst_host.alias("dst_host"), "url", "path",
             "rule_idx", "rule_typ")
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(
        F.expr("coalesce(rule_idx, 9223372036854775807)")
    )
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "url",
            "dst_host",
            "path",
            F.expr("CAST(coalesce(rule_idx, -1) AS BIGINT)").alias(
                "rule_idx"
            ),
            F.expr("coalesce(rule_typ, '')").alias("rule_typ"),
            F.expr(
                "CAST(CASE WHEN rule_typ IS NULL OR rule_typ = 'allow' "
                "THEN 1 ELSE 0 END AS INT)"
            ).alias("allowed"),
        )
    )


def _frontier_robots_sql() -> str:
    from pdf_extractor_spark.queries.graph import (
        LINKPAGES_FIXTURE,
        _LINKS_EXPECTED,
    )

    return f"""
WITH rules AS (
  SELECT host, CAST(r['idx'] AS BIGINT) AS rule_idx,
         regexp_extract(r['line'], '{_RULE_PATH_RE}', 1) AS path0,
         lower(regexp_extract(r['line'], '{_TYP_RE}', 1)) AS typ0
  FROM (
    SELECT host, unnest(list_transform(range(len(ls)),
           i -> {{'idx': i, 'line': ls[i + 1]}})) AS r
    FROM (SELECT host, string_split(robots_txt, chr(10)) AS ls
          FROM '{ROBOTS_FIXTURE}')
  ) WHERE lower(regexp_extract(r['line'], '{_TYP_RE}', 1)) <> ''
),
rules2 AS (
  SELECT host, rule_idx, path0 AS rule_path,
         CASE WHEN path0 = '' THEN 'allow' ELSE typ0 END AS rule_typ
  FROM rules
),
cand AS (
  SELECT DISTINCT href AS url,
         regexp_extract(href, '{_HOST_RE}', 1) AS dst_host
  FROM '{_LINKS_EXPECTED}'
  WHERE regexp_matches(href, '^[a-z]+://')
    AND regexp_extract(href, '{_HOST_RE}', 1)
        <> regexp_extract(url, '{_HOST_RE}', 1)
    AND href NOT IN (SELECT url FROM '{LINKPAGES_FIXTURE}')
),
cand2 AS (
  SELECT url, dst_host,
         coalesce(nullif(regexp_extract(url, '{_PATH_RE}', 1), ''), '/')
           AS path
  FROM cand
),
matched AS (
  SELECT c.url, c.dst_host, c.path, r.rule_idx, r.rule_typ,
         row_number() OVER (
           PARTITION BY c.url
           ORDER BY coalesce(r.rule_idx, 9223372036854775807)) AS rn
  FROM cand2 c LEFT JOIN rules2 r
    ON c.dst_host = r.host
   AND substr(c.path, 1, length(r.rule_path)) = r.rule_path
)
SELECT url, dst_host, path,
       CAST(coalesce(rule_idx, -1) AS BIGINT) AS rule_idx,
       coalesce(rule_typ, '') AS rule_typ,
       CAST(CASE WHEN rule_typ IS NULL OR rule_typ = 'allow'
            THEN 1 ELSE 0 END AS INT) AS allowed
FROM matched WHERE rn = 1
"""
