"""Link-graph queries over the outlink stage (operators/links.py):
per-anchor host resolution and host-level degree aggregation — the
inputs a crawl-frontier / centrality-filter step consumes.

Oracle: the expected-output parquet (pure-Python collect_links over the
committed micro corpus — scripts/build_expected_oracles.py) carries the
RAW (url, seq, href, anchor) rows; both the host derivation and the
degree aggregation are re-expressed in DuckDB SQL over that fixture, so
the relational layer is cross-engine-verified, not just the UDF
plumbing.

Physical shape at 100 TB: the link stage is embarrassingly parallel
(mapInArrow, no shuffle); host resolution is a projection; the degree
aggregation shuffles only (host, url-hash)-sized rows. Relative hrefs
resolve against the page's own host — the common case in boilerplate
navigation — so host cardinality stays near domain cardinality, and the
groupBy key is never skewed beyond the biggest domain (salt if one
domain dominates a crawl; not needed at fixture scale).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_EXPECTED = REPO_ROOT / "fixtures" / "golden" / "expected" / "extract_links.parquet"

_HOST_RE = "^[a-z]+://([^/]+)"


def _pages(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(
        str(REPO_ROOT / "fixtures" / "golden" / "pages_micro.parquet")
    )


def _with_hosts(links: DataFrame) -> DataFrame:
    page_host = F.regexp_extract("url", _HOST_RE, 1)
    href_host = F.when(
        F.col("href").rlike("^[a-z]+://"),
        F.regexp_extract("href", _HOST_RE, 1),
    ).otherwise(page_host)
    return links.withColumn("href_host", href_host).withColumn(
        "is_internal",
        (F.col("href_host") == page_host).cast("int"),
    )


def extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """url, seq, href, anchor, href_host, is_internal — one row per
    anchor of the micro corpus, document order in seq."""
    from pdf_extractor_spark.operators.links import links_stage

    return _with_hosts(links_stage(_pages(spark)))


def link_host_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level in-crawl degree: for every target host, how many
    anchors point at it, from how many distinct pages, at how many
    distinct targets."""
    from pdf_extractor_spark.operators.links import links_stage

    return (
        _with_hosts(links_stage(_pages(spark)))
        .groupBy("href_host")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.countDistinct("url").cast("long").alias("n_pages"),
            F.countDistinct("href").cast("long").alias("n_targets"),
        )
    )


_HOST_CASE_D = (
    f"CASE WHEN regexp_matches(href, '^[a-z]+://') "
    f"THEN regexp_extract(href, '{_HOST_RE}', 1) "
    f"ELSE regexp_extract(url, '{_HOST_RE}', 1) END"
)

EXTRACT_LINKS_SQL = f"""
SELECT url, seq, href, anchor,
       {_HOST_CASE_D} AS href_host,
       CAST({_HOST_CASE_D} = regexp_extract(url, '{_HOST_RE}', 1) AS INT)
         AS is_internal
FROM '{_EXPECTED}'
"""

LINK_HOST_DEGREE_SQL = f"""
SELECT {_HOST_CASE_D} AS href_host,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT url) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT href) AS BIGINT) AS n_targets
FROM '{_EXPECTED}'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Inbound anchor-text aggregation — the classic web-search /
# document-expansion signal (what OTHER sites call a page is a
# higher-precision topic label than the page's own text; production
# pipelines join top inbound anchors back onto the document as side
# features). Runs over the committed CROSS-host link corpus
# (fixtures/linkpages_micro — the golden corpus's hrefs are all
# relative, so it has no external anchors), composed end to end:
# pages -> outlink stage -> external edges -> per-target-host top-K
# anchors.
#
# Physical shape at 100 TB: the (dst_host, anchor) agg shuffles
# host+short-string rows only (never page text); the per-host top-K
# window partitions on dst_host — bounded by each host's distinct
# anchor vocabulary, with the hot-host tail capped by the same window
# discipline as the LSH bucket cap if one host dominates a crawl.
ANCHOR_TOPK = 3


def link_anchor_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pdf_extractor_spark.operators.links import links_stage
    from pdf_extractor_spark.queries.graph import LINKPAGES_FIXTURE

    links = links_stage(
        spark.read.parquet(str(LINKPAGES_FIXTURE))
    )
    page_host = F.regexp_extract("url", _HOST_RE, 1)
    href_host = F.when(
        F.col("href").rlike("^[a-z]+://"),
        F.regexp_extract("href", _HOST_RE, 1),
    ).otherwise(page_host)
    ext = (
        links.select(
            page_host.alias("src_host"),
            href_host.alias("dst_host"),
            F.lower(F.trim(F.col("anchor"))).alias("anchor_norm"),
        )
        .filter("src_host <> dst_host AND anchor_norm <> ''")
    )
    counts = ext.groupBy("dst_host", "anchor_norm").agg(
        F.count("*").cast("long").alias("n_links"),
        F.countDistinct("src_host").cast("long").alias("n_src_hosts"),
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.desc("n_links"), F.desc("n_src_hosts"), F.asc("anchor_norm")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ANCHOR_TOPK)
        .select(
            "dst_host",
            F.col("rk").cast("int").alias("rk"),
            "anchor_norm",
            "n_links",
            "n_src_hosts",
        )
    )


def _link_anchor_topk_sql() -> str:
    from pdf_extractor_spark.queries.graph import _LINKS_EXPECTED

    return f"""
WITH ext AS (
  SELECT regexp_extract(url, '{_HOST_RE}', 1) AS src_host,
         {_HOST_CASE_D} AS dst_host,
         lower(trim(anchor)) AS anchor_norm
  FROM '{_LINKS_EXPECTED}'
  WHERE regexp_extract(url, '{_HOST_RE}', 1) <> {_HOST_CASE_D}
    AND lower(trim(anchor)) <> ''
),
counts AS (
  SELECT dst_host, anchor_norm,
         CAST(count(*) AS BIGINT) AS n_links,
         CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
  FROM ext GROUP BY dst_host, anchor_norm
)
SELECT dst_host, CAST(rk AS INT) AS rk, anchor_norm, n_links, n_src_hosts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY dst_host
    ORDER BY n_links DESC, n_src_hosts DESC, anchor_norm ASC) AS rk
  FROM counts
)
WHERE rk <= {ANCHOR_TOPK}
"""
