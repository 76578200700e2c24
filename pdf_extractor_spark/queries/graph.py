"""Host-graph centrality — integer-exact PageRank over the crawl's
host-level link graph, the signal RefinedWeb/Common-Crawl-style
pipelines use to filter URLs by domain reputation before any content
pass (the link_host_degree entry feeds the edges at production scale;
the committed fixture supplies a skewed graph with hubs, dangling
hosts and sink-only hosts for the gate).

Why integer-exact: classical double-precision PageRank sums are
addition-order-dependent, so a cross-engine hash gate would flake.
This formulation keeps every quantity a BIGINT:

    rank_0(h)   = SCALE                      (SCALE = 1_000_000)
    contrib(e)  = rank_i(src) DIV outdeg(src)      -- integer floor
    rank_{i+1}(h) = BASE + DAMP_NUM * sum(contrib into h) DIV DAMP_DEN

with BASE = (1-d)·SCALE = 150_000, d = DAMP_NUM/DAMP_DEN = 85/100,
N_ITER = 3 fixed. Floor-per-edge then integer sum is order-free, so
Spark and DuckDB agree bit-for-bit. Dangling mass is dropped (not
redistributed) — documented trade-off, deterministic both sides.

Physical shape at 100 TB: each iteration is one hash agg on dst_host +
one join of the (host, rank) table (tiny: hosts ≪ pages) against the
static edge table — the edge table partitioning is reusable across
iterations, and the rank table is broadcastable at real-world host
cardinality (~10^8 hosts × 16 B ≪ executor memory is borderline; the
join is keyed so AQE picks broadcast vs shuffle). The loop is a fixed
unrolled plan (N_ITER joins), not a driver-side collect loop.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
GRAPH_FIXTURE = REPO_ROOT / "fixtures" / "hostgraph_micro.parquet"

PR_SCALE = 1_000_000
PR_BASE = 150_000
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100
PR_ITER = 3


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph_pagerank_of(spark.read.parquet(str(GRAPH_FIXTURE)))


def graph_pagerank_of(edges: DataFrame) -> DataFrame:
    """host, out_degree, rank — integer PageRank after PR_ITER
    iterations over (src_host, dst_host) edges."""
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    outdeg = edges.groupBy("src_host").agg(
        F.count("*").cast("long").alias("out_degree")
    )
    ranks = hosts.withColumn("rank", F.lit(PR_SCALE).cast("long"))
    for _ in range(PR_ITER):
        contrib = (
            edges.join(ranks, edges.src_host == ranks.host)
            .join(outdeg, "src_host")
            .select(
                F.col("dst_host").alias("host"),
                F.expr("rank DIV out_degree").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = (
            hosts.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit(PR_BASE)
                    + F.expr(
                        f"{PR_DAMP_NUM} * coalesce(incoming, 0)"
                        f" DIV {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return (
        ranks.join(outdeg, ranks.host == outdeg.src_host, "left")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).cast("long").alias(
                "out_degree"
            ),
            "rank",
        )
    )


def _iter_cte(i: int) -> str:
    prev = f"r{i}"
    return f"""
r{i + 1} AS (
  SELECT h.host,
         CAST({PR_BASE} + {PR_DAMP_NUM} * coalesce(c.incoming, 0)
              // {PR_DAMP_DEN} AS BIGINT) AS rank
  FROM hosts h
  LEFT JOIN (
    SELECT e.dst_host AS host,
           sum(p.rank // o.out_degree) AS incoming
    FROM edges e
    JOIN {prev} p ON e.src_host = p.host
    JOIN outdeg o ON e.src_host = o.src_host
    GROUP BY e.dst_host
  ) c ON h.host = c.host
)"""


def _pagerank_sql(edges_sql: str) -> str:
    """The full PageRank oracle query over an arbitrary edges
    subquery (src_host, dst_host) — shared by the fixture entry and
    the composed links → host-graph entry."""
    return f"""
WITH edges AS ({edges_sql}),
hosts AS (
  SELECT src_host AS host FROM edges
  UNION
  SELECT dst_host FROM edges
),
outdeg AS (
  SELECT src_host, CAST(count(*) AS BIGINT) AS out_degree
  FROM edges GROUP BY src_host
),
r0 AS (SELECT host, CAST({PR_SCALE} AS BIGINT) AS rank FROM hosts),
{", ".join(_iter_cte(i).strip() for i in range(PR_ITER))}
SELECT h.host,
       CAST(coalesce(o.out_degree, 0) AS BIGINT) AS out_degree,
       r.rank
FROM hosts h
JOIN r{PR_ITER} r ON h.host = r.host
LEFT JOIN outdeg o ON h.host = o.src_host
"""


GRAPH_PAGERANK_SQL = _pagerank_sql(f"SELECT * FROM '{GRAPH_FIXTURE}'")


# --------------------------------------------------------------------------
# The composed end-to-end form: pages → outlink stage → host edges →
# PageRank, over a committed CROSS-host link corpus (the golden micro
# corpus's hrefs are all relative, so its host graph is self-edges
# only). This is the production wiring: extract_links feeds the edge
# table the centrality filter ranks.
LINKPAGES_FIXTURE = REPO_ROOT / "fixtures" / "linkpages_micro.parquet"
_LINKS_EXPECTED = (
    REPO_ROOT / "fixtures" / "golden" / "expected"
    / "link_graph_links.parquet"
)


def link_graph_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_extractor_spark.operators.links import links_stage
    from pdf_extractor_spark.queries.links import _HOST_RE

    links = links_stage(spark.read.parquet(str(LINKPAGES_FIXTURE)))
    page_host = F.regexp_extract("url", _HOST_RE, 1)
    href_host = F.when(
        F.col("href").rlike("^[a-z]+://"),
        F.regexp_extract("href", _HOST_RE, 1),
    ).otherwise(page_host)
    edges = (
        links.select(
            page_host.alias("src_host"), href_host.alias("dst_host")
        )
        .filter("src_host <> dst_host")
        .distinct()
    )
    return graph_pagerank_of(edges)


def _link_graph_rank_sql() -> str:
    from pdf_extractor_spark.queries.links import _HOST_CASE_D, _HOST_RE

    return _pagerank_sql(f"""
  SELECT DISTINCT regexp_extract(url, '{_HOST_RE}', 1) AS src_host,
         {_HOST_CASE_D} AS dst_host
  FROM '{_LINKS_EXPECTED}'
  WHERE regexp_extract(url, '{_HOST_RE}', 1) <> {_HOST_CASE_D}
""")


# --------------------------------------------------------------------------
# Crawl-frontier priority — the composed "what to fetch next" step a
# crawler runs every cycle: collected outlinks, minus everything
# already crawled, ranked by the target host's PageRank (domain
# reputation). Composes three existing arms end to end: outlink stage
# -> host-graph PageRank -> anti-join against the crawled set ->
# global top-K.
#
# Physical shape at 10^12 pages: candidates are DISTINCT (href, host)
# pairs (URL-keyed hash agg); the crawled-set anti-join is the same
# left-anti resume shape as the extract plan; the rank join's right
# side is the tiny host table; and the global top-K compiles to
# TakeOrderedAndProject (per-task K-heaps, K rows to the driver —
# plan-asserted), never a global sort.
FRONTIER_K = 25


def frontier_next_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_extractor_spark.operators.links import links_stage
    from pdf_extractor_spark.queries.links import _HOST_RE

    pages = spark.read.parquet(str(LINKPAGES_FIXTURE))
    links = links_stage(pages)
    page_host = F.regexp_extract("url", _HOST_RE, 1)
    href_host = F.when(
        F.col("href").rlike("^[a-z]+://"),
        F.regexp_extract("href", _HOST_RE, 1),
    ).otherwise(page_host)
    ext = links.select(
        "href",
        page_host.alias("src_host"),
        href_host.alias("dst_host"),
    ).filter("src_host <> dst_host AND href rlike '^[a-z]+://'")
    ranks = graph_pagerank_of(
        ext.select("src_host", "dst_host").distinct()
    ).select(F.col("host").alias("dst_host"), F.col("rank").alias(
        "host_rank"
    ))
    crawled = pages.select("url").distinct()
    cand = (
        ext.select(F.col("href").alias("url"), "dst_host")
        .distinct()
        .join(crawled, on="url", how="left_anti")
        .join(ranks, on="dst_host")
    )
    return (
        cand.orderBy(F.desc("host_rank"), F.asc("url"))
        .limit(FRONTIER_K)
        .select("url", "dst_host", "host_rank")
    )


def _frontier_sql() -> str:
    from pdf_extractor_spark.queries.links import _HOST_CASE_D, _HOST_RE

    edges_sql = f"""
  SELECT DISTINCT regexp_extract(url, '{_HOST_RE}', 1) AS src_host,
         {_HOST_CASE_D} AS dst_host
  FROM '{_LINKS_EXPECTED}'
  WHERE regexp_extract(url, '{_HOST_RE}', 1) <> {_HOST_CASE_D}
    AND regexp_matches(href, '^[a-z]+://')
"""
    return f"""
WITH pr AS (SELECT * FROM ({_pagerank_sql(edges_sql)})),
cand AS (
  SELECT DISTINCT href AS url, {_HOST_CASE_D} AS dst_host
  FROM '{_LINKS_EXPECTED}'
  WHERE regexp_extract(url, '{_HOST_RE}', 1) <> {_HOST_CASE_D}
    AND regexp_matches(href, '^[a-z]+://')
    AND href NOT IN
      (SELECT url FROM '{LINKPAGES_FIXTURE}')
)
SELECT c.url, c.dst_host, p.rank AS host_rank
FROM cand c JOIN pr p ON c.dst_host = p.host
ORDER BY p.rank DESC, c.url ASC
LIMIT {FRONTIER_K}
"""
