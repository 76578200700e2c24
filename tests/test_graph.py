"""graph_pagerank: differential vs a plain-Python integer PageRank and
structural sanity on the committed host-graph fixture."""

from __future__ import annotations

import pyarrow.parquet as pq

from pdf_extractor_spark.queries.graph import (
    GRAPH_FIXTURE,
    PR_BASE,
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITER,
    PR_SCALE,
    graph_pagerank_of,
)


def py_pagerank(edges):
    hosts = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {h: PR_SCALE for h in hosts}
    for _ in range(PR_ITER):
        incoming = {h: 0 for h in hosts}
        for s, d in edges:
            incoming[d] += rank[s] // outdeg[s]
        rank = {
            h: PR_BASE + PR_DAMP_NUM * incoming[h] // PR_DAMP_DEN
            for h in hosts
        }
    return rank, outdeg


def test_differential_vs_python_loop(spark):
    tbl = pq.read_table(GRAPH_FIXTURE).to_pylist()
    edges = [(r["src_host"], r["dst_host"]) for r in tbl]
    want_rank, want_deg = py_pagerank(edges)
    df = spark.read.parquet(str(GRAPH_FIXTURE))
    got = {r["host"]: r for r in graph_pagerank_of(df).collect()}
    assert {h: r["rank"] for h, r in got.items()} == want_rank
    assert {h: r["out_degree"] for h, r in got.items()} == {
        h: want_deg.get(h, 0) for h in want_rank
    }


def test_hub_ranks_above_leaf_and_dangling_handled(spark):
    # tiny hand graph: everyone links to hub; hub links to one leaf;
    # lone dangles (no out, no meaningful in)
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r for r in graph_pagerank_of(df).collect()}
    assert got["hub"]["rank"] > got["a"]["rank"] > got["b"]["rank"]
    assert got["b"]["rank"] == got["c"]["rank"]  # symmetric leaves
    assert got["b"]["out_degree"] == 1 and got["hub"]["out_degree"] == 1
    # leaves receive nothing -> fixed point BASE after >1 iteration
    assert got["b"]["rank"] == PR_BASE


def test_link_graph_rank_composition(spark):
    """End-to-end: pages -> links_stage -> host edges -> PageRank. The
    cross-host corpus must yield a non-trivial multi-host graph where
    hub hosts (preferentially linked) outrank leaves."""
    from pdf_extractor_spark.queries.graph import link_graph_rank

    rows = {r["host"]: r for r in link_graph_rank(spark, "").collect()}
    assert len(rows) >= 10          # nearly all 12 hosts participate
    ranks = {h: r["rank"] for h, r in rows.items()}
    # preferential attachment: h00/h01 are linked most -> top ranks
    top3 = sorted(ranks, key=ranks.get, reverse=True)[:3]
    assert "h00.example" in top3
    # every host has either out-edges or a rank above the base floor
    assert all(
        r["out_degree"] > 0 or r["rank"] >= 150_000 for r in rows.values()
    )


def test_frontier_semantics(spark):
    """Frontier invariants: no already-crawled URL is ever proposed,
    every proposed URL is absolute + external, priorities match the
    composed PageRank entry's host ranks, and the top-K cut is the
    deterministic (rank desc, url asc) prefix. The global top-K must
    compile to TakeOrderedAndProject."""
    from pdf_extractor_spark.queries.graph import (
        FRONTIER_K,
        LINKPAGES_FIXTURE,
        frontier_next_urls,
        link_graph_rank,
    )

    rows = frontier_next_urls(spark, "unused").collect()
    assert 0 < len(rows) <= FRONTIER_K
    crawled = {
        r["url"]
        for r in spark.read.parquet(str(LINKPAGES_FIXTURE))
        .select("url")
        .collect()
    }
    ranks = {
        r["host"]: r["rank"] for r in link_graph_rank(spark, "unused").collect()
    }
    for r in rows:
        assert r["url"] not in crawled
        assert r["url"].startswith("https://") or r["url"].startswith(
            "http://"
        )
        assert r["dst_host"] in r["url"]
        assert r["host_rank"] == ranks[r["dst_host"]], r
    # deterministic prefix: sorted by (rank desc, url asc)
    ordered = sorted(rows, key=lambda r: (-r["host_rank"], r["url"]))
    assert ordered == rows or sorted(map(tuple, rows)) == sorted(
        map(tuple, ordered)
    )

    plan = frontier_next_urls(spark, "unused")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
