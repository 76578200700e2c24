"""Alternating large-star/small-star connected components
(_alternating_star_cc) vs min-label propagation — two independent
implementations must agree on any graph; the star variant must converge
in O(log n) rounds on the chain graphs where LP needs O(diameter).
Catalog parity for dedup_clusters_star runs in test_queries_oracle."""

from __future__ import annotations

import random

import pytest

from pdf_extractor_spark.queries.dedup import (
    _alternating_star_cc,
    _min_label_propagation,
)


def _run_both(spark, pair_rows, node_ids):
    pairs = spark.createDataFrame(
        pair_rows or [(0, 0)], "doc_a LONG, doc_b LONG"
    )
    if not pair_rows:
        pairs = pairs.filter("doc_a < 0")
    docs = spark.createDataFrame(
        [(i,) for i in node_ids], "doc_id LONG"
    )
    star = {
        (r.doc_id, r.cluster_id)
        for r in _alternating_star_cc(pairs, docs).collect()
    }
    lp = {
        (r.doc_id, r.cluster_id)
        for r in _min_label_propagation(pairs, docs).collect()
    }
    return star, lp


def _brute_cc(pair_rows, node_ids):
    parent = {i: i for i in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in node_ids:
        comp.setdefault(find(i), []).append(i)
    return {(i, min(comp[find(i)])) for i in node_ids}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_star_equals_lp_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    nodes = list(range(n))
    pair_rows = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(40)
    ]
    star, lp = _run_both(spark, pair_rows, nodes)
    assert star == lp == _brute_cc(pair_rows, nodes)


def test_star_handles_long_chain_in_log_rounds(spark):
    # a 120-node path has diameter 119: LP needs ~119 rounds (beyond
    # its MAX_LP_ITERATIONS=64 cap), the star alternation must finish
    # within 10 — this is the whole point of the algorithm
    n = 120
    nodes = list(range(1000, 1000 + n))
    pair_rows = [(nodes[i], nodes[i + 1]) for i in range(n - 1)]
    pairs = spark.createDataFrame(pair_rows, "doc_a LONG, doc_b LONG")
    docs = spark.createDataFrame([(i,) for i in nodes], "doc_id LONG")
    out = _alternating_star_cc(pairs, docs, max_rounds=10).collect()
    assert {(r.doc_id, r.cluster_id) for r in out} == {
        (i, 1000) for i in nodes
    }


def test_star_empty_pairs_all_singletons(spark):
    star, lp = _run_both(spark, [], [5, 6, 7])
    assert star == lp == {(5, 5), (6, 6), (7, 7)}


def test_star_self_loops_and_duplicate_edges(spark):
    pair_rows = [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)]
    star, lp = _run_both(spark, pair_rows, [1, 2, 3])
    assert star == lp == {(1, 1), (2, 1), (3, 3)}
