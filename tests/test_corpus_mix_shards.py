"""Semantics for the corpus mix report and the deterministic
shuffle-shard export ordering (queries/corpus_select.py). Oracle parity
at sf0.001 is covered by tests/test_queries_oracle.py.
"""

from __future__ import annotations

import duckdb

from pdf_extractor_spark.queries.corpus_select import (
    N_SHARDS,
    corpus_mix_report,
    corpus_shuffle_shards,
)

SF = "/root/testdata/sf0.001"


def test_mix_report_is_a_partition_of_the_corpus(spark):
    rows = corpus_mix_report(spark, SF).collect()
    n_total = duckdb.sql(
        f"SELECT count(*), sum(len(list_filter(string_split(text, ' '), "
        f"t -> t <> ''))) FROM '{SF}/documents.parquet'"
    ).fetchone()
    assert sum(r["n_docs"] for r in rows) == n_total[0]
    assert sum(r["sum_tokens"] for r in rows) == n_total[1]
    # shares are 5-dp rounded fractions of one exact total
    share_sum = sum(r["token_share"] for r in rows)
    assert abs(share_sum - 1.0) < len(rows) * 1e-5
    assert all(0.0 <= r["mean_quality"] <= 1.0 for r in rows)


def test_shuffle_shards_cover_every_doc_once(spark):
    rows = corpus_shuffle_shards(spark, SF).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 500
    assert all(0 <= r["shard"] < N_SHARDS for r in rows)


def test_shuffle_positions_contiguous_per_shard(spark):
    rows = corpus_shuffle_shards(spark, SF).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shuffle_is_deterministic_and_mixing(spark):
    a = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in corpus_shuffle_shards(spark, SF).collect()
    }
    b = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in corpus_shuffle_shards(spark, SF).collect()
    }
    assert a == b
    # the hash order must actually mix: within a shard, consecutive
    # positions must not be consecutive doc_ids (sorted-by-id export
    # is the failure mode this operator exists to prevent)
    rows = sorted((shard, pos, doc_id) for doc_id, shard, pos in a)
    adjacent_sequential = sum(
        1
        for (s1, p1, d1), (s2, p2, d2) in zip(rows, rows[1:])
        if s1 == s2 and p2 == p1 + 1 and d2 == d1 + 1
    )
    assert adjacent_sequential < len(rows) * 0.05
