"""Differential + invariant tests for corpus_pack_sequences (GPT-style
concat-and-chop packing manifest)."""

from __future__ import annotations

import random

from pdf_extractor_spark.queries.corpus_select import (
    SEQ_LEN,
    corpus_pack_sequences_of,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return corpus_pack_sequences_of(df).collect()


def test_manifest_matches_python_packing_loop(spark):
    """The relational prefix-sum manifest must equal a plain-Python
    sequential packing of each shard's token stream."""
    rng = random.Random(17)
    rows = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(1, 120))))
        for i in range(400)
    ]
    out = _run(spark, rows)

    # rebuild each shard stream in (h-order) from the manifest itself:
    # pos is authoritative for order; recompute tok_start sequentially
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    n_tokens = {doc_id: len(text.split()) for doc_id, text in rows}
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["pos"])
        cursor = 0
        for r in docs:
            cost = n_tokens[r["doc_id"]] + 1  # +1 EOS
            assert r["n_tokens_eos"] == cost
            assert r["tok_start"] == cursor, (shard, r["doc_id"])
            assert r["seq_first"] == cursor // SEQ_LEN
            assert r["seq_last"] == (cursor + cost - 1) // SEQ_LEN
            assert r["offset_in_seq"] == cursor % SEQ_LEN
            assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
            cursor += cost


def test_stream_has_no_gaps_and_seqs_are_covered(spark):
    """Every token position in a shard's stream belongs to exactly one
    document, and sequence indices are contiguous from 0."""
    rows = [(i, " ".join(["tok"] * (7 + (i * 13) % 90))) for i in range(200)]
    out = _run(spark, rows)
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["pos"])
        total = sum(r["n_tokens_eos"] for r in docs)
        assert docs[0]["tok_start"] == 0
        assert docs[-1]["tok_start"] + docs[-1]["n_tokens_eos"] == total
        seqs = set()
        for r in docs:
            seqs.update(range(r["seq_first"], r["seq_last"] + 1))
        assert seqs == set(range((total + SEQ_LEN - 1) // SEQ_LEN))


def test_determinism_under_repartition(spark):
    """The manifest is a pure function of the data — identical under a
    different input partitioning (cluster-size independence)."""
    rows = [(i, " ".join(["x"] * (5 + i % 40))) for i in range(100)]
    a = {r["doc_id"]: r for r in _run(spark, rows)}
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)
    b = {r["doc_id"]: r for r in corpus_pack_sequences_of(df).collect()}
    assert a == b
