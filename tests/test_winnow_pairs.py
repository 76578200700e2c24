"""Winnow-pair invariants (cross-engine value parity is covered by the
catalog oracle suite):

- differential vs a plain-Python implementation of the full spec
  (winnow fingerprints, fp-df cap, candidate join, shared-distinct-
  window count, threshold) on the real corpus;
- the guarantee composition: crafted pairs sharing a run of
  WINNOW_NG + WINNOW_K - 1 unique tokens appear in the output with
  n_shared_windows >= WINNOW_K (recall 1.0 for the guaranteed class
  — runs whose K windows are DISTINCT; a degenerate repetitive run is
  the pinned counterexample: its K windows hash identically, so the
  pair fails the distinct-shared-window threshold in the engine, the
  oracle, and the Python spec alike);
- the cap is real: a fingerprint shared by > WINNOW_PAIR_CAP docs
  generates no candidates through that fingerprint (quadratic-key
  protection), mirrored in the Python spec.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from itertools import combinations

from pdf_extractor_spark.queries.textstats import (
    WINNOW_K,
    WINNOW_NG,
    WINNOW_PAIR_CAP,
    dedup_winnow_pairs,
    winnow_pairs_of,
)

SF = "/root/testdata/sf0.001"


def _wins(text: str) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    if len(toks) >= WINNOW_NG:
        return [
            hashlib.md5(
                " ".join(toks[i : i + WINNOW_NG]).encode()
            ).hexdigest()
            for i in range(len(toks) - WINNOW_NG + 1)
        ]
    return [hashlib.md5(text.encode()).hexdigest()]


def _fps(hs: list[str]) -> set[str]:
    if len(hs) < WINNOW_K:
        return {min(hs)}
    return {
        min(hs[i - WINNOW_K + 1 : i + 1])
        for i in range(WINNOW_K - 1, len(hs))
    }


def _py_pairs(texts: dict[int, str]) -> dict[tuple, int]:
    wins = {d: _wins(t) for d, t in texts.items()}
    fps = {d: _fps(h) for d, h in wins.items()}
    df: defaultdict = defaultdict(set)
    for d, f in fps.items():
        for x in f:
            df[x].add(d)
    cand = set()
    for x, ds in df.items():
        if len(ds) <= WINNOW_PAIR_CAP:
            cand.update(
                (a, b) for a, b in combinations(sorted(ds), 2)
            )
    out = {}
    for a, b in cand:
        n = len(set(wins[a]) & set(wins[b]))
        if n >= WINNOW_K:
            out[(a, b)] = n
    return out


def test_equals_python_spec(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    expected = _py_pairs(texts)
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_windows"]
        for r in dedup_winnow_pairs(spark, SF).collect()
    }
    assert got == expected


def test_guaranteed_run_pairs_always_found(spark):
    run = " ".join(f"r{i}" for i in range(WINNOW_NG + WINNOW_K - 1))
    cases = [
        (1, f"alpha beta gamma delta {run} omega psi chi phi"),
        (2, f"{run} uno dos tres cuatro cinco seis siete ocho"),
        (3, "unrelated words entirely here with nothing shared at all"),
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_windows"]
        for r in winnow_pairs_of(docs).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= WINNOW_K
    assert all(3 not in pair for pair in got)


def test_repetitive_run_is_outside_the_guarantee(spark):
    """A shared run of NG + K - 1 IDENTICAL tokens produces K windows
    with the SAME hash: the pair shares a fingerprint (candidate stage
    finds it) but only 1 distinct window, so the verify threshold
    drops it — the guarantee class is runs with K distinct windows,
    not all runs of that length. Engine and Python spec agree."""
    run = " ".join(["a"] * (WINNOW_NG + WINNOW_K - 1))
    cases = [
        (1, f"alpha beta gamma delta {run} omega psi chi phi"),
        (2, f"{run} uno dos tres cuatro cinco seis siete ocho"),
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_windows"]
        for r in winnow_pairs_of(docs).collect()
    }
    assert (1, 2) not in got  # dropped: 1 distinct shared window < K
    assert got == _py_pairs({d: t for d, t in cases})


def test_hot_fingerprint_capped(spark):
    # WINNOW_PAIR_CAP + 2 docs all equal: every fingerprint's df is
    # over the cap, so candidate generation must yield nothing
    n = WINNOW_PAIR_CAP + 2
    text = " ".join(f"t{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    assert winnow_pairs_of(docs).count() == 0
    # and the Python spec agrees (the cap is part of the contract)
    assert _py_pairs({i: text for i in range(n)}) == {}
