"""Exact-substring deletion invariants (cross-engine value parity is
covered by the catalog oracle suite):

- differential vs a plain-Python implementation of the same rule
  (windows as raw token strings — independent of the md5 pipeline):
  keeper = global min (doc_id, idx) per duplicated window, all other
  occurrences' token ranges cut, islands merged; n_before / n_after /
  n_spans_cut / cleaned_text all equal;
- cutting reduces cross-doc duplication: the post-clean corpus has
  strictly fewer duplicated windows than the original (not necessarily
  zero — cut edges create new adjacencies, Lee et al.'s caveat);
- untouched docs pass through byte-identical.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from pdf_extractor_spark.queries.dedup import (
    SUBSTR_W,
    dedup_substring_cut,
    dedup_substring_spans_of,
    substring_cut_of,
)

SF = "/root/testdata/sf0.001"


def _py_cut(texts: dict[int, str]):
    toks = {
        d: [t for t in txt.split(" ") if t] for d, txt in texts.items()
    }
    occ = defaultdict(list)
    for d, tk in sorted(toks.items()):
        for i in range(len(tk) - SUBSTR_W + 1):
            occ[" ".join(tk[i : i + SUBSTR_W])].append((d, i))
    cut_wins = defaultdict(set)
    for lst in occ.values():
        if len({d for d, _ in lst}) >= 2:
            keeper = min(lst)
            for d, i in lst:
                if (d, i) != keeper:
                    cut_wins[d].add(i)
    out = {}
    for d, tk in toks.items():
        wins = sorted(cut_wins.get(d, ()))
        dead = set()
        n_islands = 0
        prev = None
        for i in wins:
            dead.update(range(i, i + SUBSTR_W))
            if prev is None or i != prev + 1:
                n_islands += 1
            prev = i
        kept = [t for j, t in enumerate(tk) if j not in dead]
        # uncut docs pass through byte-identical (never re-joined)
        cleaned = " ".join(kept) if wins else texts[d]
        out[d] = (len(tk), len(kept), n_islands, cleaned)
    return out


def test_equals_python_spec(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    expected = _py_cut(texts)
    got = {
        r["doc_id"]: (
            r["n_tokens_before"],
            r["n_tokens_after"],
            r["n_spans_cut"],
            r["cleaned_text"],
        )
        for r in dedup_substring_cut(spark, SF).collect()
    }
    assert got == expected
    # the corpus exercises the operator: something was actually cut
    assert any(b > a2 for (b, a2, _, _) in expected.values())


def test_cut_reduces_duplication_and_preserves_untouched(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    before = {
        r["doc_id"]: r["n_dup_windows"]
        for r in dedup_substring_spans_of(docs).collect()
    }
    cleaned = substring_cut_of(docs).select(
        "doc_id",
        F.col("cleaned_text").alias("text"),
        "n_spans_cut",
    )
    after = {
        r["doc_id"]: r["n_dup_windows"]
        for r in dedup_substring_spans_of(cleaned).collect()
    }
    assert sum(after.values()) < sum(before.values())
    # untouched docs byte-identical
    orig = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    for r in cleaned.collect():
        if r["n_spans_cut"] == 0:
            assert r["text"] == orig[r["doc_id"]]
