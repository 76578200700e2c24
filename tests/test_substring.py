"""dedup_substring_spans vs a brute-force plain-Python reimplementation
(independent of both SQL engines): overlapping W-token windows,
cross-doc duplicated-window detection, and longest consecutive
duplicated run — exact agreement on every document."""

from __future__ import annotations

import collections

import duckdb

from pdf_extractor_spark.queries.dedup import (
    SUBSTR_MIN_DOCS,
    SUBSTR_STRIDE,
    SUBSTR_W,
    dedup_substring_spans,
    dedup_substring_strided,
)

SF = "/root/testdata/sf0.001"


def _python_spans(stride: int = 1) -> dict[int, tuple[int, int, int, int]]:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    wins: dict[int, list[str]] = {}
    seen_docs: dict[str, set[int]] = collections.defaultdict(set)
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        ws = [
            " ".join(toks[i : i + SUBSTR_W])
            for i in range(0, len(toks) - SUBSTR_W + 1, stride)
        ]
        wins[doc_id] = ws
        for w in set(ws):
            seen_docs[w].add(doc_id)
    dup = {w for w, ds in seen_docs.items() if len(ds) >= SUBSTR_MIN_DOCS}
    out = {}
    for doc_id, ws in wins.items():
        if not ws:
            continue  # docs shorter than W have no windows (absent)
        flags = [w in dup for w in ws]
        best = run = 0
        for f in flags:
            run = run + 1 if f else 0
            best = max(best, run)
        n_dup = sum(flags)
        out[doc_id] = (
            len(ws),
            n_dup,
            n_dup * 1000 // len(ws),
            (best - 1) * stride + SUBSTR_W if best else 0,
        )
    return out


def test_substring_spans_match_python(spark):
    want = _python_spans()
    got = {
        r["doc_id"]: (
            r["n_windows"],
            r["n_dup_windows"],
            r["dup_pm"],
            r["max_dup_run_tokens"],
        )
        for r in dedup_substring_spans(spark, SF).collect()
    }
    assert got == want
    # the corpus genuinely exercises the operator: duplicated spans and
    # multi-window runs both exist
    assert any(v[1] > 0 for v in want.values())
    assert any(v[3] > SUBSTR_W for v in want.values())


def test_substring_strided_matches_python(spark):
    """The stride>1 production form vs the same plain-Python spec run
    at that stride — plus the structural relations vs stride 1: 1/s of
    the windows, and a strided dup window is always a stride-1 dup
    window (its hash set is a subset), so dup detection can only
    shrink."""
    want = _python_spans(SUBSTR_STRIDE)
    got = {
        r["doc_id"]: (
            r["n_windows"],
            r["n_dup_windows"],
            r["dup_pm"],
            r["max_dup_run_tokens"],
        )
        for r in dedup_substring_strided(spark, SF).collect()
    }
    assert got == want
    full = _python_spans(1)
    for doc_id, (nw, nd, _, _) in want.items():
        fnw, fnd, _, _ = full[doc_id]
        assert nw == (fnw - 1) // SUBSTR_STRIDE + 1
        assert nd <= fnd
    # still non-trivial at stride 4 on this corpus
    assert any(v[1] > 0 for v in want.values())
