"""The capstone corpus-construction job: extract warehouse → features →
gate → near-dup dedup → stratified sample → JSONL, end to end, twice
(determinism)."""

from __future__ import annotations

import gzip
import json
import pathlib

from pdf_extractor_spark.corpus.build import write_pages_parquet
from pdf_extractor_spark.jobs.corpus_job import build_corpus
from pdf_extractor_spark.plans.extract_plan import run_extract
from pdf_extractor_spark.sources.pages import ingest_corpus_to_icetable


def _read_jsonl(out: str) -> list[dict]:
    rows = []
    for f in sorted(pathlib.Path(out).glob("part-*.json.gz")):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            rows.extend(json.loads(line) for line in fh)
    return rows


def test_corpus_job_end_to_end(spark, tmp_path):
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=11, n_rows=150, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out1 = str(tmp_path / "corpus1")
    s1 = build_corpus(spark, wh, out1, budget=10)

    # funnel is monotone and ends at the exported row count
    assert (
        s1["rows_in"]
        >= s1["rows_clean"]
        >= s1["rows_gated"]
        >= s1["rows_survivors"]
        >= s1["rows_exported"]
        > 0
    )
    rows = _read_jsonl(out1)
    assert len(rows) == s1["rows_exported"]
    # output invariants: unique urls, budget respected per stratum,
    # every row carries the full delivery schema
    urls = [r["url"] for r in rows]
    assert len(set(urls)) == len(urls)
    per_stratum: dict = {}
    for r in rows:
        assert set(r) == {
            "url", "ts", "text", "lang_pred", "quality",
            "quality_band", "sample_rank",
        }
        assert r["text"] and "\n" not in r["text"]
        k = (r["lang_pred"], r["quality_band"])
        per_stratum[k] = per_stratum.get(k, 0) + 1
    assert all(n <= 10 for n in per_stratum.values())

    # summary sidecar matches the printed summary
    side = json.loads((pathlib.Path(out1) / "_SUMMARY.json").read_text())
    assert side["rows_exported"] == s1["rows_exported"]

    # determinism: a second run over the same table yields the SAME rows
    out2 = str(tmp_path / "corpus2")
    s2 = build_corpus(spark, wh, out2, budget=10)
    assert s2["rows_exported"] == s1["rows_exported"]
    a = sorted(json.dumps(r, sort_keys=True) for r in rows)
    b = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out2))
    assert a == b


def test_corpus_job_recrawled_urls_stay_unique(spark, tmp_path):
    """A url extracted into TWO partitions (re-crawl / incremental
    append) must not multiply through the doc_id joins: the job
    canonicalizes to one row per url (latest crawl wins) before
    anything keyed on doc_id runs."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.tables.icetable import IceTable

    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=11, n_rows=120, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    # simulate a re-crawl: re-append 30 already-extracted urls under a
    # later partition date
    tbl = IceTable(f"{wh}/extracted")
    dup = (
        tbl.read(spark)
        .orderBy("url")
        .limit(30)
        .withColumn("partition_date", F.lit("2099-01-01"))
    )
    tbl.append(dup)

    out = str(tmp_path / "corpus")
    s = build_corpus(spark, wh, out, budget=10)
    rows = _read_jsonl(out)
    urls = [r["url"] for r in rows]
    assert len(set(urls)) == len(urls)
    assert s["rows_clean"] <= 120  # one row per url despite the re-crawl


def test_funnel_counts_never_rescan_warehouse(spark, tmp_path, monkeypatch):
    """Round-4 (VERDICT r3 #6): rows_in/rows_clean ride the single
    warehouse pass as Observation metrics. Regression guard: no
    DataFrame.count() executed during build_corpus may have the
    warehouse scan in its plan (the old code ran raw.count() and
    docs.count(), re-executing the scan+window pipeline twice just for
    lineage numbers)."""
    import pyspark.sql as pssql

    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=12, n_rows=80, n_days=2)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    offending: list[str] = []
    orig_count = pssql.DataFrame.count

    def counting(self):
        plan = self._jdf.queryExecution().analyzed().toString()
        if "wh/extracted" in plan:
            offending.append(plan[:400])
        return orig_count(self)

    monkeypatch.setattr(pssql.DataFrame, "count", counting)
    out = str(tmp_path / "corpus")
    s = build_corpus(spark, wh, out, budget=10)
    assert s["rows_in"] > 0 and s["rows_in"] >= s["rows_clean"] > 0
    assert not offending, offending[0] if offending else ""
    # the observed funnel numbers match an independent recount
    monkeypatch.setattr(pssql.DataFrame, "count", orig_count)
    from pdf_extractor_spark.tables.icetable import IceTable

    raw = IceTable(f"{wh}/extracted").read(spark)
    assert s["rows_in"] == raw.count()
    clean = raw.filter(
        "coalesce(error, '') = '' AND n_chars >= 1"
    ).select("url").distinct().count()
    assert s["rows_clean"] == clean


def test_corpus_job_benchmark_and_mixed_shards(spark, tmp_path):
    """The optional composition stages: --benchmark drops survivors
    overlapping the eval set before sampling; --mix-shards exports
    deterministically hash-mixed shards whose per-file contents are
    rerun-identical."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=13, n_rows=150, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out0 = str(tmp_path / "plain")
    s0 = build_corpus(spark, wh, out0, budget=10)
    rows0 = _read_jsonl(out0)
    assert s0["rows_decontaminated"] == s0["rows_survivors"]

    # benchmark = one exported doc's text -> that url must disappear
    victim = rows0[0]
    bench = tmp_path / "bench.jsonl"
    bench.write_text(json.dumps({"text": victim["text"]}) + "\n")
    out1 = str(tmp_path / "decon")
    s1 = build_corpus(spark, wh, out1, budget=10, benchmark=str(bench))
    assert s1["rows_decontaminated"] < s1["rows_survivors"]
    assert (
        s1["rows_survivors"]
        >= s1["rows_decontaminated"]
        >= s1["rows_exported"]
    )
    assert victim["url"] not in {r["url"] for r in _read_jsonl(out1)}

    # mixed-shard export: same row set as the plain run, N part files,
    # and a rerun reproduces every file's internal order byte-for-byte
    def shard_contents(out):
        return [
            (f.name, f.read_bytes())
            for f in sorted(pathlib.Path(out).glob("part-*.json.gz"))
        ]

    out2 = str(tmp_path / "mixed1")
    out3 = str(tmp_path / "mixed2")
    build_corpus(spark, wh, out2, budget=10, mix_shards=2)
    build_corpus(spark, wh, out3, budget=10, mix_shards=2)
    assert len(shard_contents(out2)) == 2
    # every shard must actually carry documents: partitioning by a
    # precomputed residue collapsed all rows into ONE shard (murmur3 of
    # the N residues collides mod N), which this assertion catches
    shard_rows = []
    for f in sorted(pathlib.Path(out2).glob("part-*.json.gz")):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            shard_rows.append(sum(1 for _ in fh))
    assert min(shard_rows) > 0, shard_rows
    assert max(shard_rows) < sum(shard_rows), shard_rows
    a = [c for _, c in shard_contents(out2)]
    b = [c for _, c in shard_contents(out3)]
    assert a == b
    assert sorted(
        json.dumps(r, sort_keys=True) for r in _read_jsonl(out2)
    ) == sorted(json.dumps(r, sort_keys=True) for r in rows0)


def test_corpus_job_line_dedup(spark, tmp_path):
    """--line-dedup: the funnel gains the segment-strip stage (run over
    the gated checkpoint), stays monotone and deterministic, and the
    flag's summary keys are present and consistent."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=23, n_rows=120, n_days=2)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out1 = str(tmp_path / "c1")
    out2 = str(tmp_path / "c2")
    s1 = build_corpus(spark, wh, out1, budget=10, line_dedup=True)
    assert s1["rows_gated"] >= s1["rows_line_cleaned"] >= s1["rows_survivors"]
    assert s1["boiler_segments_removed"] >= 0
    assert s1["rows_exported"] > 0

    # deterministic rerun: identical exported row set
    s2 = build_corpus(spark, wh, out2, budget=10, line_dedup=True)
    assert s1["rows_exported"] == s2["rows_exported"]
    r1 = {(r["url"], r["text"]) for r in _read_jsonl(out1)}
    r2 = {(r["url"], r["text"]) for r in _read_jsonl(out2)}
    assert r1 == r2

    # the flag off keeps the legacy funnel shape (no strip stage)
    out3 = str(tmp_path / "c3")
    s3 = build_corpus(spark, wh, out3, budget=10)
    assert s3["rows_line_cleaned"] == s3["rows_gated"]
    assert s3["boiler_segments_removed"] == 0


def test_corpus_job_intradoc(spark, tmp_path):
    """--intradoc: the within-document strip stage composes with (and
    runs before) the cross-document passes; funnel stays monotone,
    deterministic, and the flag off keeps the legacy shape."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=29, n_rows=120, n_days=2)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out1 = str(tmp_path / "c1")
    out2 = str(tmp_path / "c2")
    s1 = build_corpus(
        spark, wh, out1, budget=10, intradoc=True, line_dedup=True
    )
    assert (
        s1["rows_gated"]
        >= s1["rows_intradoc_cleaned"]
        >= s1["rows_line_cleaned"]
        >= s1["rows_survivors"]
    )
    assert s1["intradoc_segments_removed"] >= 0
    assert s1["rows_exported"] > 0

    s2 = build_corpus(
        spark, wh, out2, budget=10, intradoc=True, line_dedup=True
    )
    r1 = {(r["url"], r["text"]) for r in _read_jsonl(out1)}
    r2 = {(r["url"], r["text"]) for r in _read_jsonl(out2)}
    assert r1 == r2

    out3 = str(tmp_path / "c3")
    s3 = build_corpus(spark, wh, out3, budget=10)
    assert s3["rows_intradoc_cleaned"] == s3["rows_gated"]
    assert s3["intradoc_segments_removed"] == 0


def test_corpus_job_incremental_seen_index(spark, tmp_path):
    """The daily-incremental shape: run 1 creates the seen-index from
    its export; run 2 over the SAME warehouse drops every previously
    exported doc via the Bloom probe (no false negatives -> every
    re-crawl is caught) and exports only previously-unkept survivors;
    run 3 (index now covers both exports) keeps dropping monotonically
    and never re-exports a url."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=23, n_rows=150, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)
    idx = str(tmp_path / "seen_idx")

    s1 = build_corpus(
        spark, wh, str(tmp_path / "c1"), budget=10, seen_index=idx
    )
    assert s1["seen_index"] == "created"
    assert s1["rows_seen_dropped"] == 0
    assert (pathlib.Path(idx) / "bloom.bin").exists()
    u1 = {r["url"] for r in _read_jsonl(str(tmp_path / "c1"))}
    assert u1

    s2 = build_corpus(
        spark, wh, str(tmp_path / "c2"), budget=10, seen_index=idx
    )
    assert s2["seen_index"] == "updated"
    # every run-1 export is shingle-identical to itself -> seen_pm =
    # 1000 -> dropped before near-dup; nothing exported twice
    assert s2["rows_seen_dropped"] >= len(u1)
    u2 = {r["url"] for r in _read_jsonl(str(tmp_path / "c2"))}
    assert not (u1 & u2)

    s3 = build_corpus(
        spark, wh, str(tmp_path / "c3"), budget=10, seen_index=idx
    )
    u3 = {r["url"] for r in _read_jsonl(str(tmp_path / "c3"))}
    assert s3["rows_seen_dropped"] >= s2["rows_seen_dropped"]
    assert not (u3 & (u1 | u2))


def test_corpus_job_substring_cut(spark, tmp_path):
    """--substring-cut: the exact-substring deletion stage composes
    after the segment passes; funnel stays monotone and deterministic;
    spans/tokens counters are consistent; the flag off keeps the
    legacy shape. Also pins that the operator runs on the job's
    STRUCT (hi, lo) doc keys (struct-min keeper, struct grouping)."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=31, n_rows=120, n_days=2)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out1 = str(tmp_path / "c1")
    out2 = str(tmp_path / "c2")
    s1 = build_corpus(spark, wh, out1, budget=10, substring_cut=True)
    assert (
        s1["rows_gated"]
        >= s1["rows_substr_cleaned"]
        >= s1["rows_survivors"]
    )
    assert s1["substr_spans_removed"] >= 0
    # a cut span removes at least W tokens; zero spans means zero toks
    if s1["substr_spans_removed"] == 0:
        assert s1["substr_tokens_removed"] == 0
    else:
        assert s1["substr_tokens_removed"] >= s1["substr_spans_removed"]
    assert s1["rows_exported"] > 0

    s2 = build_corpus(spark, wh, out2, budget=10, substring_cut=True)
    r1 = {(r["url"], r["text"]) for r in _read_jsonl(out1)}
    r2 = {(r["url"], r["text"]) for r in _read_jsonl(out2)}
    assert r1 == r2

    out3 = str(tmp_path / "c3")
    s3 = build_corpus(spark, wh, out3, budget=10)
    assert s3["rows_substr_cleaned"] == s3["rows_gated"]
    assert s3["substr_spans_removed"] == 0
    assert s3["substr_tokens_removed"] == 0


def test_corpus_job_mix_budget_waterfill(spark, tmp_path):
    """--mix-budget N: per-source (url host) doc budgets derive from
    the exact-integer token waterfill over surviving token mass;
    selection is deterministic hash-order; funnel carries the mix
    block; export schema unchanged."""
    import gzip as _gz

    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=17, n_rows=150, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    # measure surviving token mass once via an unbudgeted run, then
    # budget ~60% of it so the waterfill is a REAL constraint
    out0 = str(tmp_path / "m0")
    build_corpus(spark, wh, out0, budget=10**6)
    total_toks = sum(
        len([t for t in r["text"].split(" ") if t])
        for r in _read_jsonl(out0)
    )
    budget = int(total_toks * 0.6)

    out1 = str(tmp_path / "m1")
    s1 = build_corpus(spark, wh, out1, mix_budget=budget)
    mix = s1["mix"]
    assert mix["budget_tokens"] == budget
    assert 0 < mix["alloc_tokens"] <= budget
    assert mix["sources"] > 1  # the waterfill has real input
    assert 0 <= mix["saturated"] <= mix["sources"]
    assert s1["rows_exported"] == mix["alloc_docs"] > 0
    rows = _read_jsonl(out1)
    assert len(rows) == s1["rows_exported"]
    for r in rows:
        assert set(r) == {
            "url", "ts", "text", "lang_pred", "quality",
            "quality_band", "sample_rank",
        }
    # fewer docs than the unbudgeted corpus (the budget binds)
    assert s1["rows_exported"] < len(_read_jsonl(out0))

    # determinism: identical re-run
    out2 = str(tmp_path / "m2")
    s2 = build_corpus(spark, wh, out2, mix_budget=budget)
    a = sorted(json.dumps(r, sort_keys=True) for r in rows)
    b = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out2))
    assert a == b and s2["mix"] == mix


def test_corpus_job_drift_gate(spark, tmp_path):
    """--drift-check: an export gated against an identical previous
    export passes with zero new mass and chi2 0; a previous export
    with disjoint vocabulary trips the gate and nothing is written."""
    import gzip as _gz

    import pytest

    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=23, n_rows=120, n_days=2)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out1 = str(tmp_path / "d1")
    build_corpus(spark, wh, out1, budget=10)

    # same warehouse, gated against its own previous export: identical
    # unigram distribution -> residuals all zero -> chi2 == 0.0 and no
    # new mass at all
    out2 = str(tmp_path / "d2")
    s2 = build_corpus(spark, wh, out2, budget=10, drift_check=out1)
    assert s2["drift"]["new_mass_pm"] == 0
    assert s2["drift"]["chi2"] == 0.0
    assert s2["rows_exported"] > 0

    # a fabricated prior export with disjoint vocabulary: every batch
    # token is unseen -> 1000 per-mille -> the gate raises and the out
    # dir holds no export
    fake = tmp_path / "fake_prev"
    fake.mkdir()
    with _gz.open(fake / "part-000.json.gz", "wt", encoding="utf-8") as f:
        for i in range(30):
            f.write(json.dumps({"text": f"zzz{i} yyy{i} xxx{i}"}) + "\n")
    out3 = tmp_path / "d3"
    with pytest.raises(RuntimeError, match="drift gate"):
        build_corpus(
            spark, wh, str(out3), budget=10, drift_check=str(fake)
        )
    assert not list(out3.glob("part-*.json.gz"))


def _is_line_subseq(groups: list[list[str]], toks: list[str]) -> bool:
    """True iff toks == concatenation of a subsequence of the token
    groups (one group per original line) — i.e. the cleaning only ever
    removed WHOLE lines, in order."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def f(i: int, p: int) -> bool:
        if p == len(toks):
            return True  # remaining groups are all skippable
        if i == len(groups):
            return False
        if f(i + 1, p):  # skip line i
            return True
        g = groups[i]
        return toks[p:p + len(g)] == g and f(i + 1, p + len(g))

    return f(0, 0)


def test_corpus_job_line_mode_newline(spark, tmp_path):
    """--line-mode newline: the line stages run on a line-PRESERVING
    canonical twin of the extracted text (the job's single-line
    canonicalization would otherwise erase the newlines the segmenter
    needs), then re-collapse for downstream. Real boilerplate lines are
    stripped (funnel > 0 — token mode finds none on this corpus's
    gated set); every exported text is the collapse of a subsequence
    of its document's original lines; untouched docs come through
    byte-identical to the plain canonical form; rerun deterministic."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=23, n_rows=120, n_days=2)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out1 = str(tmp_path / "c1")
    s1 = build_corpus(
        spark, wh, out1, budget=10,
        line_dedup=True, intradoc=True, line_mode="newline",
    )
    assert s1["rows_exported"] > 0
    assert s1["boiler_segments_removed"] > 0  # real newline signal
    assert (
        s1["rows_gated"]
        >= s1["rows_intradoc_cleaned"]
        >= s1["rows_line_cleaned"]
        >= s1["rows_survivors"]
        >= s1["rows_exported"]
    )

    orig = {
        r["url"]: r["extracted_text"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{wh}/extracted/data")
        .select("url", "extracted_text")
        .collect()
    }
    exported = _read_jsonl(out1)
    assert exported
    n_identical = 0
    for row in exported:
        groups = [
            ln.split() for ln in orig[row["url"]].split("\n") if ln.split()
        ]
        toks = row["text"].split(" ") if row["text"] else []
        assert _is_line_subseq(groups, toks), row["url"]
        flat = [t for g in groups for t in g]
        if toks == flat:
            assert row["text"] == " ".join(flat)  # canonical collapse
            n_identical += 1
    assert n_identical > 0

    out2 = str(tmp_path / "c2")
    s2 = build_corpus(
        spark, wh, out2, budget=10,
        line_dedup=True, intradoc=True, line_mode="newline",
    )
    assert s1["rows_exported"] == s2["rows_exported"]
    r1 = {(r["url"], r["text"]) for r in _read_jsonl(out1)}
    r2 = {(r["url"], r["text"]) for r in _read_jsonl(out2)}
    assert r1 == r2


def test_corpus_job_substring_cut_bytes_mode(spark, tmp_path):
    """--substring-mode bytes: the byte-granular ExactSubstr form runs
    on the job's STRUCT doc keys, reports bytes (not tokens) in the
    funnel, is deterministic, and every surviving doc's byte count
    drops by exactly the removed-bytes total across the corpus."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=31, n_rows=120, n_days=2)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out0 = str(tmp_path / "b0")  # no cut: the byte baseline
    s0 = build_corpus(spark, wh, out0, budget=10)

    out1 = str(tmp_path / "b1")
    s1 = build_corpus(
        spark, wh, out1, budget=10,
        substring_cut=True, substring_mode="bytes",
    )
    assert (
        s1["rows_gated"]
        >= s1["rows_substr_cleaned"]
        >= s1["rows_survivors"]
    )
    assert s1["substr_tokens_removed"] == 0
    assert s1["substr_bytes_removed"] >= 0
    if s1["substr_spans_removed"] == 0:
        assert s1["substr_bytes_removed"] == 0
    else:
        # every cut span removes at least one full window of bytes
        assert s1["substr_bytes_removed"] >= 40
    assert s1["rows_exported"] > 0

    # deterministic re-run
    out2 = str(tmp_path / "b2")
    build_corpus(
        spark, wh, out2, budget=10,
        substring_cut=True, substring_mode="bytes",
    )
    r1 = {(r["url"], r["text"]) for r in _read_jsonl(out1)}
    r2 = {(r["url"], r["text"]) for r in _read_jsonl(out2)}
    assert r1 == r2

    # token mode and byte mode report in their own units only
    out3 = str(tmp_path / "b3")
    s3 = build_corpus(
        spark, wh, out3, budget=10,
        substring_cut=True, substring_mode="tokens",
    )
    assert s3["substr_bytes_removed"] == 0


def test_corpus_job_gopher_gate(spark, tmp_path):
    """--gopher-gate DROPS (not repairs) a repetition-spam page that
    passes the quality/lang gate: a planted 40x-repeated-line page is
    exported with the gate off and dropped with the gate on (token
    AND newline line modes — the n-gram rules fire even when the
    single-line canonicalization hides the duplicate lines); clean
    docs are untouched and the run stays deterministic."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.build import PAGES_SCHEMA

    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=23, n_rows=120, n_days=2)
    # the planted page: stop-word-heavy (passes the lang/quality
    # gate: n > 50 tokens, hits_en/n far over the stop-ratio knee)
    # but a pure keyword loop (dup_line_frac 39/40, 5-gram coverage
    # ~ 1.0 — both far over the published thresholds)
    line = "buy the best of the and to in is it cheap deal now"
    html = (
        "<html><head><title>spam</title></head><body>"
        + "".join(f"<p>{line}</p>" for _ in range(40))
        + "</body></html>"
    ).encode()
    spam = pa.table(
        {
            "url": ["https://spam.example/loop"],
            "warc_ts": [dt.datetime(2025, 6, 14, 12, 0, 0)],
            "html": [html],
            "text": [None],
            "lang": ["en"],
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(
        pa.concat_tables([pq.read_table(corpus), spam]), corpus
    )
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    def urls_of(out):
        return {r["url"] for r in _read_jsonl(out)}

    out_off = str(tmp_path / "off")
    s_off = build_corpus(spark, wh, out_off, budget=1000)
    assert s_off["rows_gopher_dropped"] == 0
    assert "https://spam.example/loop" in urls_of(out_off)

    out_on = str(tmp_path / "on")
    s_on = build_corpus(spark, wh, out_on, budget=1000, gopher_gate=True)
    assert s_on["rows_gated"] == s_off["rows_gated"]
    assert s_on["rows_gopher_dropped"] == 1
    assert s_on["rows_exported"] == s_off["rows_exported"] - 1
    assert "https://spam.example/loop" not in urls_of(out_on)
    # clean docs untouched: the gate only removed the planted page
    assert urls_of(out_on) == urls_of(out_off) - {
        "https://spam.example/loop"
    }

    # newline mode: the dup-line rules see real lines; same verdict
    out_nl = str(tmp_path / "nl")
    s_nl = build_corpus(
        spark, wh, out_nl, budget=1000, gopher_gate=True,
        line_mode="newline",
    )
    assert s_nl["rows_gopher_dropped"] == 1
    assert "https://spam.example/loop" not in urls_of(out_nl)

    # determinism with the gate on
    out_on2 = str(tmp_path / "on2")
    build_corpus(spark, wh, out_on2, budget=1000, gopher_gate=True)
    a = sorted(
        json.dumps(r, sort_keys=True) for r in _read_jsonl(out_on)
    )
    b = sorted(
        json.dumps(r, sort_keys=True) for r in _read_jsonl(out_on2)
    )
    assert a == b


def test_corpus_job_quality_buckets(spark, tmp_path):
    """--quality-buckets drops EXACTLY the tail (worst) equal-mass
    quality tertile of the gated set — the CCNet corpus-relative trim:
    every exported doc's quality clears the reported c1 cutoff, the
    baseline run exports docs that don't, the tail bucket is >= a third
    of the gated mass (ties only add), and the run stays deterministic."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=23, n_rows=150, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    # huge budget so sampling never masks the trim
    out_off = str(tmp_path / "off")
    s_off = build_corpus(spark, wh, out_off, budget=1000)
    assert s_off["rows_quality_tail_dropped"] == 0
    assert s_off["quality_cuts"] is None
    rows_off = _read_jsonl(out_off)

    out_on = str(tmp_path / "on")
    s_on = build_corpus(spark, wh, out_on, budget=1000, quality_buckets=True)
    cuts = s_on["quality_cuts"]
    assert cuts is not None and cuts["c1"] <= cuts["c2"]
    n_gated = s_on["rows_gated"]
    n_drop = s_on["rows_quality_tail_dropped"]
    # the same absolute gate ran in both runs
    assert n_gated == s_off["rows_gated"]
    # tail = at least a third of the gated mass (3*cum(c1) >= N), and
    # never everything (the degenerate case raises instead)
    assert 3 * n_drop >= n_gated
    assert 0 < n_drop < n_gated

    rows_on = _read_jsonl(out_on)
    assert len(rows_on) == s_on["rows_exported"] > 0
    # semantic pin: every survivor clears the cutoff; the untrimmed run
    # exported tail-bucket docs (quality <= c1) this run excludes
    assert all(r["quality"] > cuts["c1"] for r in rows_on)
    assert any(r["quality"] <= cuts["c1"] for r in rows_off)
    # NOT asserted: survivors ⊆ baseline survivors — dropping a
    # cluster's min-id member pre-dedup legitimately promotes a
    # different keeper, so the export sets may differ beyond the trim

    # determinism with the trim on
    out_on2 = str(tmp_path / "on2")
    s2 = build_corpus(spark, wh, out_on2, budget=1000, quality_buckets=True)
    assert s2["quality_cuts"] == cuts
    a = sorted(json.dumps(r, sort_keys=True) for r in rows_on)
    b = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out_on2))
    assert a == b


def test_corpus_job_host_cap(spark, tmp_path):
    """--host-cap K bounds a planted template-farm host to exactly K
    exported docs (the K smallest md5(url) — deterministic), leaves
    every other host untouched, and stays deterministic."""
    import datetime as dt
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.build import PAGES_SCHEMA

    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=31, n_rows=120, n_days=2)
    # 12 farm pages on ONE host: each passes the quality/lang gate
    # (>50 tokens, stop-word-heavy) with page-unique content words so
    # near-dup never collapses them — the cap must do the bounding
    farm_urls = [f"https://farm.example/page/{i:03d}" for i in range(12)]

    def farm_html(i: int) -> bytes:
        toks = " ".join(
            f"the fact of f{i}w{j} and the tale to f{i}x{j} in it"
            for j in range(6)
        )
        return f"<html><body><p>{toks}</p></body></html>".encode()

    farm = pa.table(
        {
            "url": farm_urls,
            "warc_ts": [dt.datetime(2025, 6, 14, 11, 0, 0)] * 12,
            "html": [farm_html(i) for i in range(12)],
            "text": [None] * 12,
            "lang": ["en"] * 12,
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(pa.concat_tables([pq.read_table(corpus), farm]), corpus)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    def host_counts(out):
        c: dict = {}
        for r in _read_jsonl(out):
            h = r["url"].split("/")[2]
            c[h] = c.get(h, 0) + 1
        return c

    out_off = str(tmp_path / "off")
    s_off = build_corpus(spark, wh, out_off, budget=1000)
    assert s_off["rows_hostcap_dropped"] == 0
    off_counts = host_counts(out_off)
    assert off_counts["farm.example"] == 12

    out_on = str(tmp_path / "on")
    s_on = build_corpus(spark, wh, out_on, budget=1000, host_cap=5)
    assert s_on["rows_gated"] == s_off["rows_gated"]
    on_counts = host_counts(out_on)
    # the cap binds the farm host exactly; no exported host exceeds it
    assert on_counts["farm.example"] == 5
    assert all(n <= 5 for n in on_counts.values())
    assert s_on["rows_hostcap_dropped"] >= 7
    # the keeper choice is the entry's contract: the 5 smallest
    # md5(url) of the farm urls survive
    expect = set(
        sorted(farm_urls, key=lambda u: hashlib.md5(u.encode()).hexdigest())[:5]
    )
    got = {
        r["url"]
        for r in _read_jsonl(out_on)
        if r["url"].startswith("https://farm.example/")
    }
    assert got == expect
    # hosts the cap didn't bind are untouched
    for h, n in off_counts.items():
        if n <= 5:
            assert on_counts.get(h, 0) == n

    # determinism with the cap on
    out_on2 = str(tmp_path / "on2")
    build_corpus(spark, wh, out_on2, budget=1000, host_cap=5)
    a = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out_on))
    b = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out_on2))
    assert a == b


def test_corpus_job_dsir_select(spark, tmp_path):
    """--dsir-target keeps exactly the target-like half: 20 planted
    docs share vocabulary with the target export, 20 don't; with
    --dsir-keep-pm 500 the funnel drops the 20 off-target docs and
    everything exported comes from the target-like group. Deterministic
    on re-run."""
    import datetime as dt
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.build import PAGES_SCHEMA

    def page_html(pool: str, i: int) -> bytes:
        # passes the quality/lang gate (72 stop-word-heavy tokens) with
        # content words from a SHARED per-group pool (so the target can
        # cover group T's vocabulary) plus one doc-unique token
        toks = " ".join(
            f"the fact of {pool}{(2 * i + j) % 20} and the tale to "
            f"{pool}{(2 * i + j + 7) % 20} in it uniq{pool}{i}x{j}"
            for j in range(6)
        )
        return f"<html><body><p>{toks}</p></body></html>".encode()

    urls = [f"https://t.example/page/{i:02d}" for i in range(20)] + [
        f"https://o.example/page/{i:02d}" for i in range(20)
    ]
    html = [page_html("alpha", i) for i in range(20)] + [
        page_html("omega", i) for i in range(20)
    ]
    pages_tbl = pa.table(
        {
            "url": urls,
            "warc_ts": [dt.datetime(2025, 6, 14, 11, 0, 0)] * 40,
            "html": html,
            "text": [None] * 40,
            "lang": ["en"] * 40,
        },
        schema=PAGES_SCHEMA,
    )
    corpus = tmp_path / "pages.parquet"
    pq.write_table(pages_tbl, corpus)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    # target export: fresh alpha-pool sentences (not identical to any
    # page — DSIR matches the DISTRIBUTION, not the documents)
    tdir = tmp_path / "target"
    tdir.mkdir()
    with open(tdir / "part-0.json", "w") as f:
        for i in range(10):
            toks = " ".join(
                f"the fact of alpha{(3 * i + j) % 20} and the tale to "
                f"alpha{(3 * i + j + 5) % 20} in it"
                for j in range(6)
            )
            f.write(_json.dumps({"url": f"u{i}", "text": toks}) + "\n")

    out = str(tmp_path / "out")
    s = build_corpus(
        spark, wh, out, budget=1000,
        dsir_target=str(tdir), dsir_keep_pm=500,
    )
    assert s["rows_gated"] == 40
    assert s["rows_dsir_dropped"] == 20
    assert s["dsir_cutoff"] is not None
    exported = [r["url"] for r in _read_jsonl(out)]
    assert exported and all(
        u.startswith("https://t.example/") for u in exported
    )

    # determinism
    out2 = str(tmp_path / "out2")
    s2 = build_corpus(
        spark, wh, out2, budget=1000,
        dsir_target=str(tdir), dsir_keep_pm=500,
    )
    assert s2["dsir_cutoff"] == s["dsir_cutoff"]
    a = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out))
    b = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out2))
    assert a == b


def test_corpus_job_substring_utf8_mode(spark, tmp_path):
    """--substring-mode utf8: the UTF-8-safe byte form composes into
    the job — a planted >=40-byte boilerplate run containing 2-/3-/
    4-byte codepoints is cut from every doc but one global keeper,
    every exported text is valid UTF-8 (no U+FFFD replacement chars —
    decode of an invalid splice would produce them), the keeper's
    multi-byte run survives intact, the funnel reports bytes (not
    tokens), and the run is deterministic."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.build import PAGES_SCHEMA

    # the shared multi-byte boilerplate (UTF-8 length >> 40 bytes:
    # café = 5B, 日本 = 6B, the math-bold u = 4B)
    boil = (
        "the café of 日本 and the tale of the \U0001d482nique "
        "day in it and the café again"
    )
    assert len(boil.encode("utf-8")) >= 60

    def filler(i: int, j: int) -> str:
        # stop-word-heavy (passes the quality/lang gate) with a unique
        # token every ~4 words so no accidental 40-byte run repeats
        return (
            f"the fact of u{i}x{j} and the tale to u{i}y{j} in it"
        )

    def page_html(i: int, with_boil: bool) -> bytes:
        parts = [filler(i, j) for j in range(8)]
        if with_boil:
            parts.insert(2 + i % 3, boil)  # varying offset per doc
        text = " ".join(parts)
        return f"<html><body><p>{text}</p></body></html>".encode()

    n_boil, n_clean = 4, 8
    urls = [f"https://u8.example/page/{i:02d}" for i in range(n_boil + n_clean)]
    html = [page_html(i, i < n_boil) for i in range(n_boil + n_clean)]
    pages_tbl = pa.table(
        {
            "url": urls,
            "warc_ts": [dt.datetime(2025, 6, 14, 11, 0, 0)] * len(urls),
            "html": html,
            "text": [None] * len(urls),
            "lang": ["en"] * len(urls),
        },
        schema=PAGES_SCHEMA,
    )
    corpus = tmp_path / "pages.parquet"
    pq.write_table(pages_tbl, corpus)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out1 = str(tmp_path / "c1")
    s1 = build_corpus(
        spark, wh, out1, budget=1000,
        substring_cut=True, substring_mode="utf8",
    )
    assert s1["rows_gated"] == n_boil + n_clean
    # one island cut per non-keeper boilerplate doc; units are bytes
    assert s1["substr_spans_removed"] >= n_boil - 1
    assert s1["substr_bytes_removed"] >= (n_boil - 1) * 40
    assert s1["substr_tokens_removed"] == 0
    assert s1["rows_exported"] > 0

    rows = {r["url"]: r["text"] for r in _read_jsonl(out1)}
    # valid UTF-8 splices: no replacement chars anywhere
    assert all("�" not in t for t in rows.values())
    # exactly one exported doc still carries the full boilerplate run
    keepers = [u for u, t in rows.items() if boil in t]
    assert len(keepers) == 1
    # the cut docs lost bytes but kept their unique filler
    for i in range(n_boil):
        u = urls[i]
        if u in rows and u not in keepers:
            assert boil not in rows[u]
            assert f"u{i}x0" in rows[u]
    # clean docs pass through byte-identical to their extracted text
    for i in range(n_boil, n_boil + n_clean):
        if urls[i] in rows:
            assert rows[urls[i]].encode("utf-8").decode("utf-8")
            assert "café" not in rows[urls[i]]

    # deterministic re-run
    out2 = str(tmp_path / "c2")
    s2 = build_corpus(
        spark, wh, out2, budget=1000,
        substring_cut=True, substring_mode="utf8",
    )
    assert s2["substr_bytes_removed"] == s1["substr_bytes_removed"]
    a = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out1))
    b = sorted(json.dumps(r, sort_keys=True) for r in _read_jsonl(out2))
    assert a == b


def test_corpus_job_bpe_report(spark, tmp_path):
    """--bpe-report N learns N BPE merges on the READ-BACK export:
    merge list matches reference greedy BPE run on the exported rows,
    token totals bound each other (ws <= bpe <= chars), and the report
    is rerun-identical because the export is."""
    from tests.test_webtext import _sennrich_learn

    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=11, n_rows=150, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out1 = str(tmp_path / "corpus1")
    s1 = build_corpus(spark, wh, out1, budget=10, bpe_rounds=3)
    bpe = s1["bpe"]
    assert bpe["rounds"] == 3 and len(bpe["merges"]) == 3

    # reference greedy BPE over the exported rows' word frequencies
    from collections import Counter

    wf: Counter = Counter()
    n_chars = 0
    for r in _read_jsonl(out1):
        toks = [t for t in r["text"].replace("\n", " ").split(" ") if t]
        wf.update(toks)
        n_chars += sum(len(t) for t in toks)
    expected, vocab = _sennrich_learn(dict(wf), 3)
    assert bpe["merges"] == [[p, m, n] for _, p, m, n in expected]
    assert bpe["tokens_ws"] == sum(wf.values())
    assert bpe["tokens_bpe"] == sum(
        len(vocab[w]) * n for w, n in wf.items()
    )
    assert bpe["tokens_ws"] <= bpe["tokens_bpe"] <= n_chars

    out2 = str(tmp_path / "corpus2")
    s2 = build_corpus(spark, wh, out2, budget=10, bpe_rounds=3)
    assert s2["bpe"] == bpe

    # knob off -> no report (and the rest of the funnel is unchanged)
    out3 = str(tmp_path / "corpus3")
    s3 = build_corpus(spark, wh, out3, budget=10)
    assert s3["bpe"] is None
    assert s3["rows_exported"] == s1["rows_exported"]


def test_corpus_job_fuzzy_decontam(spark, tmp_path):
    """--fuzzy-decontam-pm catches a MUTATED copy of an eval doc that
    the exact n-gram pass provably misses: every 8th token of the
    benchmark text is replaced with a unique junk token, so the
    benchmark shares no intact 8-gram with any survivor (exact pass
    drops nothing), while ~5/7 of its word 3-grams survive in the
    original doc (containment >= 500 per-mille -> fuzzy pass drops
    it). Deterministic across reruns."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=13, n_rows=150, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out0 = str(tmp_path / "plain")
    build_corpus(spark, wh, out0, budget=10)
    rows0 = _read_jsonl(out0)
    victim = next(r for r in rows0 if len(r["text"].split(" ")) >= 24)

    toks = victim["text"].split(" ")
    mutant = " ".join(
        f"zzqx{i}" if i % 8 == 7 else t for i, t in enumerate(toks)
    )
    bench = tmp_path / "bench.jsonl"
    bench.write_text(json.dumps({"text": mutant}) + "\n")

    # exact-only pass: the mutant shares NO intact 8-gram with anything
    out1 = str(tmp_path / "exact_only")
    s1 = build_corpus(spark, wh, out1, budget=10, benchmark=str(bench))
    assert s1["rows_decontaminated"] == s1["rows_survivors"]
    assert victim["url"] in {r["url"] for r in _read_jsonl(out1)}

    # fuzzy pass: containment of the mutant's 3-grams flags the victim
    out2 = str(tmp_path / "fuzzy")
    s2 = build_corpus(
        spark, wh, out2, budget=10,
        benchmark=str(bench), fuzzy_decontam_pm=500,
    )
    assert s2["rows_decontaminated"] < s2["rows_survivors"]
    assert victim["url"] not in {r["url"] for r in _read_jsonl(out2)}

    # deterministic rerun
    out3 = str(tmp_path / "fuzzy2")
    s3 = build_corpus(
        spark, wh, out3, budget=10,
        benchmark=str(bench), fuzzy_decontam_pm=500,
    )
    assert s3["rows_decontaminated"] == s2["rows_decontaminated"]
    assert {r["url"] for r in _read_jsonl(out3)} == {
        r["url"] for r in _read_jsonl(out2)
    }


def test_corpus_job_semantic_decontam(spark, tmp_path):
    """--semantic-decontam-pm catches a token-REORDERED copy of an eval
    doc that BOTH n-gram rungs provably miss: reversing the token order
    destroys every intact 8-gram and (almost) every 3-gram
    (containment ~0 -> the exact and fuzzy passes keep the victim),
    while the hashed embedding is a bag of tokens — order-invariant —
    so the cosine is exactly 1.0 and the semantic pass drops it."""
    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=17, n_rows=150, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    out0 = str(tmp_path / "plain")
    build_corpus(spark, wh, out0, budget=10)
    rows0 = _read_jsonl(out0)
    victim = next(r for r in rows0 if len(r["text"].split(" ")) >= 24)

    bench = tmp_path / "bench.jsonl"
    bench.write_text(
        json.dumps({"text": " ".join(reversed(victim["text"].split(" ")))})
        + "\n"
    )

    # exact + fuzzy rungs: the reversed bench doc flags nothing
    out1 = str(tmp_path / "ngram_only")
    s1 = build_corpus(
        spark, wh, out1, budget=10,
        benchmark=str(bench), fuzzy_decontam_pm=500,
    )
    assert victim["url"] in {r["url"] for r in _read_jsonl(out1)}

    # semantic rung: order-invariant embedding -> cosine 1.0 -> dropped
    out2 = str(tmp_path / "semantic")
    s2 = build_corpus(
        spark, wh, out2, budget=10,
        benchmark=str(bench), fuzzy_decontam_pm=500,
        semantic_decontam_pm=900,
    )
    assert victim["url"] not in {r["url"] for r in _read_jsonl(out2)}
    assert s2["rows_decontaminated"] < s1["rows_decontaminated"]


def test_corpus_job_warehouse_tag_pins_snapshot(spark, tmp_path):
    """--warehouse-tag makes the corpus build reproducible against a
    MOVING warehouse: the tagged snapshot is what the build reads even
    after later extract appends; the untagged build sees the new rows;
    the funnel reports the snapshot actually read either way."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.tables.icetable import IceTable

    corpus = tmp_path / "pages.parquet"
    write_pages_parquet(corpus, seed=13, n_rows=120, n_days=3)
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "pages")
    wh = str(tmp_path / "wh")
    run_extract(spark, pages, wh, salt=False)

    tbl = IceTable(f"{wh}/extracted")
    tag_snap = tbl.tag("train-v1")

    # the warehouse moves: a later append lands one more extracted row
    extra = (
        tbl.read(spark)
        .orderBy("url")
        .limit(1)
        .withColumn("url", F.lit("https://late-arrival.example/x"))
    )
    tbl.append(extra)

    s_pinned = build_corpus(
        spark, wh, str(tmp_path / "c1"), budget=10**6,
        warehouse_tag="train-v1",
    )
    s_live = build_corpus(spark, wh, str(tmp_path / "c2"), budget=10**6)
    assert s_pinned["warehouse_snapshot"] == tag_snap
    assert s_live["warehouse_snapshot"] == tbl.snapshot_id()
    assert s_live["rows_in"] == s_pinned["rows_in"] + 1

    # unknown tag raises loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no tag"):
        build_corpus(
            spark, wh, str(tmp_path / "c3"), warehouse_tag="nope"
        )


def test_decontam_flags_require_benchmark(spark, tmp_path):
    """--fuzzy/--semantic-decontam-pm without --benchmark must raise,
    not silently no-op — a corpus the operator believes was
    decontaminated must never ship contaminated."""
    import pytest as _pytest

    for kw in (
        {"fuzzy_decontam_pm": 500},
        {"semantic_decontam_pm": 900},
    ):
        with _pytest.raises(ValueError, match="require\\s+--benchmark"):
            build_corpus(
                spark, str(tmp_path / "wh"), str(tmp_path / "c"), **kw
            )
