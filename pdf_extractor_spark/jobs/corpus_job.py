"""End-to-end training-corpus construction — the composition a 100 TB
pipeline actually runs downstream of extraction, as ONE resumable job:

    extracted IceTable
      → canonicalize (single-space text, 120-bit (hi, lo) md5(url) key)
      → quality/lang features  (queries/corpus_select.features_of)
      → quality + language gate
      → [optional] CCNet quality tertiles
                                (queries/webtext.tertile_cutoffs_of:
                                 --quality-buckets DROPS the tail
                                 (worst) equal-mass tertile of the
                                 quality score — the corpus-RELATIVE
                                 trim of Wenzek et al. 2020, on top of
                                 the absolute QUALITY_MIN bar)
      → [optional] per-host cap  (queries/webtext.web_host_cap_of:
                                 --host-cap K keeps the K smallest
                                 md5(url) docs per host — the
                                 RefinedWeb template-farm bound —
                                 before the cleaning stages)
      → [optional] DSIR selection (queries/webtext.dsir_*:
                                 --dsir-target PATH keeps the
                                 --dsir-keep-pm per-mille of the batch
                                 most target-like by hashed-ngram
                                 importance weight ln(p_target/p_raw) —
                                 Xie et al. 2023; bucket counts reduce
                                 in-engine to O(DSIR_B) rows, ln is
                                 driver-side, cutoff is the exact
                                 per-mille histogram point)
      → [optional] Gopher repetition gate
                                (queries/webtext.web_gopher_repetition_of:
                                 --gopher-gate DROPS docs whose
                                 repetition metrics exceed the
                                 published Rae et al. 2021 thresholds
                                 — the drop-don't-repair philosophy —
                                 before any cleaning stage)
      → [optional] intra-doc dedup
                                (queries/dedup.dedup_intradoc_of:
                                 --intradoc strips WITHIN-document
                                 repeated segments before any
                                 cross-document pass)
      → [optional] line dedup   (queries/dedup.dedup_lines_of:
                                 --line-dedup strips cross-document
                                 repeated segments over the gated
                                 checkpoint; emptied docs dropped.
                                 --line-mode newline runs BOTH line
                                 stages on real trimmed '\\n' lines via
                                 a line-preserving canonical twin —
                                 extracted text joins blocks with
                                 newlines, which the single-line
                                 canonicalization would erase — then
                                 re-collapses for downstream; untouched
                                 docs keep the identical canonical text)
      → [optional] seen-index gate
                                (queries/dedup.bloom_seen_of:
                                 --seen-index probes a persisted Bloom
                                 bitmap of every previously exported
                                 shingle and drops already-kept docs
                                 BEFORE near-dup; the index advances by
                                 OR-merging the new export — the daily
                                 incremental-crawl shape)
      → near-dup dedup          (queries/dedup.near_dup_labels_of:
                                 LSH candidates → exact-Jaccard verify
                                 → cluster → keep-one survivors)
      → [optional] benchmark decontamination
                                (queries/contamination.contamination_of:
                                 drop survivors sharing word n-grams
                                 with --benchmark's eval texts;
                                 --fuzzy-decontam-pm N adds the
                                 CONTAINMENT pass — drop survivors
                                 holding >= N/1000 of any eval doc's
                                 3-grams, catching paraphrased copies
                                 exact n-grams miss;
                                 --semantic-decontam-pm N adds the
                                 EMBEDDING-COSINE pass — drop survivors
                                 whose hashed-token embedding reaches
                                 cosine >= N/1000 vs any eval doc,
                                 catching rephrasings with little
                                 lexical overlap left)
      → stratified sampling     (queries/corpus_select.sample_stratified_of:
                                 hash-threshold budget per (lang, band))
      → gzip JSONL shards       (the training-data delivery format;
                                 --mix-shards N exports N deterministic
                                 hash-mixed shards, per-shard order)
      → [optional] tokenizer-training report
                                (queries/webtext._bpe_train_syms:
                                 --bpe-report N learns N BPE merges on
                                 the READ-BACK export and publishes the
                                 merge list + whitespace/BPE token
                                 totals in the funnel — trained on
                                 exactly what shipped)

    python -m pdf_extractor_spark.jobs.corpus_job \
        --warehouse /path/to/wh --out /path/to/corpus \
        [--budget 25] [--min-chars 1] [--shards N]

Every stage is the SAME DataFrame operator the catalog oracle-checks on
the `documents` table — this job is composition, not reimplementation —
and the whole pipeline is deterministic (hash-ordered sampling, no
rand()), so a re-run over the same table produces byte-identical output.
The printed funnel (rows in → gated → survivors → sampled → exported)
is the job's lineage record, also written to <out>/_SUMMARY.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from pdf_extractor_spark.jobs.extract_job import build_session
from pdf_extractor_spark.queries.corpus_select import (
    QUALITY_MIN,
    SAMPLE_BUDGET,
    features_of,
    sample_stratified_of,
    shuffle_hash_expr,
)
from pdf_extractor_spark.queries.contamination import contamination_of
from pdf_extractor_spark.queries.dedup import near_dup_labels_of
from pdf_extractor_spark.tables.icetable import IceTable

# 120-bit two-BIGINT doc key from md5(url) (round-4, was a single
# 60-bit BIGINT): the dedup/cluster machinery compares struct keys
# lexicographically (min/least are field-ordered in Spark AND DuckDB)
# and the LP convergence invariant generalizes to the per-field sum
# tuple (queries/dedup._min_label_propagation). Birthday bound: 60 bits
# collide at ~10^8 docs — silent dedup corruption at the 10^12-row
# design scale; 120 bits are safe to ~10^18. A countDistinct guard on
# the gated set still fails loudly if the impossible happens.
_DOC_ID = (
    "named_struct("
    "'hi', CAST(conv(substr(md5(url), 1, 15), 16, 10) AS BIGINT), "
    "'lo', CAST(conv(substr(md5(url), 16, 15), 16, 10) AS BIGINT))"
)
# the dedup/feature expression templates assume single-space-separated
# text (the documents-table convention); extracted text carries the
# block-joining newlines, so canonicalize first
_CANON = r"trim(regexp_replace(extracted_text, '\\s+', ' '))"
# line-PRESERVING canonical twin for --line-mode newline: interior
# whitespace collapsed per line, empty lines dropped, '\n' joins kept —
# collapsing ITS newlines reproduces _CANON exactly (both reduce to the
# non-space tokens joined by single spaces), so untouched docs keep the
# identical single-line canonical text downstream.
_CANON_NL = (
    r"array_join(filter(transform(split(extracted_text, '\n'), "
    r"l -> trim(regexp_replace(l, '\\s+', ' '))), l -> l <> ''), '\n')"
)


def _count_and_guard_doc_keys(gated) -> int:
    """One agg over the CHECKPOINTED gated rows: row count + the doc-key
    collision guard. Canonicalization makes urls unique, so distinct
    doc_ids must equal distinct urls — a 120-bit md5 collision is
    ~impossible (birthday bound ~10^18 docs), but if it ever happens it
    silently merges two urls' dedup identities; fail loudly instead."""
    g = gated.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_keys"),
        F.countDistinct("url").alias("n_urls"),
    ).collect()[0]
    if g["n_keys"] != g["n_urls"]:
        raise RuntimeError(
            f"doc_id collision: {g['n_urls']} distinct urls map to "
            f"{g['n_keys']} distinct 120-bit keys — dedup identities "
            "would silently merge; refusing to continue"
        )
    return g["n"]


def build_corpus(
    spark: SparkSession,
    warehouse: str,
    out: str,
    budget: int = SAMPLE_BUDGET,
    min_chars: int = 1,
    shards: int | None = None,
    partitions: list[str] | None = None,
    benchmark: str | None = None,
    fuzzy_decontam_pm: int | None = None,
    semantic_decontam_pm: int | None = None,
    mix_shards: int | None = None,
    contam_ngram: int | None = None,
    line_dedup: bool = False,
    intradoc: bool = False,
    line_mode: str = "tokens",
    substring_cut: bool = False,
    substring_mode: str = "tokens",
    seen_index: str | None = None,
    seen_drop_pm: int = 800,
    mix_budget: int | None = None,
    drift_check: str | None = None,
    drift_max_pm: int = 500,
    gopher_gate: bool = False,
    quality_buckets: bool = False,
    host_cap: int | None = None,
    dsir_target: str | None = None,
    dsir_keep_pm: int = 500,
    bpe_rounds: int | None = None,
    warehouse_tag: str | None = None,
) -> dict:
    from pyspark.sql import Observation

    if benchmark is None and (fuzzy_decontam_pm or semantic_decontam_pm):
        # these passes are benchmark-relative; silently no-opping them
        # would ship a corpus the operator believes was decontaminated
        raise ValueError(
            "--fuzzy-decontam-pm / --semantic-decontam-pm require "
            "--benchmark (they flag overlap AGAINST the benchmark "
            "slice; without one there is nothing to decontaminate "
            "against)"
        )
    tbl = IceTable(f"{warehouse}/extracted")
    # Reproducible builds against a moving warehouse: ``warehouse_tag``
    # pins the read to a tagged snapshot (IceTable named ref), so a
    # concurrent extract append between two corpus runs cannot change
    # what this build reads — the tag also shields that snapshot from
    # expire_snapshots until released. The snapshot actually read lands
    # in the funnel either way (lineage).
    if warehouse_tag is not None:
        tag_map = tbl.tags()
        if warehouse_tag not in tag_map:
            raise ValueError(
                f"no tag {warehouse_tag!r} on {warehouse}/extracted "
                f"(have: {sorted(tag_map)})"
            )
        read_snapshot_id = tag_map[warehouse_tag]
    else:
        read_snapshot_id = tbl.snapshot_id()
        if read_snapshot_id < 0:
            # keep the clear error the plain read() path used to raise
            # (read_snapshot(-1) would fail with a cryptic missing
            # snap--0000001.json instead)
            raise FileNotFoundError(
                f"IceTable at {warehouse}/extracted is empty/unknown"
            )
    tz_key = "spark.sql.session.timeZone"
    prev_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "UTC")
    try:
        # funnel counts ride the ONE warehouse pass as Observation
        # metrics (round-4, was raw.count() + docs.count(): two extra
        # full scan+window executions just for lineage numbers — pure
        # waste at 100 TB). The gated localCheckpoint is the single
        # action that executes the scan; the observations are collected
        # from it for free.
        obs_in = Observation()
        obs_clean = Observation()
        raw = tbl.read_snapshot(
            spark, read_snapshot_id, partitions=partitions
        ).observe(obs_in, F.count(F.lit(1)).alias("n"))
        # canonicalize to ONE row per url (latest crawl wins, warc_ts
        # then url as the deterministic order): a url extracted in two
        # partitions (re-crawls, incremental appends) would otherwise
        # share its doc_id and MULTIPLY through every doc_id join below
        uw = Window.partitionBy("url").orderBy(
            F.col("warc_ts").desc(), F.col("partition_date").desc()
        )
        docs = (
            raw.filter(
                (F.coalesce(F.col("error"), F.lit("")) == "")
                & (F.col("n_chars") >= min_chars)
            )
            .withColumn("rn", F.row_number().over(uw))
            .filter("rn = 1")
            .select(
                "url",
                F.date_format(
                    "warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("ts"),
                F.expr(_DOC_ID).alias("doc_id"),
                F.expr(_CANON).alias("text"),
                # line-preserving twin, consumed only by the newline
                # line stages (features/dedup stay on the single-line
                # convention)
                *(
                    [F.expr(_CANON_NL).alias("text_nl")]
                    if line_mode == "newline"
                    else []
                ),
            )
            .observe(obs_clean, F.count(F.lit(1)).alias("n"))
        )

        # materialize the gated set ONCE: it feeds the funnel count, the
        # dedup semi-join + verify, the survivor join, the sampler's
        # count-aggregate AND prefilter, and the final export — Spark
        # shares no subplans, so unmaterialized the warehouse scan +
        # regex feature pipeline would re-execute ~5×
        feat = features_of(docs)
        gated = (
            feat.filter(
                (F.col("quality") >= QUALITY_MIN)
                & (F.col("lang_pred") != "und")
            )
            .select(
                "doc_id", "url", "ts", "text", "quality", "lang_pred",
                *(["text_nl"] if line_mode == "newline" else []),
            )
            .localCheckpoint(eager=True)
        )
        n_in = int(obs_in.get["n"])
        n_docs = int(obs_clean.get["n"])
        n_gated = _count_and_guard_doc_keys(gated)

        # optional CCNet-style corpus-relative quality trim
        # (--quality-buckets): the absolute QUALITY_MIN gate above keeps
        # whatever clears a fixed bar; CCNet (Wenzek et al. 2020)
        # additionally splits the surviving corpus into equal-mass
        # head/middle/tail buckets by score and drops the tail — a
        # RELATIVE trim that keeps biting as the corpus mix shifts.
        # Cutoffs come from the same histogram-tertile helper the
        # web_quality_buckets catalog entry oracle-checks (the corpus is
        # never sorted; the collect is the 1-row cutoff pair). Here
        # HIGHER quality = better, so bucket1 (quality <= c1) is the
        # tail. Pure function of the gated set's scores — deterministic.
        n_tail_dropped = 0
        quality_cuts = None
        if quality_buckets:
            from pdf_extractor_spark.queries.webtext import (
                tertile_cutoffs_of,
            )

            cut_row = tertile_cutoffs_of(
                gated.select("quality"), col="quality"
            ).collect()[0]
            quality_cuts = {"c1": cut_row["c1"], "c2": cut_row["c2"]}
            gated = gated.filter(
                F.col("quality") > F.lit(cut_row["c1"])
            ).localCheckpoint(eager=True)
            n_tail_dropped = n_gated - gated.count()
            if n_tail_dropped == n_gated:
                raise RuntimeError(
                    "--quality-buckets: every gated doc shares the "
                    f"tail bucket (c1={cut_row['c1']} is the maximum "
                    "quality score — a degenerate all-tied "
                    "distribution); refusing to export an empty corpus"
                )
        n_gated_q = n_gated - n_tail_dropped

        # optional RefinedWeb-style per-host contribution cap
        # (--host-cap K): keep the K smallest-md5(url) docs per host —
        # deterministic, uniform, and computed by the same salted
        # partial-top-K + merged-threshold + broadcast-filter-back
        # operator the web_host_cap entry oracle-checks (no per-host
        # row_number window: a template-farm host with 10^7 pages never
        # serializes through one task). Runs before the cleaning stages
        # so farm hosts can't dominate the line/substring frequency
        # passes either.
        n_hostcap_dropped = 0
        if host_cap is not None:
            from pdf_extractor_spark.queries.webtext import (
                web_host_cap_of,
            )

            kept = web_host_cap_of(
                gated.select("doc_id", "url"), cap=host_cap
            )
            gated = gated.join(
                kept.select("doc_id"), on="doc_id"
            ).localCheckpoint(eager=True)
            n_hostcap_dropped = n_gated_q - gated.count()
        n_gated_h = n_gated_q - n_hostcap_dropped

        # optional DSIR selection (--dsir-target PATH, Xie et al. 2023
        # "Data Selection for Language Models via Importance
        # Resampling"): keep the --dsir-keep-pm per-mille of the gated
        # batch whose hashed-ngram importance weight ln(p_target/p_raw)
        # is highest — p_target estimated from a reference export (a
        # prior good batch, the --drift-check shape) and p_raw from THIS
        # batch. Both estimations reduce IN-ENGINE to O(DSIR_B) bucket
        # counts (only 2*DSIR_B integers reach the driver; ln happens
        # there), the integer weights broadcast back for an order-free
        # scoring pass, and the cutoff is the exact per-mille histogram
        # point (the corpus is never sorted). Ties share a side, so the
        # trim is a pure function of the batch — deterministic.
        n_dsir_dropped = 0
        dsir_cutoff = None
        if dsir_target is not None:
            from pdf_extractor_spark.queries.webtext import (
                dsir_bucket_counts_of,
                dsir_score_of,
                dsir_weights_from_counts,
                pm_cutoff_of,
            )

            tgt = spark.read.json(dsir_target)
            if "text" not in tgt.columns:
                raise RuntimeError(
                    f"--dsir-target {dsir_target}: target export has "
                    "no text column"
                )
            t_counts = {
                r["bucket"]: r["n"]
                for r in dsir_bucket_counts_of(
                    tgt.select("text")
                ).collect()
            }
            r_counts = {
                r["bucket"]: r["n"]
                for r in dsir_bucket_counts_of(
                    gated.select("text")
                ).collect()
            }
            weights = dsir_weights_from_counts(t_counts, r_counts)
            # checkpoint the O(docs)-row (doc_id, score) table: the
            # cutoff aggregate AND the filter join both consume it, and
            # without a checkpoint Spark re-executes the whole scoring
            # pass (explode + broadcast join + agg over every doc's
            # n-grams) once per consumer — the mix_weights precedent
            scored = dsir_score_of(
                gated.select("doc_id", "text"), weights
            ).localCheckpoint(eager=True)
            dsir_cutoff = pm_cutoff_of(
                scored, col="score", pm=1000 - dsir_keep_pm
            ).collect()[0]["cutoff"]
            gated = gated.join(
                scored.filter(
                    F.col("score") > F.lit(dsir_cutoff)
                ).select("doc_id"),
                on="doc_id",
            ).localCheckpoint(eager=True)
            n_dsir_dropped = n_gated_h - gated.count()
            if n_gated_h and n_dsir_dropped == n_gated_h:
                raise RuntimeError(
                    "--dsir-target: every gated doc is at or below the "
                    f"DSIR cutoff {dsir_cutoff} (degenerate all-tied "
                    "scores); refusing to export an empty corpus"
                )
        n_gated_d = n_gated_h - n_dsir_dropped

        # optional CCNet-style line (segment) boilerplate strip: the
        # frequency pass runs over the gated CHECKPOINT (never a second
        # warehouse scan); cleaned text feeds near-dup detection AND the
        # export, and docs reduced to nothing are dropped. Quality was
        # scored on the original text (gate-then-clean order,
        # documented); n_boiler rides the funnel summary.
        # optional WITHIN-document repeated-segment strip (scraper
        # stutter, pagination echoes) — runs BEFORE the cross-document
        # line-dedup frequency pass so intra-doc repeats can't inflate
        # the corpus boilerplate counts. Pure projection + rejoin on
        # the gated checkpoint; emptied docs are dropped like the
        # line-dedup stage's.
        n_intradoc_segs = 0
        n_gated_intra = n_gated_d
        if line_mode not in ("tokens", "newline"):
            raise ValueError(f"line_mode must be tokens|newline: {line_mode}")
        nl = line_mode == "newline"
        # in newline mode the line stages consume the line-preserving
        # twin and the cleaned twin is re-collapsed into the job's
        # single-line canonical `text` for every downstream stage
        # (equal by construction for untouched docs — see _CANON_NL)
        _stage_in = (
            (lambda g: g.select(
                "doc_id", F.col("text_nl").alias("text")))
            if nl
            else (lambda g: g.select("doc_id", "text"))
        )

        def _stage_out(g, cleaned, cnt_col):
            kept = cleaned.filter(F.length("text_clean") > 0)
            if nl:
                return g.drop("text", "text_nl").join(
                    kept.select(
                        "doc_id",
                        F.col("text_clean").alias("text_nl"),
                        F.expr(
                            r"trim(regexp_replace(text_clean, "
                            r"'\\s+', ' '))"
                        ).alias("text"),
                        cnt_col,
                    ),
                    on="doc_id",
                )
            return g.drop("text").join(
                kept.select(
                    "doc_id",
                    F.col("text_clean").alias("text"),
                    cnt_col,
                ),
                on="doc_id",
            )

        # optional Gopher repetition gate (--gopher-gate): DROP —
        # don't repair — docs whose repetition metrics exceed the
        # published Rae et al. 2021 thresholds (web_gopher_repetition
        # is corpus-agnostic: no stop lists, no language assumptions).
        # Runs BEFORE the cleaning stages, on the same text the rules
        # were published for: in newline mode the real lines (so the
        # dup-line rules bite); in token mode the single-line
        # canonical text (only the n-gram rules can fire — documented).
        n_gopher_dropped = 0
        if gopher_gate:
            from pdf_extractor_spark.queries.webtext import (
                web_gopher_repetition_of,
            )

            gin = gated.select(
                "doc_id",
                (F.col("text_nl") if nl else F.col("text")).alias(
                    "text"
                ),
            )
            flags = web_gopher_repetition_of(gin)
            gated = gated.join(
                flags.filter("gopher_flag = 0").select("doc_id"),
                on="doc_id",
            ).localCheckpoint(eager=True)
            n_gated_intra = gated.count()
            n_gopher_dropped = n_gated_d - n_gated_intra

        if intradoc:
            from pdf_extractor_spark.queries.dedup import dedup_intradoc_of

            cleaned = dedup_intradoc_of(_stage_in(gated), newline=nl)
            gated = _stage_out(gated, cleaned, "n_dup").localCheckpoint(
                eager=True
            )
            agg = gated.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_dup").alias("d"),
            ).collect()[0]
            n_gated_intra = int(agg["n"])
            n_intradoc_segs = int(agg["d"] or 0)
            gated = gated.drop("n_dup")

        n_boiler_segs = 0
        if line_dedup:
            from pdf_extractor_spark.queries.dedup import dedup_lines_of

            cleaned = dedup_lines_of(
                _stage_in(gated), id_col="doc_id", newline=nl
            )
            gated = _stage_out(gated, cleaned, "n_boiler").localCheckpoint(
                eager=True
            )
            agg = gated.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_boiler").alias("b"),
            ).collect()[0]
            n_gated_clean = int(agg["n"])
            n_boiler_segs = int(agg["b"] or 0)
            gated = gated.drop("n_boiler")
        else:
            n_gated_clean = n_gated_intra
        if nl:
            # the twin served the line stages only; everything below
            # (substring-cut, seen-index, near-dup, sampler, export)
            # stays on the single-line canonical `text`
            gated = gated.drop("text_nl")

        # optional exact-substring deletion (Lee et al., the
        # dedup_substring_cut operator): cut every cross-document
        # duplicated W-token span except one global keeper occurrence —
        # catches spans at ARBITRARY offsets that line-dedup's fixed
        # segment grid can miss, so it runs after the cheap passes and
        # before the seen-index/near-dup stages. Emptied docs drop
        # like the other cleaning stages; spans + tokens removed ride
        # the funnel summary.
        n_substr_spans = 0
        n_substr_tokens = 0
        n_substr_bytes = 0
        if substring_cut:
            if substring_mode not in ("tokens", "bytes", "utf8"):
                raise ValueError(
                    f"substring_mode must be tokens|bytes|utf8: "
                    f"{substring_mode}"
                )
            # --substring-mode bytes: the byte-granular ExactSubstr
            # form (web_substring_bytes_cut_of is doc_id-type agnostic
            # — min(struct(doc_id, idx)) works on the job's 120-bit
            # struct keys) — cleaning is a byte-exact splice of kept
            # ranges, so there is no token-rejoin normalization and
            # cuts may land mid-token (inherent to byte semantics).
            # --substring-mode utf8: the same byte-granular contract
            # over raw multi-byte UTF-8 (web_substring_utf8_cut_of)
            # with cut boundaries snapped outward to codepoint starts,
            # so the spliced text is valid UTF-8 by construction — the
            # mode to use when the crawl is not known pure-ASCII; the
            # operator returns the splice as a hex image (its oracle
            # engine cannot slice BLOBs), decoded back to text here.
            if substring_mode == "utf8":
                from pdf_extractor_spark.queries.webtext import (
                    web_substring_utf8_cut_of,
                )

                cleaned = web_substring_utf8_cut_of(
                    gated.select("doc_id", "text")
                ).select(
                    "doc_id",
                    F.expr("decode(unhex(cleaned_hex), 'UTF-8')").alias(
                        "cleaned_text"
                    ),
                    "n_spans_cut",
                    F.expr("n_bytes_before - n_bytes_after").alias(
                        "n_cut_units"
                    ),
                )
            elif substring_mode == "bytes":
                from pdf_extractor_spark.queries.webtext import (
                    web_substring_bytes_cut_of,
                )

                cleaned = web_substring_bytes_cut_of(
                    gated.select("doc_id", "text")
                ).select(
                    "doc_id",
                    "cleaned_text",
                    "n_spans_cut",
                    F.expr("n_bytes_before - n_bytes_after").alias(
                        "n_cut_units"
                    ),
                )
            else:
                from pdf_extractor_spark.queries.dedup import (
                    substring_cut_of,
                )

                cleaned = substring_cut_of(
                    gated.select("doc_id", "text")
                ).select(
                    "doc_id",
                    "cleaned_text",
                    "n_spans_cut",
                    F.expr("n_tokens_before - n_tokens_after").alias(
                        "n_cut_units"
                    ),
                )
            gated = (
                gated.drop("text")
                .join(
                    cleaned.filter(F.length("cleaned_text") > 0).select(
                        "doc_id",
                        F.col("cleaned_text").alias("text"),
                        "n_spans_cut",
                        "n_cut_units",
                    ),
                    on="doc_id",
                )
                .localCheckpoint(eager=True)
            )
            agg = gated.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_spans_cut").alias("s"),
                F.sum("n_cut_units").alias("t"),
            ).collect()[0]
            n_gated_substr = int(agg["n"])
            n_substr_spans = int(agg["s"] or 0)
            if substring_mode in ("bytes", "utf8"):
                n_substr_bytes = int(agg["t"] or 0)
            else:
                n_substr_tokens = int(agg["t"] or 0)
            gated = gated.drop("n_spans_cut", "n_cut_units")
        else:
            n_gated_substr = n_gated_clean

        # optional incremental seen-index (the daily-crawl production
        # shape): a persisted Bloom bitmap remembers every shingle the
        # PREVIOUSLY EXPORTED corpus contained; docs whose shingles are
        # >= seen_drop_pm/1000 already-seen are dropped BEFORE the
        # (expensive) near-dup stage — they are re-crawls or trivial
        # variants of kept content. Bloom has no false negatives, so a
        # genuinely-new doc can only be over-counted (false-positive
        # rate sized by BLOOM_M); at the default 80% threshold a
        # spurious drop needs ~all shingles to false-positive at once.
        n_seen_dropped = 0
        seen_state = None
        _old_bm = None
        if seen_index is not None:
            from pdf_extractor_spark.queries.dedup import (
                BLOOM_K,
                BLOOM_M,
                bloom_seen_of,
            )

            idx = pathlib.Path(seen_index)
            bm_path = idx / "bloom.bin"
            if bm_path.exists():
                meta = json.loads((idx / "_META.json").read_text())
                if meta["m_bits"] != BLOOM_M or meta["k"] != BLOOM_K:
                    raise RuntimeError(
                        f"seen-index {seen_index} was built with "
                        f"m_bits={meta['m_bits']}, k={meta['k']} — "
                        f"incompatible with BLOOM_M={BLOOM_M}, "
                        f"BLOOM_K={BLOOM_K}"
                    )
                _old_bm = bm_path.read_bytes()
                seen = bloom_seen_of(
                    gated.select("doc_id", "text"), _old_bm
                )
                gated = gated.join(
                    seen.filter(
                        F.col("seen_pm") < seen_drop_pm
                    ).select("doc_id"),
                    on="doc_id",
                ).localCheckpoint(eager=True)
                n_seen_dropped = n_gated_substr - gated.count()
                seen_state = "updated"
            else:
                seen_state = "created"

        labels = near_dup_labels_of(gated.select("doc_id", "text"))
        survivors = gated.join(
            labels.filter("keep = 1").select("doc_id"), on="doc_id"
        ).localCheckpoint(eager=True)
        n_survivors = survivors.count()

        # optional benchmark decontamination: drop survivors sharing
        # word n-grams with the eval set BEFORE sampling, so
        # contaminated docs never consume a stratum's budget. The
        # benchmark n-gram set broadcasts (eval sets are tiny vs the
        # corpus) — same operator the catalog oracle-checks.
        n_decontaminated = n_survivors
        if benchmark is not None:
            bench_docs = (
                spark.read.parquet(benchmark)
                if benchmark.endswith(".parquet")
                else spark.read.json(benchmark)
            ).select("text")
            # real text defaults to the production n-gram length
            # (N_CONTAM_PROD=8): the fixture's 4-gram setting is sized
            # for the synthetic ~30-word vocabulary and would chance-
            # collide on natural-language boilerplate, silently
            # dropping clean docs
            from pdf_extractor_spark.queries.contamination import (
                N_CONTAM_PROD,
            )

            flags = contamination_of(
                survivors.select("doc_id", "text"),
                bench_docs,
                n=contam_ngram or N_CONTAM_PROD,
            )
            survivors = survivors.join(
                flags.filter("contaminated = 0").select("doc_id"),
                on="doc_id",
            ).localCheckpoint(eager=True)
            n_decontaminated = survivors.count()

            # optional FUZZY (containment) pass on top: drop survivors
            # holding >= fuzzy_decontam_pm/1000 of any eval doc's word
            # 3-grams — catches mutated/paraphrased copies the exact
            # n-gram pass misses, and cannot be tripped by shared
            # boilerplate (a boilerplate line is a tiny fraction of an
            # eval doc's grams). Same operator the catalog
            # oracle-checks as web_decontaminate_fuzzy. Bench ids are
            # md5(text)-derived — deterministic, and identical eval
            # texts merge (containment unchanged).
            if fuzzy_decontam_pm:
                from pdf_extractor_spark.queries.contamination import (
                    contamination_fuzzy_of,
                )

                fz = contamination_fuzzy_of(
                    survivors.select("doc_id", "text"),
                    bench_docs.select(
                        F.expr(
                            "CAST(conv(substr(md5(text), 1, 15), "
                            "16, 10) AS BIGINT)"
                        ).alias("doc_id"),
                        "text",
                    ),
                    pm=fuzzy_decontam_pm,
                )
                survivors = survivors.join(
                    fz.select("doc_id").distinct(),
                    on="doc_id",
                    how="left_anti",
                ).localCheckpoint(eager=True)
                n_decontaminated = survivors.count()

            # optional SEMANTIC (embedding-cosine) pass — the ladder's
            # third rung: drop survivors whose 64-dim hashed-token
            # embedding points the same way as any eval doc's
            # (cosine >= semantic_decontam_pm/1000, the exact integer
            # comparison — no float in the filter). Catches rephrased
            # eval items with little lexical overlap left for the
            # n-gram rungs. Same operator the catalog oracle-checks as
            # web_decontaminate_semantic; bench vectors broadcast.
            if semantic_decontam_pm:
                from pdf_extractor_spark.queries.contamination import (
                    semantic_contamination_of,
                )

                sem = semantic_contamination_of(
                    survivors.select("doc_id", "text"),
                    bench_docs.select(
                        F.expr(
                            "CAST(conv(substr(md5(text), 1, 15), "
                            "16, 10) AS BIGINT)"
                        ).alias("doc_id"),
                        "text",
                    ),
                    pm=semantic_decontam_pm,
                )
                survivors = survivors.join(
                    sem.select("doc_id").distinct(),
                    on="doc_id",
                    how="left_anti",
                ).localCheckpoint(eager=True)
                n_decontaminated = survivors.count()

        # sampling: either the flat per-(lang, quality-band) stratified
        # budget, or — with --mix-budget N — per-SOURCE (url host) doc
        # budgets derived from the exact-integer token waterfill
        # (corpus_mix_weights → corpus_budget_alloc chain): per-source
        # capacity = its surviving token mass, global budget = N tokens,
        # saturated sources keep everything, the rest get their
        # proportional share converted to a doc budget at the source's
        # own tokens-per-doc rate. Doc selection inside a source is the
        # sampler's two-phase hash-order discipline (broadcast
        # per-source budgets → hash-threshold prefilter → exact rank on
        # ~margin×budget survivors), so no hot source key ever funnels
        # the corpus through one task.
        mix = None
        if mix_budget is not None:
            from pdf_extractor_spark.queries.corpus_select import (
                _BAND,
                SAMPLE_MARGIN,
                waterfill_of,
            )

            src = survivors.withColumn(
                "source",
                F.expr("coalesce(parse_url(url, 'HOST'), 'unknown')"),
            )
            per = (
                src.withColumn(
                    "toks", F.expr("filter(split(text, ' '), t -> t <> '')")
                )
                .groupBy("source")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("w_docs"),
                    F.sum(F.expr("size(toks)"))
                    .cast("long")
                    .alias("cap_tokens"),
                )
            )
            alloc = (
                waterfill_of(per, budget_tokens=mix_budget)
                .withColumn(
                    "n_alloc",
                    F.expr(
                        "CAST(CAST(alloc_tokens AS DECIMAL(38, 0)) "
                        "* w_docs DIV cap_tokens AS BIGINT)"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            h = shuffle_hash_expr("url")
            pre = src.join(
                F.broadcast(
                    alloc.select(
                        "source",
                        "n_alloc",
                        F.col("w_docs").alias("src_docs"),
                    )
                ),
                on="source",
            ).filter(
                F.expr(
                    f"{h} / 4294967296.0 < "
                    f"least({SAMPLE_MARGIN}.0 * n_alloc / src_docs, 1.0)"
                )
            )
            sw = Window.partitionBy("source").orderBy(F.expr(h), "url")
            final = (
                pre.withColumn(
                    "sample_rank", F.row_number().over(sw).cast("long")
                )
                .filter(F.col("sample_rank") <= F.col("n_alloc"))
                .withColumn("quality_band", F.expr(_BAND))
                .select(
                    "url", "ts", "text", "lang_pred", "quality",
                    "quality_band", "sample_rank",
                )
            )
            a = alloc.agg(
                F.count(F.lit(1)).alias("n_sources"),
                F.sum("saturated").alias("n_saturated"),
                F.sum("alloc_tokens").alias("alloc_tokens"),
                F.sum("n_alloc").alias("alloc_docs"),
            ).collect()[0]
            mix = {
                "budget_tokens": mix_budget,
                "sources": int(a["n_sources"]),
                "saturated": int(a["n_saturated"] or 0),
                "alloc_tokens": int(a["alloc_tokens"] or 0),
                "alloc_docs": int(a["alloc_docs"] or 0),
            }
        else:
            sampled_ids = sample_stratified_of(survivors, budget=budget)
            final = survivors.join(
                sampled_ids.select("doc_id", "quality_band", "sample_rank"),
                on="doc_id",
            ).select(
                "url", "ts", "text", "lang_pred", "quality",
                "quality_band", "sample_rank",
            )

        # optional drift gate BEFORE anything is written: the new
        # export's unigram distribution vs the PREVIOUS export
        # (--drift-check <prior out dir>). The hard gate is the OOV
        # mass signal chi-square cannot carry — new_mass_pm per-mille
        # of the batch's token mass unseen in the prior corpus; the
        # chi-square over shared tokens rides the summary for trend
        # monitoring. On breach the job raises and writes NOTHING.
        drift = None
        if drift_check is not None:
            from pdf_extractor_spark.queries.corpus_select import (
                drift_chi2_two,
            )

            prev_exp = spark.read.json(drift_check)
            if "text" not in prev_exp.columns:
                raise RuntimeError(
                    f"--drift-check {drift_check}: previous export has "
                    "no text rows"
                )
            prev_exp = prev_exp.filter(
                F.col("text").isNotNull()
            ).select("text")
            d = drift_chi2_two(prev_exp, final.select("text")).collect()[0]
            drift = {
                "chi2": d["chi2"],
                "n_shared": int(d["n_shared"]),
                "n_new_tokens": int(d["n_new_tokens"]),
                "new_mass_pm": int(d["new_mass_pm"] or 0),
                "max_pm": drift_max_pm,
            }
            if drift["new_mass_pm"] > drift_max_pm:
                raise RuntimeError(
                    "drift gate: "
                    f"{drift['new_mass_pm']}‰ of the new export's "
                    "token mass is unseen in the previous batch "
                    f"(limit {drift_max_pm}‰, chi2={drift['chi2']}, "
                    f"{drift['n_new_tokens']} new token types) — "
                    "refusing to export; inspect the batch or raise "
                    "--drift-max-pm"
                )
        if mix_shards:
            # deterministic mixed export (the corpus_shuffle_shards
            # semantic, keyed on url): seeded-hash shard assignment is
            # a projection, ordering is per-shard only — every rerun
            # and every cluster size produces the same shard files in
            # the same internal order, with no global sort anywhere.
            # NOTE: partition by the FULL seeded hash, never by a
            # precomputed residue — repartition(N, expr) applies
            # pmod(murmur3(expr), N) on top, and murmur3 of the N
            # residue values collides (reproduced: N=2 collapsed both
            # residues into ONE shard, leaving an empty part file);
            # the high-entropy hash spreads uniformly instead, and
            # shard membership stays a pure function of url
            final = (
                final.withColumn(
                    "_h", F.expr(shuffle_hash_expr("url"))
                )
                .repartition(mix_shards, "_h")
                .sortWithinPartitions("_h", "url")
                .drop("_h")
            )
        elif shards:
            final = final.repartition(shards)
        final.write.mode("overwrite").option("compression", "gzip").json(out)
        # explicit schema: inference would crash on an all-empty output
        # (legit when a partition range has no surviving docs)
        n_out = spark.read.schema(final.schema).json(out).count()

        # create/advance the seen-index AFTER export: the bitmap's
        # contract is "shingles of everything this index's corpus has
        # ever exported", so the new export's shingles are OR-merged
        # into the previous bitmap (never rebuilt — O(new batch) work
        # per day, the whole point) and the file replaced atomically.
        if seen_index is not None:
            import os

            import numpy as np

            from pdf_extractor_spark.queries.dedup import (
                bloom_bitmap_bytes,
                shingle_keys_of,
            )

            idx = pathlib.Path(seen_index)
            idx.mkdir(parents=True, exist_ok=True)
            exported = spark.read.schema(final.schema).json(out)
            new_bm = np.frombuffer(
                bloom_bitmap_bytes(
                    shingle_keys_of(exported.select("text"))
                ),
                dtype=np.uint8,
            )
            if _old_bm is not None:
                new_bm = new_bm | np.frombuffer(_old_bm, dtype=np.uint8)
            tmp = idx / "bloom.bin.tmp"
            tmp.write_bytes(new_bm.tobytes())
            os.replace(tmp, idx / "bloom.bin")
            from pdf_extractor_spark.queries.dedup import BLOOM_K, BLOOM_M

            (idx / "_META.json").write_text(
                json.dumps(
                    {"m_bits": BLOOM_M, "k": BLOOM_K,
                     "seen_drop_pm": seen_drop_pm},
                    sort_keys=True,
                )
            )

        # tokenizer-training report AFTER export: BPE merges are learned
        # on exactly what shipped (the read-back export, the seen-index
        # discipline) so the published merge list is a pure function of
        # the corpus artifact — rerun-identical because the export is.
        # Cost: one word-count pass over the export + bpe_rounds O(V)
        # aggregates (Heaps-law V is sublinear in corpus size).
        bpe = None
        if bpe_rounds:
            from pdf_extractor_spark.queries.webtext import (
                WEB_TOKS_S,
                _bpe_train_syms,
            )

            exported_docs = spark.read.schema(final.schema).json(out)
            merges, syms = _bpe_train_syms(
                exported_docs.select("text"), rounds=bpe_rounds
            )
            wtok = syms.select(
                "w",
                F.size(F.split(F.trim(F.col("sym")), " "))
                .cast("long")
                .alias("t"),
            )
            tot = (
                exported_docs.select(
                    F.explode(F.expr(WEB_TOKS_S)).alias("w")
                )
                .join(F.broadcast(wtok), "w")
                .agg(
                    F.count(F.lit(1)).alias("ws"),
                    F.sum("t").alias("bpe"),
                )
                .collect()[0]
            )
            bpe = {
                "rounds": len(merges),
                "merges": [[p, m, int(n)] for _, p, m, n in merges],
                "tokens_ws": int(tot["ws"] or 0),
                "tokens_bpe": int(tot["bpe"] or 0),
            }

        summary = {
            "warehouse_snapshot": read_snapshot_id,
            "rows_in": n_in,
            "rows_clean": n_docs,
            "rows_gated": n_gated,
            "rows_quality_tail_dropped": n_tail_dropped,
            "quality_cuts": quality_cuts,
            "rows_hostcap_dropped": n_hostcap_dropped,
            "rows_dsir_dropped": n_dsir_dropped,
            "dsir_cutoff": dsir_cutoff,
            "rows_gopher_dropped": n_gopher_dropped,
            "rows_intradoc_cleaned": n_gated_intra,
            "intradoc_segments_removed": n_intradoc_segs,
            "rows_line_cleaned": n_gated_clean,
            "boiler_segments_removed": n_boiler_segs,
            "rows_substr_cleaned": n_gated_substr,
            "substr_spans_removed": n_substr_spans,
            "substr_tokens_removed": n_substr_tokens,
            "substr_bytes_removed": n_substr_bytes,
            "rows_seen_dropped": n_seen_dropped,
            "seen_index": seen_state,
            "rows_survivors": n_survivors,
            "rows_decontaminated": n_decontaminated,
            "rows_exported": n_out,
            "budget_per_stratum": budget,
            "mix": mix,
            "drift": drift,
            "bpe": bpe,
            "out": out,
        }
        (pathlib.Path(out) / "_SUMMARY.json").write_text(
            json.dumps(summary, indent=1, sort_keys=True)
        )
        gated.unpersist()
        survivors.unpersist()
        return summary
    finally:
        spark.conf.set(tz_key, prev_tz)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=SAMPLE_BUDGET)
    ap.add_argument("--min-chars", type=int, default=1)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument(
        "--benchmark", default=None,
        help="path to eval-set docs (parquet or jsonl with a `text` "
        "column); survivors sharing word n-grams with it are dropped "
        "before sampling",
    )
    ap.add_argument(
        "--fuzzy-decontam-pm", type=int, default=None,
        help="with --benchmark: ALSO drop survivors holding >= N/1000 "
        "of any eval doc's word 3-grams (containment form — catches "
        "paraphrased copies exact n-grams miss; boilerplate-immune)",
    )
    ap.add_argument(
        "--semantic-decontam-pm", type=int, default=None,
        help="with --benchmark: ALSO drop survivors whose 64-dim "
        "hashed-token embedding reaches cosine >= N/1000 vs any eval "
        "doc (exact integer threshold — catches rephrasings with "
        "little lexical overlap left for the n-gram rungs)",
    )
    ap.add_argument(
        "--intradoc", action="store_true",
        help="strip WITHIN-document repeated segments (scraper stutter) "
        "after gating, before the cross-document passes",
    )
    ap.add_argument(
        "--line-dedup", action="store_true",
        help="strip cross-document repeated segments (CCNet line dedup) "
        "after gating, before near-dup detection and export",
    )
    ap.add_argument(
        "--line-mode", choices=("tokens", "newline"), default="tokens",
        help="segmenter for --line-dedup/--intradoc: 'tokens' = "
        "8-token windows (corpora without newlines); 'newline' = real "
        "trimmed lines (the production form on extracted text — "
        "untouched docs stay byte-identical)",
    )
    ap.add_argument(
        "--substring-cut", action="store_true",
        help="cut cross-document duplicated W-token spans keeping one "
        "global occurrence (Lee et al. exact-substring deletion) after "
        "the segment passes, before near-dup detection; uncut docs pass "
        "through byte-identical, cut docs are re-joined single-spaced "
        "(token-range deletion normalizes whitespace)",
    )
    ap.add_argument(
        "--substring-mode", choices=("tokens", "bytes", "utf8"),
        default="tokens",
        help="granularity for --substring-cut: 'tokens' = W-token "
        "windows with token-rejoin; 'bytes' = 40-byte windows with "
        "byte-exact splicing of kept ranges (no rejoin normalization; "
        "cuts may land mid-token — the Lee et al. byte form; assumes "
        "single-byte text); 'utf8' = the byte form with cut boundaries "
        "snapped outward to UTF-8 codepoint starts, so the spliced "
        "text stays valid UTF-8 on multi-byte corpora",
    )
    ap.add_argument(
        "--mix-shards", type=int, default=None,
        help="export as N deterministically hash-mixed shards "
        "(rerun-identical order, no global sort)",
    )
    ap.add_argument(
        "--contam-ngram", type=int, default=None,
        help="n-gram length for --benchmark decontamination "
        "(default: the production setting N_CONTAM_PROD=8)",
    )
    ap.add_argument(
        "--seen-index", default=None,
        help="directory holding the incremental seen-index (Bloom "
        "bitmap of every previously-exported shingle); first run "
        "creates it, later runs drop >= --seen-drop-pm/1000-seen docs "
        "before near-dup and advance the bitmap",
    )
    ap.add_argument(
        "--seen-drop-pm", type=int, default=800,
        help="per-mille seen-shingle threshold above which a doc is "
        "dropped as already-kept content (default 800)",
    )
    ap.add_argument(
        "--mix-budget", type=int, default=None,
        help="global token budget: per-source (url host) doc budgets "
        "come from the exact-integer waterfill over surviving token "
        "mass (replaces the flat per-stratum sampling budget)",
    )
    ap.add_argument(
        "--drift-check", default=None,
        help="previous export directory: gate this export's unigram "
        "distribution against it (corpus_drift_chi2) and refuse to "
        "write when > --drift-max-pm per-mille of token mass is unseen",
    )
    ap.add_argument(
        "--gopher-gate", action="store_true",
        help="drop (not repair) docs whose Gopher repetition metrics "
        "exceed the published Rae et al. 2021 thresholds, before the "
        "cleaning stages; with --line-mode newline the dup-line rules "
        "run on real lines",
    )
    ap.add_argument(
        "--drift-max-pm", type=int, default=500,
        help="per-mille new-token-mass threshold for --drift-check "
        "(default 500)",
    )
    ap.add_argument(
        "--quality-buckets", action="store_true",
        help="CCNet-style corpus-relative quality trim: split the "
        "gated corpus into equal-mass head/middle/tail tertiles of the "
        "quality score (exact histogram cutoffs — the corpus is never "
        "sorted) and DROP the tail bucket before any cleaning stage; "
        "funnel reports the cutoffs and the dropped count",
    )
    ap.add_argument(
        "--host-cap", type=int, default=None,
        help="RefinedWeb-style per-host contribution cap: keep at most "
        "K docs per url host (the K smallest md5(url) — deterministic), "
        "applied before the cleaning stages so template-farm hosts "
        "can't dominate them",
    )
    ap.add_argument(
        "--dsir-target", default=None,
        help="DSIR selection (Xie et al. 2023): path to a reference "
        "export (the --drift-check shape) defining the TARGET "
        "distribution; keeps the --dsir-keep-pm per-mille of the gated "
        "batch with the highest hashed-ngram importance weight "
        "ln(p_target/p_raw) — bucket counts reduce in-engine to "
        "O(DSIR_B) rows, ln is driver-side, the cutoff is the exact "
        "per-mille histogram point",
    )
    ap.add_argument(
        "--dsir-keep-pm", type=int, default=500,
        help="per-mille of the gated batch kept by --dsir-target "
        "(default 500 = the more-target-like half; ties at the cutoff "
        "share a side)",
    )
    ap.add_argument(
        "--bpe-report", type=int, default=None,
        help="learn N BPE merges on the READ-BACK export after writing "
        "it (tokenizer training on exactly what shipped) and publish "
        "the merge list + whitespace/BPE token totals in the funnel",
    )
    ap.add_argument(
        "--warehouse-tag", default=None, metavar="NAME",
        help="read the extracted table AS OF this snapshot tag "
        "(IceTable named ref — pin a build to 'the snapshot run X "
        "trained on'; a concurrent extract append cannot change what "
        "this build reads, and the tag shields that snapshot from "
        "expire_snapshots until released); the snapshot id actually "
        "read is reported in the funnel either way",
    )
    ap.add_argument("--partitions", nargs="*", default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args(argv)

    spark = build_session(args.master, args.shuffle_partitions)
    summary = build_corpus(
        spark, args.warehouse, args.out, args.budget,
        args.min_chars, args.shards, args.partitions,
        benchmark=args.benchmark, mix_shards=args.mix_shards,
        fuzzy_decontam_pm=args.fuzzy_decontam_pm,
        semantic_decontam_pm=args.semantic_decontam_pm,
        contam_ngram=args.contam_ngram, line_dedup=args.line_dedup,
        intradoc=args.intradoc, line_mode=args.line_mode,
        substring_cut=args.substring_cut,
        substring_mode=args.substring_mode,
        seen_index=args.seen_index, seen_drop_pm=args.seen_drop_pm,
        mix_budget=args.mix_budget, drift_check=args.drift_check,
        drift_max_pm=args.drift_max_pm, gopher_gate=args.gopher_gate,
        quality_buckets=args.quality_buckets,
        host_cap=args.host_cap,
        dsir_target=args.dsir_target, dsir_keep_pm=args.dsir_keep_pm,
        bpe_rounds=args.bpe_report,
        warehouse_tag=args.warehouse_tag,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
