"""Physical-plan regression tests: the properties that make this engine
scale are asserted on the EXECUTED plan string, so a refactor that
silently introduces a shuffle, loses a broadcast, or un-pushes a filter
fails CI — not a 100 TB run."""

from __future__ import annotations

import pytest

from pdf_extractor_spark.operators.extract import extract_stage
from pdf_extractor_spark.queries import CATALOG

from tests.conftest import GOLDEN_DIR

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages(spark):
    return spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))


def test_extract_small_branch_has_no_shuffle(spark, pages):
    plan = plan_of(extract_stage(pages.filter("length(html) < 4194304")))
    assert "Exchange" not in plan


def test_extract_prunes_to_three_columns(spark, pages):
    plan = plan_of(extract_stage(pages))
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "url" in scan and "html" in scan
    # the crawled text/lang columns must never reach the scan
    assert "text#" not in scan and "lang#" not in scan


def test_fuzzy_match_broadcasts_dictionary(spark):
    plan = plan_of(CATALOG["o17_fuzzy_match"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_conf_filter_pushes_predicate_to_scan(spark):
    plan = plan_of(CATALOG["o7_conf_filter"].fn(spark, SF))
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert ">= 0.5" in scan  # DataFilters reached the parquet reader


def test_embedding_topk_broadcasts_queries(spark):
    plan = plan_of(CATALOG["embedding_topk"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_freq_topk_is_take_ordered(spark):
    """The global top-K must compile to TakeOrderedAndProject (per-task
    K-heaps, K rows to the driver) — never a row_number window with no
    partitionBy, which funnels every distinct bigram through one task."""
    plan = plan_of(CATALOG["text_ngram_freq"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_projection_queries_have_no_shuffle(spark):
    for name in ("text_quality", "text_fingerprint", "dedup_simhash",
                 "o9_fallback_chain", "o21_locale_normalize",
                 "text_embed_hash", "pii_scrub"):
        plan = plan_of(CATALOG[name].fn(spark, SF))
        assert "Exchange" not in plan, f"{name} grew a shuffle"


def test_stratified_sample_broadcasts_counts(spark):
    """The two-phase sampler's prefilter must join the per-stratum
    counts via BROADCAST (the whole point: no document shuffle before
    the prefilter) and the only sort-shuffle is the tiny survivor-set
    rank window."""
    plan = plan_of(CATALOG["corpus_sample_stratified"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_centroid_assignment_is_projection(spark):
    """Learned-centroid IVF: the candidate side's bucket assignment is
    literal-centroid arithmetic — a pure projection. The plan's only
    exchanges are the broadcast of the tiny probed-query side and the
    final per-query top-k window; no sort-merge join anywhere."""
    plan = plan_of(CATALOG["embedding_centroid_topk"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_text_centroid_never_cartesian(spark):
    """The text-vector scale path (text_embed_centroid_topk) must keep
    the bucket equi-join shape: broadcast of the tiny probed-query side,
    no SortMergeJoin and — unlike the exact text_embed_topk baseline —
    no cartesian/broadcast-nested-loop scan of the whole table."""
    plan = plan_of(CATALOG["text_embed_centroid_topk"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """Decontamination must probe the (tiny) benchmark n-gram set via
    broadcast — the 10^12-doc training mass never shuffles for the
    overlap join; the only document shuffle is the groupBy(doc_id)
    overlap count. No sort-merge join, no cartesian."""
    plan = plan_of(CATALOG["decontaminate"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_never_cartesian(spark):
    """Batch-vs-corpus dedup must stay equi-join shaped end to end:
    band-key probes and hash-key joins only — no cartesian, no
    broadcast-nested-loop fallback anywhere in the composed plan."""
    plan = plan_of(CATALOG["dedup_incremental"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mix_report_broadcasts_total(spark):
    """The grand-total token count must come back as a broadcast of a
    1-row aggregate — never a single-partition global window over the
    grouped result; no sort-merge join; and the corpus is scanned ONCE
    (the grouped aggregate is checkpointed before the total derives
    from it — without that the regex feature pipeline runs twice)."""
    plan = plan_of(CATALOG["corpus_mix_report"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "FileScan" not in plan  # both branches read the checkpoint


def test_shuffle_shards_has_no_global_sort(spark):
    """Shard assignment is a projection and intra-shard ordering is a
    per-shard window sort after a hash exchange on `shard` — a global
    range-partitioned sort anywhere means the plan regressed to a total
    ordering that cannot scale."""
    plan = plan_of(CATALOG["corpus_shuffle_shards"].fn(spark, SF))
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(shard" in plan


def test_range_join_is_binned_equi_join(spark):
    """The range join must compile to an equi-join on (user_id, bin) —
    never the naive inequality form, which Spark would execute as a
    per-user nested loop (quadratic for power users)."""
    plan = plan_of(CATALOG["events_range_join"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rollup_is_single_scan(spark):
    """Both grains must come from ONE scan (GROUPING SETS -> Expand),
    never a union of per-grain subplans re-reading the table."""
    plan = plan_of(CATALOG["events_rollup"].fn(spark, SF))
    assert plan.count("FileScan") == 1
    assert "Expand" in plan


def test_line_dedup_text_never_shuffles(spark):
    """Pass 1 (segment frequency) may exchange only md5 hashes; the
    frequent set must come back as a 1-row BROADCAST attached to the
    document side with a broadcast join — if the document mass (the
    `segs`/`text` column) ever crosses an Exchange, or the attach
    regresses to a sort-merge join, the 100 TB story is gone."""
    plan = plan_of(CATALOG["dedup_lines"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row freq crossJoin
    assert "SortMergeJoin" not in plan
    # every Exchange in the plan carries only hash-stat columns
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "segs" not in head and "text" not in head, head


def test_pack_sequences_has_no_global_sort(spark):
    """Packing's prefix sum must be a per-shard window (hash exchange
    on `shard`) — a range partitioning anywhere means the plan
    regressed to a global total order."""
    plan = plan_of(CATALOG["corpus_pack_sequences"].fn(spark, SF))
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(shard" in plan


def test_text_rarity_text_never_shuffles(spark):
    """The unigram join-back may exchange only (doc_id, tok) pairs and
    the vocab table — never document text; the vocab side must be
    joinable (broadcast at this size, hash exchange at scale), never a
    cartesian."""
    plan = plan_of(CATALOG["text_rarity"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "text" not in head, head


def test_hll_has_no_window_and_no_distinct_prepass(spark):
    """The HLL sketch's whole point vs KMV: register maxima are plain
    hash aggregates (map-side partials apply), so the plan must contain
    NO Window and NO Sort — and only the two grouping shuffles."""
    plan = plan_of(CATALOG["sketch_distinct_hll"].fn(spark, SF))
    assert "Window" not in plan
    assert "Sort" not in plan.replace("SortAggregate", "")
    assert plan.count("Exchange") <= 2


def test_tfidf_broadcasts_corpus_total(spark):
    """n_docs rides in as a broadcast 1-row crossJoin, never a global
    window over the (doc, tok) mass."""
    plan = plan_of(CATALOG["text_tfidf_topk"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    # tf is checkpointed once; only the n_docs count branch re-scans
    assert plan.count("FileScan") == 1


def test_mix_weights_single_scan(spark):
    """After the per-source agg is checkpointed, the weight/total
    arithmetic must not re-scan the corpus."""
    plan = plan_of(CATALOG["corpus_mix_weights"].fn(spark, SF))
    assert plan.count("FileScan") == 0  # checkpointed aggregate only
    assert "BroadcastNestedLoopJoin" in plan


def test_substring_spans_text_never_shuffles(spark):
    """All Exchanges in the exact-substring plan may carry only
    (doc_id, idx, hash)-shaped rows — window strings and document text
    must stay projection-local."""
    plan = plan_of(CATALOG["dedup_substring_spans"].fn(spark, SF))
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "text" not in head and "toks" not in head, head
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_quantize_is_pure_projection(spark):
    plan = plan_of(CATALOG["embedding_quantize_int8"].fn(spark, SF))
    assert "Exchange" not in plan


def test_substring_cut_text_never_shuffles(spark):
    """The deletion pass's Exchanges may carry only (doc_id, idx,
    hash)-shaped rows or the tiny per-doc range lists — the document
    text itself must stay projection-local (it is joined to the
    AQE-broadcast range table, never shuffled)."""
    plan = plan_of(CATALOG["dedup_substring_cut"].fn(spark, SF))
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "text" not in head and "toks" not in head, head


def test_winnow_text_never_shuffles(spark):
    """Winnowing's only Exchange keys on doc_id for the window pass
    and the report agg — hashes shuffle, text does not."""
    plan = plan_of(CATALOG["text_winnow"].fn(spark, SF))
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "text" not in head and "toks" not in head, head


def test_budget_alloc_single_scan(spark):
    """The waterfill's data pass is ONE scan to an O(#sources) agg;
    everything downstream (windows, chain condition, allocation) runs
    on the tiny per-source table."""
    df = CATALOG["corpus_budget_alloc"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("FileScan") <= 2  # per + tot branches off one agg
    assert "SortMergeJoin" not in plan


def test_byte_substring_family_text_never_shuffles(spark):
    """The byte-level ExactSubstr family (spans / strided / cut): every
    Exchange may carry only (doc_id, idx, md5)-shaped rows or the tiny
    per-doc range lists — the document text appears in the window
    projection and the final splice join only, never in a shuffle."""
    for name in (
        "web_dedup_substring_bytes",
        "web_substring_bytes_strided",
        "web_substring_bytes_cut",
    ):
        plan = plan_of(CATALOG[name].fn(spark, SF))
        for frag in plan.split("Exchange")[1:]:
            head = frag.split("\n", 1)[0]
            assert "text" not in head, (name, head)


def test_gopher_gram_stage_single_scan(spark):
    """web_gopher_repetition: Exchanges carry gram hashes / counted
    masses, never document text; the five n-gram sizes ride ONE
    exploded projection (no per-n re-scan of the fixture: at most
    one scan feeds the gram pipeline plus one for line/total stats
    and one for per-token positions)."""
    plan = plan_of(CATALOG["web_gopher_repetition"].fn(spark, SF))
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "text" not in head, head
    assert plan.count("FileScan") <= 3, plan.count("FileScan")


def test_embedding_pq_topk_broadcasts_queries(spark):
    """PQ/ADC: codes + reconstruction are projections over literal
    codebooks; the query side BROADCASTs into the ADC theta join (no
    SortMergeJoin anywhere — the corpus streams past the 10-row query
    table twice: shortlist, then exact re-rank of shortlist rows
    only)."""
    plan = plan_of(CATALOG["embedding_pq_topk"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
