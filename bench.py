"""Benchmark harness: runs the headline queries + the extraction pipeline
and prints ONE JSON line for the driver.

  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] cores (default 32)
  BENCH_CORPUS_ROWS   extraction bench corpus size (default 20000)

Every query is forced end-to-end with a noop-format write (full plan
execution, no driver collect). The extraction corpus is generated
deterministically (seed 42, heavy-tailed sizes + giant-blob outliers)
and cached under /tmp keyed by its parameters, so repeated runs and the
scaling harness (scripts/scaling_bench.py) see identical input.

Steal resistance (this sandbox VM sees heavy shared-host CPU steal;
identical runs swing 2-4×): every timed entry is the MINIMUM over
N_PASSES runs, and the passes are INTERLEAVED — pass 1 runs every query
once, then pass 2, then pass 3 — so a multi-second steal window degrades
one attempt of many queries instead of all attempts of a few. Back-to-
back min-of-3 (the round-2 scheme) was defeated by steal windows longer
than 3× a single query; a full pass takes ~30 s, longer than typical
steal bursts, making per-query minimums reproducible across windows.

The extraction entry additionally reports a stage breakdown:
`extract_scan_s` times the scan+write skeleton alone (same corpus, no
UDF), so `extract_pages - extract_scan_s` isolates the Arrow-batch UDF
cost — the part extractor optimizations actually move.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BENCH_SEED = 42
BENCH_DAYS = 8
GIANT_HTML = 6
GIANT_PDF = 2
N_PASSES = 3
WARC_FILES = 32  # file = the WARC parallel unit; files ≫ is the real shape
# Row-group size bounds the MINIMUM scan-split unit (parquet readers
# cannot split inside a row group). The default 5000-row groups gave the
# 50k-doc corpus only 16 splits — the dispatch plan's zero-shuffle small
# branch was capped at 16 tasks on 32 cores, and the salted full-shuffle
# plan LOOKED faster purely by buying back parallelism the scan should
# have had (caught session 4: salted 4.2 s vs dispatch 5.7 s, both
# windows). 500-row groups + 512 KB maxPartitionBytes put the bench in
# the splits ≫ cores regime a real 100 TB scan is always in — the same
# methodology scripts/scaling_bench.py has used since round 2.
BENCH_BATCH_ROWS = 500
MAX_PARTITION_BYTES = 512 * 1024


def bench_corpus(n_rows: int) -> str:
    from pdf_extractor_spark.corpus.build import write_pages_parquet

    path = pathlib.Path(
        f"/tmp/spark_graft_bench/pages_s{BENCH_SEED}_n{n_rows}"
        f"_d{BENCH_DAYS}_g{GIANT_HTML}x{GIANT_PDF}"
        f"_b{BENCH_BATCH_ROWS}.parquet"
    )
    if not path.exists():
        write_pages_parquet(
            path, BENCH_SEED, n_rows, BENCH_DAYS, GIANT_HTML, GIANT_PDF,
            batch_rows=BENCH_BATCH_ROWS,
        )
    return str(path)


def bench_warc_corpus(n_rows: int) -> str:
    """The SAME generated rows (minus the giant tail) as .warc.gz files —
    WARC's parallel unit is the file, so the corpus is split across
    WARC_FILES members-per-file archives. Cached like the parquet form."""
    from pdf_extractor_spark.corpus.generator import generate_rows
    from pdf_extractor_spark.sources.warc import write_warc_dir

    d = pathlib.Path(
        f"/tmp/spark_graft_bench/warc_s{BENCH_SEED}_n{n_rows}"
        f"_d{BENCH_DAYS}_f{WARC_FILES}"
    )
    done = d / "_DONE"
    if not done.exists():
        rows = list(generate_rows(BENCH_SEED, n_rows, BENCH_DAYS))
        write_warc_dir(d, rows, WARC_FILES)
        done.touch()
    return str(d)


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pdf_extractor_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config(
            "spark.sql.files.maxPartitionBytes", str(MAX_PARTITION_BYTES)
        )
        .getOrCreate()
    )


def run_to_completion(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# The headline subset: one per operator family, weighted toward the
# shuffle/join-heavy ones where plan quality shows.
HEADLINE = [
    "o8_reading_order",
    "o17_fuzzy_match",
    "o18_dedup_keep_best",
    "o15_item_validate",
    "o21_locale_normalize",
    "lineage_agg",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "ngram_jaccard",
    "dedup_near_pipeline",
    "dedup_clusters_star",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "text_semantic_dedup",
    "dedup_incremental",
    "dedup_lines",
    "dedup_intradoc",
    "dedup_substring_spans",
    "dedup_substring_strided",
    "dedup_substring_cut",
    "decontaminate",
    "event_sessions",
    "events_asof_join",
    "events_range_join",
    "events_rollup",
    "events_cohort_retention",
    "events_funnel",
    "events_sliding_window",
    "sketch_distinct_kmv",
    "sketch_distinct_kmv_partial",
    "sketch_distinct_hll",
    "dedup_bloom_probe",
    "dedup_bloom_probe_bitmap",
    "dedup_cms_hot",
    "embedding_topk",
    "embedding_multiprobe_clustered",
    "embedding_ivf_topk",
    "embedding_ivf_multiprobe",
    "embedding_centroid_topk",
    "embedding_centroid_clustered",
    "embedding_quantize_int8",
    "text_lang_id",
    "text_quality",
    "text_fingerprint",
    "text_winnow",
    "dedup_winnow_pairs",
    "dedup_jaccard_prefix_web",
    "web_dedup_lines",
    "web_dedup_intradoc",
    "web_dedup_lines_cut",
    "dedup_winnow_pairs_web",
    "web_quality_classify",
    "web_quality_buckets",
    "web_dsir_weights",
    "web_lm_perplexity",
    "web_ppl_buckets",
    "web_bpe_pairs",
    "web_bpe_train",
    "web_bpe_tokens",
    "web_bpe_encode",
    "web_split_leakage",
    "web_split_by_cluster",
    "web_decontaminate_fuzzy",
    "web_decontaminate_semantic",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "text_embed_hash",
    "text_embed_topk",
    "text_embed_centroid_topk",
    "o11_struct_extract",
    "corpus_select",
    "corpus_sample_stratified",
    "corpus_sample_priority",
    "text_repetition",
    "text_rarity",
    "text_tfidf_topk",
    "text_length_percentiles",
    "corpus_mix_report",
    "corpus_mix_weights",
    "corpus_budget_alloc",
    "corpus_shuffle_shards",
    "corpus_pack_sequences",
    "corpus_filter_report",
    "web_dedup_substring_bytes",
    "web_substring_bytes_strided",
    "web_substring_bytes_cut",
    "web_substring_utf8_cut",
    "web_gopher_repetition",
    "web_gopher_quality",
    "web_c4_filter",
    "web_url_filter",
    "web_host_cap",
    "web_dedup_near_keep",
    # media near-dup chains (fixture-scale inputs; the timing tracks the
    # band-join + cluster plan shape, not corpus volume)
    "media_phash_pairs",
    "media_audiofp_pairs",
    "media_vhash_pairs",
    "media_dedup_manifest",
    "image_pairs_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_rows = int(os.environ.get("BENCH_CORPUS_ROWS", "50000"))
    sf = float(pathlib.Path(sf_dir).name.removeprefix("sf") or "0.1")

    corpus_path = bench_corpus(corpus_rows)
    warc_path = bench_warc_corpus(corpus_rows)

    from pdf_extractor_spark.operators.extract import (
        extract_stage,
        extract_stage_dispatch,
    )
    from pdf_extractor_spark.operators.links import links_stage
    from pdf_extractor_spark.operators.skew import salted_repartition
    from pdf_extractor_spark.queries import CATALOG
    from pdf_extractor_spark.sources.warc import read_warc

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    def record(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        timings[name] = round(min(timings.get(name, float("inf")), dt), 3)

    # warm the JVM/Arrow paths so q1 doesn't pay one-time init
    run_to_completion(spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000))

    # interleaved min-of-N (see module docstring): pass-major order
    for _ in range(N_PASSES):
        for name in HEADLINE:
            record(name, lambda n=name: run_to_completion(
                CATALOG[n].fn(spark, sf_dir)))

    # extraction family, interleaved the same way; headline = dispatch
    # (two-branch: zero-shuffle small mass + one-giant-per-task tail)
    pages = spark.read.parquet(corpus_path)
    n_docs = pages.count()
    for _ in range(N_PASSES):
        record("extract_pages_salted", lambda: run_to_completion(
            extract_stage(salted_repartition(pages, cpus * 2))))
        record("extract_pages", lambda: run_to_completion(
            extract_stage_dispatch(pages)))
        # stage breakdown: the scan+write skeleton without the UDF — the
        # extract_pages minus this is the extractor's own cost
        record("extract_scan_only", lambda: run_to_completion(pages))
        # WARC connector end-to-end: gzip-member parse + extraction,
        # file-level parallelism (WARC_FILES files)
        record("warc_extract", lambda: run_to_completion(
            extract_stage_dispatch(read_warc(spark, warc_path))))
        # outlink stage over the same corpus (link-graph arm)
        record("extract_links", lambda: run_to_completion(
            links_stage(salted_repartition(pages, cpus * 2))))

    # extract_scan_only is a measurement skeleton (the breakdown
    # baseline), not a workload — keep it out of the cross-round total
    total = round(
        sum(v for k, v in timings.items() if k != "extract_scan_only"), 3
    )
    extract_s = timings["extract_pages"]
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "extract_docs": n_docs,
                "extract_docs_per_sec": round(n_docs / extract_s, 1),
                "extract_udf_s": round(
                    max(extract_s - timings["extract_scan_only"], 0.0), 3
                ),
                "warc_docs_per_sec": round(
                    corpus_rows / timings["warc_extract"], 1
                ),
                "bench_passes": N_PASSES,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
