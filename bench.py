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


def bench_corpus(n_rows: int) -> str:
    from pdf_extractor_spark.corpus.build import write_pages_parquet

    path = pathlib.Path(
        f"/tmp/spark_graft_bench/pages_s{BENCH_SEED}_n{n_rows}"
        f"_d{BENCH_DAYS}_g{GIANT_HTML}x{GIANT_PDF}.parquet"
    )
    if not path.exists():
        write_pages_parquet(
            path, BENCH_SEED, n_rows, BENCH_DAYS, GIANT_HTML, GIANT_PDF
        )
    return str(path)


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
    "event_sessions",
    "embedding_topk",
    "embedding_multiprobe_clustered",
    "embedding_ivf_topk",
    "embedding_ivf_multiprobe",
    "text_lang_id",
    "text_quality",
    "text_fingerprint",
    "o11_struct_extract",
    "corpus_select",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_rows = int(os.environ.get("BENCH_CORPUS_ROWS", "50000"))
    sf = float(pathlib.Path(sf_dir).name.removeprefix("sf") or "0.1")

    corpus_path = bench_corpus(corpus_rows)

    from pdf_extractor_spark.operators.extract import (
        extract_stage,
        extract_stage_dispatch,
    )
    from pdf_extractor_spark.operators.skew import salted_repartition
    from pdf_extractor_spark.queries import CATALOG

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # warm the JVM/Arrow paths so q1 doesn't pay one-time init
    run_to_completion(spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000))

    # min-of-3: this sandbox VM sees heavy shared-host CPU steal (identical
    # runs swing 2-4x); the least-interfered run is the measurement
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            run_to_completion(CATALOG[name].fn(spark, sf_dir))
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)

    # extraction throughput, both skew strategies; headline = dispatch
    # (two-branch: zero-shuffle small mass + one-giant-per-task tail)
    pages = spark.read.parquet(corpus_path)
    n_docs = pages.count()
    salted_best = float("inf")
    extract_s = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        run_to_completion(extract_stage(salted_repartition(pages, cpus * 2)))
        salted_best = min(salted_best, time.monotonic() - t0)
        t0 = time.monotonic()
        run_to_completion(extract_stage_dispatch(pages))
        extract_s = min(extract_s, time.monotonic() - t0)
    timings["extract_pages_salted"] = round(salted_best, 3)
    timings["extract_pages"] = round(extract_s, 3)

    total = round(sum(timings.values()), 3)
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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
