"""The vectorized extraction stage — the graft of the reference's entire
per-request pipeline (/root/reference/main.py:24-42 →
/root/reference/pdf_processor.py:151-186) into ONE ``mapInPandas`` stage.

Design (SURVEY.md §4.3):
- Payload bytes flow Parquet → Arrow RecordBatch → pandas — never to a temp
  file (reference staged every upload to disk, main.py:28-31).
- ``mapInPandas`` with the iterator form: per-task init happens once per
  Python worker, not once per row (reference re-initialized every engine per
  request, main.py:34 — SURVEY.md O2 reversal).
- Dispatch (O3) happens per element INSIDE the Arrow batch; no per-row
  Python outside the UDF, no driver-side loops.
- Incoming batches are re-chunked by cumulative payload BYTES, not row
  count, so one Arrow batch of giant blobs cannot blow worker memory
  (SURVEY.md §4.2 skew row).
- Output rows carry the full ``extracted`` schema (FIXTURES.md §4):
  blocks as ARRAY<STRUCT>, per-row error column (O23), n_blocks/n_chars.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_extractor_spark.version import EXTRACTOR_VERSION

# Target max payload bytes handed to one inner loop iteration; an Arrow
# batch bigger than this is split. Giant single rows still go through alone.
BATCH_TARGET_BYTES = 32 * 1024 * 1024

BLOCK_TYPE = T.StructType(
    [
        T.StructField("idx", T.IntegerType()),
        T.StructField("tag_path", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("text_density", T.DoubleType()),
        T.StructField("link_density", T.DoubleType()),
        T.StructField("kept", T.BooleanType()),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("blocks", T.ArrayType(BLOCK_TYPE)),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def _extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker fn. Imports inside so the function pickles by
    reference to the shipped package (spark-submit --py-files)."""
    # init-once-per-worker (O2 reversal): the extractor is stateless pure
    # Python, so "init" is just the import — still, do it once, here.
    from pdf_extractor_spark.ref_extractor import extract

    def process(chunk: pd.DataFrame) -> pd.DataFrame:
        out = {
            "url": chunk["url"].to_numpy(),
            "warc_ts": chunk["warc_ts"].to_numpy(),
            "doc_type": [],
            "extracted_text": [],
            "blocks": [],
            "n_blocks": [],
            "n_chars": [],
            "error": [],
        }
        for payload in chunk["html"]:
            res = extract(payload)
            out["doc_type"].append(res.doc_type)
            out["extracted_text"].append(res.text)
            out["blocks"].append(
                [
                    (b.idx, b.tag_path, b.text, b.text_density,
                     b.link_density, b.kept)
                    for b in res.blocks
                ]
            )
            out["n_blocks"].append(res.n_blocks)
            out["n_chars"].append(res.n_chars)
            out["error"].append(res.error)
        return pd.DataFrame(out)

    for pdf_batch in batches:
        if pdf_batch.empty:
            continue
        # re-chunk by cumulative payload bytes (skew/memory bound)
        sizes = pdf_batch["html"].map(lambda b: len(b) if b is not None else 0)
        start = 0
        acc = 0
        for i, sz in enumerate(sizes):
            acc += int(sz)
            if acc >= BATCH_TARGET_BYTES and i + 1 > start:
                yield process(pdf_batch.iloc[start : i + 1])
                start, acc = i + 1, 0
        if start < len(pdf_batch):
            yield process(pdf_batch.iloc[start:])


def extract_stage(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, …) → extracted (full schema).

    Column pruning is explicit: only url/warc_ts/html are read — Catalyst
    pushes this projection into the Parquet scan (never reads the crawled
    `text` column, SURVEY.md §4.2)."""
    return pages.select("url", "warc_ts", "html").mapInPandas(
        _extract_batches, schema=EXTRACTED_SCHEMA
    )


def with_partition_date(extracted: DataFrame) -> DataFrame:
    """Add the physical partition column days(warc_ts) → partition_date."""
    return extracted.withColumn("partition_date", F.to_date("warc_ts"))


__all__ = [
    "EXTRACTED_SCHEMA",
    "BLOCK_TYPE",
    "EXTRACTOR_VERSION",
    "extract_stage",
    "with_partition_date",
]
