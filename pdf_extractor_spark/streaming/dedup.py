"""Streaming exactly-once dedup: the BUILT-IN stateful operator that
turns an at-least-once source (replayed WARC fetches, re-delivered
crawl batches) into exactly-once rows by key.

`dropDuplicatesWithinWatermark` is the production form: plain
streaming `dropDuplicates` keeps EVERY seen key forever — state is
O(distinct keys), impossible at 10^12 events — while the watermarked
form evicts keys once the event-time watermark passes them, bounding
state to the delay window. The trade is documented and pinned by test
(tests/test_stream_dedup.py): a duplicate arriving AFTER its
original's state was evicted is late data relative to the watermark
and is dropped wholesale — within-delay duplicates are deduplicated
exactly; beyond-delay replays never re-emit, they vanish.

Reference lineage: the reference API processes each uploaded document
once per request with no replay protection (pdf_processor.py's
stateless POST handler); this operator is the idempotence layer a
continuously-ingesting pipeline needs instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked streaming dedup by `key_cols`: first arrival of each
    key within the watermark window is emitted, subsequent duplicates
    are suppressed; state for a key is evicted once the watermark
    passes its event time."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
