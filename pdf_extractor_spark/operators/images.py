"""The vectorized image-pair stage: pages(url, html, …) → one row per
``<img src>`` with its mined caption, via ``mapInArrow`` (same
execution shape as the outlink stage — init-once per worker, payload
bytes never leave Arrow until the per-row parse, byte-budget
re-chunking for giant blobs). The caption-priority spec lives in
``ref_extractor/images.py``; downstream quality filtering stays
relational (queries/catalog.py image_caption_quality) so Catalyst owns
it and the UDF stays minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pdf_extractor_spark.operators.extract import byte_bounded_ranges

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("src", T.StringType()),
        T.StructField("alt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("caption_src", T.StringType()),
    ]
)


def _images_batches(batches):
    import pyarrow as pa

    from pdf_extractor_spark.ref_extractor.images import collect_images

    def process(batch: pa.RecordBatch, lo: int, hi: int) -> pa.RecordBatch:
        html = batch.column("html")
        urls = batch.column("url")
        cols = {k: [] for k in
                ("url", "seq", "src", "alt", "caption", "caption_src")}
        for i in range(lo, hi):
            url = urls[i].as_py()
            for seq, src, alt, caption, csrc in collect_images(
                html[i].as_py()
            ):
                cols["url"].append(url)
                cols["seq"].append(seq)
                cols["src"].append(src)
                cols["alt"].append(alt)
                cols["caption"].append(caption)
                cols["caption_src"].append(csrc)
        return pa.RecordBatch.from_arrays(
            [
                pa.array(cols["url"], pa.string()),
                pa.array(cols["seq"], pa.int64()),
                pa.array(cols["src"], pa.string()),
                pa.array(cols["alt"], pa.string()),
                pa.array(cols["caption"], pa.string()),
                pa.array(cols["caption_src"], pa.string()),
            ],
            names=["url", "seq", "src", "alt", "caption", "caption_src"],
        )

    for batch in batches:
        if batch.num_rows == 0:
            continue
        for lo, hi in byte_bounded_ranges(batch):
            yield process(batch, lo, hi)


def images_stage(pages: DataFrame) -> DataFrame:
    """pages(url, html, …) → (url, seq, src, alt, caption,
    caption_src), one row per sourced img, document order in ``seq``."""
    return pages.select("url", "html").mapInArrow(
        _images_batches, IMAGES_SCHEMA
    )
