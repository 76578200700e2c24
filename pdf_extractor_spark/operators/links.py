"""The vectorized outlink stage: pages(url, html, …) → one row per
``<a href>`` anchor, via ``mapInArrow`` (same execution shape as the
extraction stage — init-once per worker, payload bytes never leave
Arrow until the per-row parse, byte-budget re-chunking for giant
blobs).

Output fan-out is variable (0..n links per page), so unlike
extract_stage the url column cannot pass through as a sliced input
buffer — it is rebuilt repeated per link. Host/internal-vs-external
derivation is deliberately NOT done here: it stays relational (see
queries/links.py) so Catalyst owns it and the UDF stays minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pdf_extractor_spark.operators.extract import byte_bounded_ranges

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("href", T.StringType()),
        T.StructField("anchor", T.StringType()),
    ]
)


def _links_batches(batches):
    import pyarrow as pa

    from pdf_extractor_spark.ref_extractor.links import collect_links

    def process(batch: pa.RecordBatch, lo: int, hi: int) -> pa.RecordBatch:
        html = batch.column("html")
        urls = batch.column("url")
        o_url, o_seq, o_href, o_anchor = [], [], [], []
        for i in range(lo, hi):
            url = urls[i].as_py()
            for seq, href, anchor in collect_links(html[i].as_py()):
                o_url.append(url)
                o_seq.append(seq)
                o_href.append(href)
                o_anchor.append(anchor)
        return pa.RecordBatch.from_arrays(
            [
                pa.array(o_url, pa.string()),
                pa.array(o_seq, pa.int64()),
                pa.array(o_href, pa.string()),
                pa.array(o_anchor, pa.string()),
            ],
            names=["url", "seq", "href", "anchor"],
        )

    for batch in batches:
        if batch.num_rows == 0:
            continue
        for lo, hi in byte_bounded_ranges(batch):
            yield process(batch, lo, hi)


def links_stage(pages: DataFrame) -> DataFrame:
    """pages(url, html, …) → (url, seq, href, anchor), one row per
    anchor, document order preserved in ``seq``."""
    return pages.select("url", "html").mapInArrow(
        _links_batches, LINKS_SCHEMA
    )
