"""WARC connector: round-trip (writer → reader) payload fidelity, and the
full pipeline (WARC → extract) against goldens."""

from __future__ import annotations

from pdf_extractor_spark.corpus.generator import generate_rows
from pdf_extractor_spark.operators.extract import extract_stage_dispatch
from pdf_extractor_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    write_warc,
)

from tests.conftest import GOLDEN_DIR


def test_warc_roundtrip_pure_python(tmp_path):
    rows = list(generate_rows(42, 30, 4))
    path = tmp_path / "part-0.warc.gz"
    assert write_warc(path, rows) == 30
    got = list(iter_warc_records(path.read_bytes()))
    assert len(got) == 30
    by_url = {u: (ts, payload) for u, ts, payload in got}
    for r in rows:
        ts, payload = by_url[r.url]
        assert payload == r.html
        assert ts == r.warc_ts.replace(microsecond=0)


def test_warc_malformed_records_are_contained():
    """Per-record error containment (O23 for the connector): fractional-
    second / offset WARC-Dates parse, garbage Content-Length and truncated
    archives skip the bad record(s) — never raise out of the file."""
    import datetime as dt
    import gzip

    def rec(headers: str, body: bytes = b"") -> bytes:
        http = b"HTTP/1.1 200 OK\r\n\r\n" + body
        head = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            + headers
            + f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return gzip.compress(head + http + b"\r\n\r\n")

    good = rec(
        "WARC-Target-URI: http://a/\r\n"
        "WARC-Date: 2025-06-01T12:00:00.123456+02:00\r\n",
        b"ok-a",
    )
    bad_len = gzip.compress(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad/\r\n"
        b"Content-Length: banana\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\nnope\r\n\r\n"
    )
    good2 = rec(
        "WARC-Target-URI: http://b/\r\nWARC-Date: not-a-date\r\n", b"ok-b"
    )
    got = list(iter_warc_records(good + bad_len + good2))
    by_url = {u: (ts, p) for u, ts, p in got}
    assert by_url["http://a/"] == (
        dt.datetime(2025, 6, 1, 10, 0, 0, 123456), b"ok-a",
    )
    assert by_url["http://b/"] == (dt.datetime(1970, 1, 1), b"ok-b")
    # truncated archive (second member cut off mid-stream): records
    # before the cut survive, the tail is dropped, nothing raises
    blob = (good + good2)[: len(good) + 10]
    assert [u for u, _, _ in iter_warc_records(blob)] == ["http://a/"]


def test_warc_spark_read_and_extract(spark, tmp_path):
    rows = list(generate_rows(42, 40, 4))
    # two files → two parallel units
    write_warc(tmp_path / "part-0.warc.gz", rows[:20])
    write_warc(tmp_path / "part-1.warc.gz", rows[20:])

    pages = read_warc(spark, str(tmp_path))
    assert pages.count() == 40
    assert {f.name for f in pages.schema} == {
        "url", "warc_ts", "html", "text", "lang",
    }

    # end-to-end: WARC → dispatch extract → byte-identity vs goldens
    goldens = spark.read.parquet(str(GOLDEN_DIR / "goldens.parquet"))
    matched = (
        extract_stage_dispatch(pages).alias("e")
        .join(goldens.alias("g"), "url")
        .filter("e.extracted_text = g.extracted_text")
        .count()
    )
    assert matched == 40


def test_export_jsonl_sink(spark, tmp_path):
    """Full chain: pages → extract job plan → JSONL export shards."""
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.build import rows_to_pages_table
    from pdf_extractor_spark.jobs.export_jsonl import export_jsonl
    from pdf_extractor_spark.plans.extract_plan import run_extract
    from pdf_extractor_spark.sources.pages import ingest_corpus_to_icetable

    corpus = tmp_path / "pages.parquet"
    pq.write_table(rows_to_pages_table(list(generate_rows(42, 30, 3))), corpus)
    wh = str(tmp_path / "wh")
    pages = ingest_corpus_to_icetable(spark, corpus, tmp_path / "wh" / "pages")
    run_extract(spark, pages, wh)

    out = str(tmp_path / "jsonl")
    n = export_jsonl(spark, wh, out, min_chars=1, shards=2)
    assert n > 0
    back = spark.read.json(out)
    assert {"url", "ts", "text", "n_chars"} <= {f.name for f in back.schema}
    # spot-check byte fidelity through the JSON round trip
    goldens = spark.read.parquet(str(GOLDEN_DIR / "goldens.parquet"))
    matched = (
        back.alias("e").join(goldens.alias("g"), "url")
        .filter("e.text = g.extracted_text")
        .count()
    )
    assert matched == n
