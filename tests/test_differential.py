"""Differential check: the Spark extraction stage must agree byte-for-byte
with the pure-Python reference extractor on ARBITRARY payloads — not just
the golden corpus families. Catches Arrow-boundary bugs (null payloads,
odd bytes, non-UTF8) that family-based goldens would miss."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import types as T

from pdf_extractor_spark.operators.extract import extract_stage
from pdf_extractor_spark.ref_extractor import extract

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _payloads() -> list[bytes | None]:
    rng = random.Random(20260817)
    out: list[bytes | None] = [
        None,
        b"",
        b"   \n\t ",
        b"%PDF-",
        b"%PDF-1.4\n" + bytes(rng.getrandbits(8) for _ in range(256)),
        "<p>café — ümläut</p>".encode("utf-8"),
        "<p>latin1 café</p>".encode("latin-1"),
        b"<p>" + b"&amp;" * 500 + b"</p>",
        b"\xff\xfe\x00broken bom",
    ]
    for _ in range(150):
        out.append(bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 512))))
    for _ in range(50):
        body = "".join(
            rng.choice("<>ab& ;x\"'=/p!") for _ in range(rng.randint(0, 300))
        )
        out.append(f"<html><body>{body}</body></html>".encode("utf-8"))
    return out


def test_fast_tokenizer_matches_stdlib_parser():
    """CI slice of the million-payload tokenizer fuzz (the full sweep is
    scripts/fuzz_tokenizer.py, run at every tokenizer change): the fast
    single-pass tokenizer must be byte-identical to the stdlib
    html.parser path — doc_type, text, every block field, and contained
    error strings — on adversarial HTML."""
    from scripts.fuzz_tokenizer import check_range, make_payload

    n, bad = check_range((0, 30_000))
    assert n == 30_000
    assert not bad, (
        f"tokenizer divergence at seeds {bad[:5]}: "
        f"{[make_payload(s) for s in bad[:2]]!r}"
    )


def test_spark_stage_matches_pure_python(spark):
    payloads = _payloads()
    ts = dt.datetime(2024, 1, 1)
    rows = [(f"u{i}", ts, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, SCHEMA).repartition(8)
    got = {
        r.url: (r.doc_type, r.extracted_text, r.n_blocks, r.n_chars, r.error)
        for r in extract_stage(df).collect()
    }
    assert len(got) == len(payloads)
    for i, p in enumerate(payloads):
        res = extract(p)
        want = (res.doc_type, res.text, res.n_blocks, res.n_chars, res.error)
        assert got[f"u{i}"] == want, (
            f"mismatch at payload {i}: {p[:60] if p else p!r}: "
            f"{got[f'u{i}'][:2]} != {want[:2]}"
        )
