"""Corpus generator determinism + golden fixture integrity."""

import hashlib

import duckdb

from pdf_extractor_spark.corpus.build import GOLDEN_ROWS, GOLDEN_SEED
from pdf_extractor_spark.corpus.generator import generate_rows, make_row
from pdf_extractor_spark.ref_extractor import extract
from tests.conftest import GOLDEN_DIR


def test_rows_deterministic():
    a = [make_row(GOLDEN_SEED, i, 8) for i in range(50)]
    b = [make_row(GOLDEN_SEED, i, 8) for i in range(50)]
    assert [(r.url, r.html, r.warc_ts) for r in a] == [
        (r.url, r.html, r.warc_ts) for r in b
    ]


def test_urls_unique():
    urls = [r.url for r in generate_rows(GOLDEN_SEED, 500)]
    assert len(set(urls)) == 500


def test_e5_duplicate_payloads_distinct_urls():
    rows = [r for r in generate_rows(GOLDEN_SEED, 2000) if r.family == "E5"]
    payloads = {}
    for r in rows:
        payloads.setdefault(r.html, []).append(r.url)
    # at least one payload shared by ≥2 distinct urls
    assert any(len(urls) >= 2 for urls in payloads.values())


def test_goldens_match_current_spec():
    """Committed goldens must equal what the reference extractor computes NOW
    — catches accidental spec drift without a version bump."""
    con = duckdb.connect()
    got = con.sql(
        f"select url, doc_type, text_sha256 from "
        f"read_parquet('{GOLDEN_DIR}/goldens.parquet') order by url"
    ).fetchall()
    assert len(got) == GOLDEN_ROWS
    expected = {}
    for row in generate_rows(GOLDEN_SEED, GOLDEN_ROWS):
        res = extract(row.html)
        expected[row.url] = (
            res.doc_type,
            hashlib.sha256(res.text.encode("utf-8")).hexdigest(),
        )
    for url, doc_type, sha in got:
        assert expected[url] == (doc_type, sha), url


def test_family_coverage():
    fams = {r.family for r in generate_rows(GOLDEN_SEED, GOLDEN_ROWS)}
    # every declared family appears in the micro corpus
    for f in ["H1", "H2", "H3", "H4", "H5", "H6", "H7", "H8", "P1", "P2",
              "P3", "P4", "P5", "E1", "E2", "E5"]:
        assert f in fams, f
