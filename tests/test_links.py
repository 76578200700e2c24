"""Collector-spec tests for outlink extraction (ref_extractor/links.py)
plus a Spark-vs-plain-loop differential over the committed micro corpus.
The oracle parity test covers the catalog entries."""

from __future__ import annotations

import pyarrow.parquet as pq

from pdf_extractor_spark.ref_extractor.links import collect_links

from tests.conftest import GOLDEN_DIR


def _hrefs(html: bytes):
    return [(h, a) for _, h, a in collect_links(html)]


def test_basic_anchor_and_document_order():
    html = (b'<html><body><a href="/one">First</a> text '
            b'<a href="https://x.example/p">Second  link</a></body></html>')
    assert collect_links(html) == [
        (0, "/one", "First"),
        (1, "https://x.example/p", "Second link"),
    ]


def test_hrefless_anchor_skipped_and_entities_resolved():
    html = b'<a>no href</a><a href="/a?x=1&amp;y=2">A &amp; B</a>'
    assert _hrefs(html) == [("/a?x=1&y=2", "A & B")]


def test_nested_anchor_implicitly_closes():
    # invalid nesting: the first <a> keeps the text seen before the
    # second opens; the second collects its own text up to </a>
    html = b'<a href="/outer">out <a href="/inner">in</a> tail'
    assert _hrefs(html) == [("/outer", "out"), ("/inner", "in")]


def test_unclosed_trailing_anchor_flushes():
    assert _hrefs(b'<p><a href="/last">dangling text') == [
        ("/last", "dangling text")
    ]


def test_nested_markup_inside_anchor_contributes_text():
    html = b'<a href="/b"><b>bold</b> and <i>italic</i></a>'
    assert _hrefs(html) == [("/b", "bold and italic")]


def test_non_html_payloads_yield_nothing():
    assert collect_links(None) == []
    assert collect_links(b"") == []
    assert collect_links(b"%PDF-1.4 whatever") == []


def test_spark_stage_equals_pure_loop_on_micro_corpus(spark):
    from pdf_extractor_spark.operators.links import links_stage

    pages = pq.read_table(GOLDEN_DIR / "pages_micro.parquet").to_pylist()
    expected = set()
    for p in pages:
        for seq, href, anchor in collect_links(p["html"]):
            expected.add((p["url"], seq, href, anchor))
    got = {
        (r["url"], r["seq"], r["href"], r["anchor"])
        for r in links_stage(
            spark.read.parquet(str(GOLDEN_DIR / "pages_micro.parquet"))
        ).collect()
    }
    assert got == expected and len(got) > 1000


def test_anchor_topk_matches_python_recount(spark):
    """link_anchor_topk vs a plain-Python recount from the pure-Python
    collector's expected rows (independent of both SQL engines)."""
    import collections
    import re

    import duckdb

    from pdf_extractor_spark.queries.graph import _LINKS_EXPECTED
    from pdf_extractor_spark.queries.links import (
        ANCHOR_TOPK,
        link_anchor_topk,
    )

    rows = duckdb.sql(f"SELECT * FROM '{_LINKS_EXPECTED}'").fetchall()
    host = lambda u: re.match(r"^[a-z]+://([^/]+)", u).group(1)  # noqa: E731
    counts = collections.Counter()
    srcs = collections.defaultdict(set)
    for url, _seq, href, anchor in rows:
        src = host(url)
        dst = host(href) if re.match(r"^[a-z]+://", href) else src
        a = anchor.strip().lower()
        if src != dst and a:
            counts[(dst, a)] += 1
            srcs[(dst, a)].add(src)
    want = {}
    per_host = collections.defaultdict(list)
    for (dst, a), n in counts.items():
        per_host[dst].append((-n, -len(srcs[(dst, a)]), a))
    for dst, lst in per_host.items():
        for rk, (nn, ns, a) in enumerate(sorted(lst)[:ANCHOR_TOPK], 1):
            want[(dst, rk)] = (a, -nn, -ns)

    got = link_anchor_topk(spark, "unused").collect()
    assert len(got) == len(want)
    for r in got:
        assert 1 <= r["rk"] <= ANCHOR_TOPK
        assert want[(r["dst_host"], r["rk"])] == (
            r["anchor_norm"],
            r["n_links"],
            r["n_src_hosts"],
        )
