"""Unit tests for the from-scratch PDF layout parser (SURVEY.md §5.2 item 2).

The writer (corpus/pdf_writer.py) closes the parser's input domain; these
tests pin the geometric semantics: y-sweep line clustering, x-sort within a
line, TJ kerning word gaps, header/footer suppression, textless → empty.
"""

import pytest

from pdf_extractor_spark.corpus.pdf_writer import PageContent, write_pdf
from pdf_extractor_spark.ref_extractor.pdf_extract import (
    PDFParseError,
    extract_pdf,
)


def test_single_column_reading_order():
    pc = (
        PageContent()
        .begin(12)
        .tl(14)
        .tm(72, 720)
        .quote("line one")
        .quote("line two")
        .quote("line three")
        .end()
    )
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "line one\nline two\nline three"
    assert res.doc_type == "pdf"


def test_runs_on_same_line_x_sorted():
    pc = PageContent().begin(12)
    pc.tm(300, 700).tj("right")
    pc.tm(72, 700).tj("left")
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "left right"


def test_y_sweep_out_of_order_emission():
    # emit bottom line first; reading order must still be top→bottom
    pc = PageContent().begin(12)
    pc.tm(72, 100).tj("bottom")
    pc.tm(72, 700).tj("top")
    pc.tm(72, 400).tj("middle")
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "top\nmiddle\nbottom"


def test_line_cluster_tolerance():
    # 2pt jitter at 12pt font is within tolerance (0.45*12=5.4) → one line
    pc = PageContent().begin(12)
    pc.tm(72, 700).tj("alpha")
    pc.tm(140, 702).tj("beta")
    pc.tm(72, 660).tj("gamma")
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "alpha beta\ngamma"


def test_tj_kerning_word_gaps():
    pc = PageContent().begin(12).tm(72, 700)
    # small offsets join; large offsets (≥180) become word gaps
    pc.tj_array(["hel", -40.0, "lo", -260.0, "world"])
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "hello world"


def test_two_column_interleave():
    pc = PageContent().begin(10)
    pc.tm(72, 700).tj("A1")
    pc.tm(330, 700).tj("B1")
    pc.tm(72, 687).tj("A2")
    pc.tm(330, 687).tj("B2")
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "A1 B1\nA2 B2"


def test_header_footer_suppression():
    pages = []
    for i in range(4):
        pc = PageContent().begin(11)
        pc.tm(72, 760).tj("REPEATED HEADER")
        pc.tm(72, 400).tj(f"body {i}")
        pc.tm(72, 30).tj("repeated footer")
        pc.end()
        pages.append(pc)
    res = extract_pdf(write_pdf(pages))
    assert res.text == "body 0\nbody 1\nbody 2\nbody 3"
    assert res.n_blocks == 4  # one block per page


def test_header_kept_on_short_docs():
    # <3 pages → no suppression (HF_MIN_PAGES)
    pages = []
    for i in range(2):
        pc = PageContent().begin(11)
        pc.tm(72, 760).tj("HEADER")
        pc.tm(72, 400).tj(f"body {i}")
        pc.end()
        pages.append(pc)
    res = extract_pdf(write_pdf(pages))
    assert res.text == "HEADER\nbody 0\nHEADER\nbody 1"


def test_mid_page_repeat_not_suppressed():
    # repeated text OUTSIDE the top/bottom bands must survive
    pages = []
    for i in range(4):
        pc = PageContent().begin(11)
        pc.tm(72, 400).tj("repeated body line")
        pc.tm(72, 380).tj(f"unique {i}")
        pc.end()
        pages.append(pc)
    res = extract_pdf(write_pdf(pages))
    assert res.text.count("repeated body line") == 4


def test_escapes_and_octal():
    pc = PageContent().begin(12).tm(72, 700)
    pc.ops.append(r"(paren \( close \) back\\slash oct\101l) Tj")
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "paren ( close ) back\\slash octAl"


def test_hex_string():
    pc = PageContent().begin(12)
    pc.ops.append("1 0 0 1 72 700 Tm <68656C6C6F> Tj")
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "hello"


def test_td_tstar_positioning():
    pc = PageContent().begin(12).tl(14).tm(72, 720)
    pc.tj("first").tstar().tj("second").td(10, -14).tj("third")
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "first\nsecond\nthird"


def test_textless_is_empty():
    res = extract_pdf(write_pdf([PageContent()]))
    assert res.doc_type == "empty"
    assert res.text == ""


def test_uncompressed_stream():
    pc = PageContent().begin(12).tm(72, 700).tj("plain stream")
    pc.end()
    res = extract_pdf(write_pdf([pc], compress=False))
    assert res.text == "plain stream"


def test_truncated_pdf_raises():
    with pytest.raises(PDFParseError):
        extract_pdf(b"%PDF-1.4\n garbage garbage")


def test_multipage_join_single_newline():
    # Appendix B: ONE canonical page-join rule — single \n, no trailing
    p1 = PageContent().begin(12).tm(72, 700).tj("page one").end()
    p2 = PageContent().begin(12).tm(72, 700).tj("page two").end()
    res = extract_pdf(write_pdf([p1, p2]))
    assert res.text == "page one\npage two"
    assert not res.text.endswith("\n")


def test_winansi_decoding():
    pc = PageContent().begin(12).tm(72, 700)
    pc.ops.append("(caf\xe9) Tj")  # é in WinAnsi/cp1252
    pc.end()
    res = extract_pdf(write_pdf([pc]))
    assert res.text == "café"
