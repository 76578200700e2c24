"""Dispatch (O3) and error-containment (O23) semantics."""

from pdf_extractor_spark.ref_extractor import extract, sniff_doc_type


def test_sniff():
    assert sniff_doc_type(None) == "empty"
    assert sniff_doc_type(b"") == "empty"
    assert sniff_doc_type(b"   \n ") == "empty"
    assert sniff_doc_type(b"%PDF-1.4\n...") == "pdf"
    assert sniff_doc_type(b"<html></html>") == "html"
    assert sniff_doc_type(b"\x00\x01random") == "html"


def test_empty_payload():
    res = extract(b"")
    assert (res.doc_type, res.text, res.error) == ("empty", "", "")


def test_truncated_pdf_contained():
    res = extract(b"%PDF-1.4\nnot really a pdf")
    assert res.doc_type == "error"
    assert res.text == ""
    assert res.error == "PDFParseError: no PDF objects found"


def test_random_binary_never_raises():
    import random

    rng = random.Random(1234)
    for _ in range(50):
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 500)))
        res = extract(payload)
        assert res.doc_type in ("html", "empty", "error")


def test_error_message_deterministic():
    p = b"%PDF-1.4\ngarbage"
    assert extract(p).error == extract(p).error


def test_secondary_extractor_hook_for_textless_pdf():
    """The O5/OCR plug point: a registered secondary extractor receives
    textless PDFs; unregistered, behavior is the documented 'empty'
    (goldens unchanged — asserted corpus-wide by test_golden_bytes)."""
    from pdf_extractor_spark.corpus.pdf_writer import PageContent, write_pdf
    from pdf_extractor_spark.ref_extractor.dispatch import (
        clear_secondary_extractors,
        register_secondary_extractor,
    )
    from pdf_extractor_spark.ref_extractor.types import ExtractResult

    textless = write_pdf([PageContent()])
    texty = write_pdf(
        [PageContent().begin(12).tm(72, 700).tj("real text").end()]
    )
    assert extract(textless).doc_type == "empty"

    calls = []

    def fake_ocr(payload: bytes):
        calls.append(payload[:8])
        return ExtractResult(doc_type="pdf_ocr", text="ocr text")

    def broken(payload: bytes):
        raise RuntimeError("plugin blew up")

    try:
        register_secondary_extractor(broken)  # must be skipped, not fatal
        register_secondary_extractor(fake_ocr)
        res = extract(textless)
        assert (res.doc_type, res.text) == ("pdf_ocr", "ocr text")
        assert len(calls) == 1
        # PDFs with a text layer never reach the secondary arm
        assert extract(texty).doc_type == "pdf"
        assert len(calls) == 1
    finally:
        clear_secondary_extractors()
    assert extract(textless).doc_type == "empty"
