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
