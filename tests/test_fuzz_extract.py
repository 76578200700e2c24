"""Adversarial/fuzz hardening (SURVEY.md §7 M7): the extractor must NEVER
raise — any payload, however hostile, yields an ExtractResult with either
text or an error string (O23 containment), and extraction is
deterministic (byte-identical on repeat)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.ref_extractor import extract


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_random_bytes_never_raise(payload):
    res = extract(payload)
    assert res.doc_type in ("html", "pdf", "empty", "error")
    assert isinstance(res.text, str)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_pdf_magic_prefix_never_raises(payload):
    res = extract(b"%PDF-1.4\n" + payload)
    assert res.doc_type in ("pdf", "error", "empty")


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2048))
def test_htmlish_text_never_raises(body):
    res = extract(f"<html><body>{body}</body></html>".encode("utf-8", "replace"))
    assert res.doc_type == "html"
    assert not res.error


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_extraction_is_deterministic(payload):
    a = extract(payload)
    b = extract(payload)
    assert a.text == b.text
    assert a.doc_type == b.doc_type
    assert a.error == b.error


def test_declared_length_lies_never_raise():
    """Malformed /Length values must fall back to the endstream heuristic."""
    base = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 999999 >>\nstream\nBT (hi) Tj ET"
        b"\nendstream\nendobj\n"
    )
    res = extract(base)
    assert res.doc_type in ("pdf", "error", "empty")


def test_pathological_nesting_html():
    payload = (b"<div>" * 5000) + b"deep text" + (b"</div>" * 5000)
    res = extract(b"<html><body>" + payload + b"</body></html>")
    assert res.doc_type == "html"
    assert isinstance(res.text, str)
