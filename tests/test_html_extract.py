"""Unit tests for the HTML main-content pass (SURVEY.md §5.2 item 2)."""

from pdf_extractor_spark.ref_extractor.html_extract import (
    canon_ws,
    detect_and_decode,
    extract_html,
)


def shell(body: str, charset: str = "utf-8") -> bytes:
    return (
        f'<html><head><meta charset="{charset}"><title>T</title></head>'
        f"<body>{body}</body></html>"
    ).encode(charset)


LONG = "This paragraph is long enough to be classified as real content here."


def test_plain_paragraph_kept():
    res = extract_html(shell(f"<article><p>{LONG}</p></article>"))
    assert res.text == LONG
    assert res.doc_type == "html"


def test_title_and_head_excluded():
    res = extract_html(shell(f"<p>{LONG}</p>"))
    assert "T" != res.text.split("\n")[0][0] or "T" not in ("",)
    assert res.text == LONG


def test_nav_header_footer_aside_dropped():
    body = (
        f"<nav><p>{LONG}</p></nav><header><p>{LONG}</p></header>"
        f"<p>{LONG}</p><aside><p>{LONG}</p></aside><footer><p>{LONG}</p></footer>"
    )
    res = extract_html(shell(body))
    assert res.text == LONG


def test_negative_class_dropped_positive_kept():
    body = (
        f'<div class="sidebar"><p>{LONG}</p></div>'
        f'<div class="content"><p>{LONG} KEEP</p></div>'
    )
    res = extract_html(shell(body))
    assert res.text == LONG + " KEEP"


def test_link_density_rejection():
    linky = "<p>" + '<a href="/x">word link text here</a> ' * 10 + "</p>"
    res = extract_html(shell(linky + f"<p>{LONG}</p>"))
    assert res.text == LONG


def test_short_block_dropped_but_heading_kept():
    res = extract_html(shell(f"<p>tiny</p><h1>Real Headline</h1><p>{LONG}</p>"))
    assert res.text == "Real Headline\n" + LONG


def test_script_style_comment_stripped():
    body = (
        f"<script>var x='decoy';</script><style>.a{{}}</style>"
        f"<!-- decoy comment --><p>{LONG}</p>"
    )
    res = extract_html(shell(body))
    assert res.text == LONG


def test_entity_decoding():
    res = extract_html(shell(f"<p>{LONG} caf&eacute; &amp; &#233;clair</p>"))
    assert res.text == f"{LONG} café & éclair"


def test_fallback_when_nothing_kept():
    res = extract_html(shell("<p>short one</p><p>short two</p>"))
    # O9 semantic: zero kept blocks → whole-body text
    assert res.text == "short one\nshort two"
    assert all(not b.kept for b in res.blocks)


def test_whitespace_canonicalization():
    res = extract_html(shell(f"<p>  {LONG.replace(' ', '   ')}\n\t</p>"))
    assert res.text == LONG


def test_malformed_nesting_tolerated():
    body = f"<div><p>{LONG}<p>{LONG} TWO</div></div><p>{LONG} THREE</p>"
    res = extract_html(shell(body))
    assert f"{LONG}\n{LONG} TWO\n{LONG} THREE" == res.text


def test_decode_bom_utf8():
    assert detect_and_decode(b"\xef\xbb\xbfabc") == "abc"


def test_decode_meta_charset_cp1252():
    payload = shell(f"<p>{LONG} café</p>", charset="windows-1252")
    assert "café" in detect_and_decode(payload)


def test_decode_wrong_meta_falls_back():
    # declares utf-8 but bytes are cp1252 → utf-8 strict fails → cp1252
    raw = (
        '<html><head><meta charset="utf-8"></head><body><p>caf\xe9</p>'
        "</body></html>"
    ).encode("cp1252")
    assert "café" in detect_and_decode(raw)


def test_canon_ws():
    assert canon_ws("  a\t\nb   c ") == "a b c"


def test_block_metadata():
    res = extract_html(shell(f'<div class="content"><p>{LONG}</p></div>'))
    kept = [b for b in res.blocks if b.kept]
    assert len(kept) == 1
    b = kept[0]
    assert b.tag_path.endswith("div.content/p")
    assert b.link_density == 0.0
    assert b.text_density > 8


def test_determinism():
    payload = shell(f"<p>{LONG}</p>" * 50)
    assert extract_html(payload).text == extract_html(payload).text
