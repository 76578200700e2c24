"""From-scratch HTML main-content extraction (readability/trafilatura-style),
built on stdlib ``html.parser`` only.

Pipeline (deterministic, spec'd here and encoded in the goldens):

1. **Encoding detection** — BOM, then ``<meta charset>`` sniff in the first
   4096 bytes, then strict UTF-8 attempt, then cp1252-with-replacement.
2. **Stream parse** — one pass with ``html.parser``; ``<script>/<style>``
   content, comments, and the ``<head>`` subtree are dropped *before* any
   scoring (the graft analog of the reference's image-preprocessing noise
   suppression, /root/reference/pdf_processor.py:386-416 — see SURVEY.md O6).
3. **Block segmentation** — text accumulates into a block until a block-level
   tag boundary; each block records its tag path, ancestor class/id signals,
   char count, anchor-char count, and inline-tag count.
4. **Classification** — keep/drop per block from text density, link density,
   structural-role tags (nav/header/footer/aside/form dropped), and class/id
   scoring (negative: comment|sidebar|footer|...; positive: content|article|
   main|post|...). This is the graft of the reference's confidence filter
   ``conf < 0.5 → drop`` (/root/reference/pdf_processor.py:360-361, SURVEY.md
   O7).
5. **Fallback** — if nothing is kept, fall back to the whole-body text
   (reference backup-OCR semantic, pdf_processor.py:372-380, SURVEY.md O9).
6. **Canonical text** — kept block texts, each whitespace-collapsed, joined
   by a single ``\\n`` with no trailing newline (SURVEY.md Appendix B).

All thresholds are module constants with tests (SURVEY.md §5.2 item 2).
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

from pdf_extractor_spark.ref_extractor.types import Block, ExtractResult

# --- named constants (Appendix B discipline: thresholds are constants) -----
MIN_BLOCK_CHARS = 25  # minimum canonical chars for a content block
MIN_HEADING_CHARS = 8  # headings are short but content-bearing
MAX_LINK_DENSITY = 0.35  # analog of the reference's conf<0.5 drop
MAX_HEADING_LINK_DENSITY = 0.20
MIN_TEXT_DENSITY = 8.0  # chars per (1 + inline tag) within the block
META_SNIFF_BYTES = 4096

# Tags whose start/end delimit a text block.
BLOCK_TAGS = frozenset(
    """p div article section main aside header footer nav h1 h2 h3 h4 h5 h6
    li ul ol dl dt dd td th tr table thead tbody tfoot blockquote pre figure
    figcaption form fieldset hr body html title address center""".split()
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
# Subtrees dropped entirely (structural boilerplate roles).
DROP_SUBTREE_TAGS = frozenset({"nav", "header", "footer", "aside", "form"})
# Raw-content tags whose character data is never text.
RAW_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg"})
VOID_TAGS = frozenset(
    """area base br col embed hr img input link meta param source track
    wbr""".split()
)

NEGATIVE_CLASS_RE = re.compile(
    r"comment|sidebar|side-bar|footer|footnote|nav|menu|banner|advert|"
    r"\bad\b|\bads\b|promo|social|share|widget|related|breadcrumb|cookie|"
    r"popup|masthead|pagination",
    re.IGNORECASE,
)
POSITIVE_CLASS_RE = re.compile(
    r"\barticle\b|\bbody\b|\bcontent\b|\bentry\b|\bmain\b|\bpost\b|\btext\b|"
    r"\bstory\b|\bblog\b|column",
    re.IGNORECASE,
)

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)
_WS_RE = re.compile(r"\s+")


def detect_and_decode(payload: bytes) -> str:
    """Deterministic decode: BOM → meta-charset sniff → UTF-8 strict →
    cp1252 with replacement.

    Mirrors in spirit the reference's reliance on pdfplumber/OCR to hand it
    clean ``str`` text; here decoding is our own responsibility and must be
    byte-stable, so no locale- or environment-dependent behavior is allowed.
    """
    if payload.startswith(codecs.BOM_UTF8):
        return payload[len(codecs.BOM_UTF8) :].decode("utf-8", "replace")
    if payload.startswith(codecs.BOM_UTF16_LE):
        return payload[2:].decode("utf-16-le", "replace")
    if payload.startswith(codecs.BOM_UTF16_BE):
        return payload[2:].decode("utf-16-be", "replace")
    m = _META_CHARSET_RE.search(payload[:META_SNIFF_BYTES])
    if m:
        name = m.group(1).decode("ascii", "ignore").lower()
        try:
            codecs.lookup(name)
        except LookupError:
            name = ""
        if name:
            try:
                return payload.decode(name, "strict")
            except (UnicodeDecodeError, ValueError):
                pass  # mis-declared charset (fixture family H5) → fall through
    try:
        return payload.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return payload.decode("cp1252", "replace")


def canon_ws(s: str) -> str:
    """Canonical whitespace: collapse all runs to one space, strip ends."""
    return _WS_RE.sub(" ", s).strip()


class _Frame:
    __slots__ = ("tag", "classid", "drop", "neg", "pos")

    def __init__(self, tag: str, classid: str, drop: bool, neg: bool, pos: bool):
        self.tag = tag
        self.classid = classid
        self.drop = drop
        self.neg = neg
        self.pos = pos


class _BlockParser(HTMLParser):
    """Single-pass block segmenter. Produces raw block tuples; scoring and
    the keep decision happen in :func:`extract_html`."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[_Frame] = []
        self.raw_skip_depth = 0
        self.in_head = 0
        self.blocks: list[dict] = []
        # current block accumulator
        self._parts: list[str] = []
        self._link_chars = 0
        self._inline_tags = 0
        self._anchor_depth = 0

    # -- helpers ------------------------------------------------------------
    def _path(self) -> str:
        return "/".join(
            f.tag + ("." + f.classid if f.classid else "") for f in self.stack
        )

    def _flush(self) -> None:
        if not self._parts:
            self._link_chars = 0
            self._inline_tags = 0
            return
        raw = "".join(self._parts)
        text = canon_ws(raw)
        if text:
            self.blocks.append(
                {
                    "tag_path": self._path() or "(root)",
                    "text": text,
                    "link_chars": min(self._link_chars, len(raw)),
                    "raw_chars": len(text),
                    "inline_tags": self._inline_tags,
                    "dropped_subtree": any(f.drop for f in self.stack),
                    "neg": any(f.neg for f in self.stack),
                    "pos": any(f.pos for f in self.stack),
                    "heading": bool(self.stack)
                    and self.stack[-1].tag in HEADING_TAGS,
                }
            )
        self._parts = []
        self._link_chars = 0
        self._inline_tags = 0

    # -- HTMLParser callbacks ------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in RAW_SKIP_TAGS:
            self.raw_skip_depth += 1
            return
        if tag == "head":
            self.in_head += 1
            return
        if self.raw_skip_depth or self.in_head:
            return
        if tag in VOID_TAGS:
            if tag == "br":
                self._parts.append(" ")
            return
        attr_map = {}
        for k, v in attrs:
            if v is not None and k in ("class", "id"):
                attr_map[k] = v
        classid_full = " ".join(
            v for v in (attr_map.get("class", ""), attr_map.get("id", "")) if v
        )
        first_class = (attr_map.get("class", "") or attr_map.get("id", "")).split()
        if tag in BLOCK_TAGS:
            self._flush()
            self.stack.append(
                _Frame(
                    tag,
                    first_class[0] if first_class else "",
                    tag in DROP_SUBTREE_TAGS,
                    bool(classid_full) and bool(NEGATIVE_CLASS_RE.search(classid_full)),
                    bool(classid_full) and bool(POSITIVE_CLASS_RE.search(classid_full)),
                )
            )
        else:
            self._inline_tags += 1
            if tag == "a":
                self._anchor_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            self._parts.append(" ")
        elif tag not in VOID_TAGS and tag not in RAW_SKIP_TAGS:
            self._inline_tags += 1

    def handle_endtag(self, tag):
        if tag in RAW_SKIP_TAGS:
            self.raw_skip_depth = max(0, self.raw_skip_depth - 1)
            return
        if tag == "head":
            self.in_head = max(0, self.in_head - 1)
            return
        if self.raw_skip_depth or self.in_head:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
            return
        if tag in BLOCK_TAGS:
            self._flush()
            # tolerant unwind for malformed nesting (fixture family H7):
            # pop up to and including the nearest matching open tag; if no
            # matching tag is open, ignore the stray end tag.
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i].tag == tag:
                    del self.stack[i:]
                    break

    def handle_data(self, data):
        if self.raw_skip_depth or self.in_head:
            return
        if not data:
            return
        self._parts.append(data)
        if self._anchor_depth:
            self._link_chars += len(canon_ws(data))

    def close(self):
        super().close()
        self._flush()


def extract_html(payload: bytes) -> ExtractResult:
    """Extract main content from HTML bytes. Never raises on well-typed
    input; a catastrophic parser failure is caught by the dispatcher."""
    text = detect_and_decode(payload)
    parser = _BlockParser()
    parser.feed(text)
    parser.close()

    blocks: list[Block] = []
    kept_texts: list[str] = []
    all_texts: list[str] = []
    for i, b in enumerate(parser.blocks):
        n = len(b["text"])
        link_density = (b["link_chars"] / b["raw_chars"]) if b["raw_chars"] else 0.0
        text_density = n / (1.0 + b["inline_tags"])
        if b["heading"]:
            kept = (
                n >= MIN_HEADING_CHARS
                and link_density <= MAX_HEADING_LINK_DENSITY
                and not b["dropped_subtree"]
                and not (b["neg"] and not b["pos"])
            )
        else:
            kept = (
                n >= MIN_BLOCK_CHARS
                and link_density <= MAX_LINK_DENSITY
                and text_density >= MIN_TEXT_DENSITY
                and not b["dropped_subtree"]
                and not (b["neg"] and not b["pos"])
            )
        blocks.append(
            Block(
                idx=i,
                tag_path=b["tag_path"],
                text=b["text"],
                text_density=round(text_density, 6),
                link_density=round(link_density, 6),
                kept=kept,
            )
        )
        all_texts.append(b["text"])
        if kept:
            kept_texts.append(b["text"])

    if kept_texts:
        out = "\n".join(kept_texts)
    else:
        # O9 fallback-chain semantic: primary kept nothing → whole-body text.
        out = "\n".join(all_texts)
    return ExtractResult(doc_type="html", text=out, blocks=blocks)
