"""From-scratch PDF layout text extraction (pdfminer-style), stdlib only.

The reference extracts digital-PDF text via pdfplumber
(/root/reference/pdf_processor.py:322-330) and reconstructs scanned-page
reading order by sorting OCR boxes on their y-centers and joining with
newlines (pdf_processor.py:364-370). Both are the same semantic: *recover
reading order from glyph geometry by a vertical sweep*. This module
implements that semantic from scratch:

1. object scan — find ``N G obj … endobj`` spans without trusting the xref
   (robust to truncation; the xref is only advisory),
2. page tree walk — /Root → /Pages → /Kids for page order, falling back to
   ascending object number of /Type /Page objects,
3. stream decode — raw or /FlateDecode via zlib,
4. content-stream tokenizer — ``BT ET Tf Td TD TL T* Tm Tj ' " TJ``; strings
   ``(...)`` with escapes/octal and ``<hex>``; text decoded as cp1252
   (≈ WinAnsi),
5. text runs with device (x, y) from the text matrix; TJ kerning offsets
   beyond ``TJ_WORD_GAP`` become word gaps,
6. y-sweep line clustering (tolerance scaled by font size) + x-sort within a
   line — the reference's pdf_processor.py:364-370 semantic, generalized,
7. cross-page header/footer suppression — a line whose canonical text repeats
   in the top/bottom band on ≥2/3 of pages (docs with ≥3 pages) is dropped,
8. lines joined ``\\n`` within a page, pages joined ``\\n`` — ONE canonical
   rule (SURVEY.md Appendix B; the reference used two inconsistent rules).

A PDF whose pages contain no text operators yields ``doc_type='empty'`` —
the "scanned" analog with the OCR arm explicitly out of scope (SURVEY.md O5).
Malformed PDFs raise :class:`PDFParseError`, contained by the dispatcher
into an error row (reference O23 semantic, pdf_processor.py:184-186).
"""

from __future__ import annotations

import re
import zlib

from pdf_extractor_spark.ref_extractor.types import Block, ExtractResult

# --- named constants --------------------------------------------------------
TJ_WORD_GAP = 180.0  # |TJ offset| (thousandths of em) treated as a word gap
LINE_TOL_FACTOR = 0.45  # y-cluster tolerance = factor * font size
LINE_TOL_MIN = 2.0
HF_BAND_FRACTION = 0.08  # top/bottom band height fraction for header/footer
HF_MIN_PAGES = 3  # suppression needs at least this many pages
HF_PAGE_FRACTION = 2.0 / 3.0  # line must repeat on >= this fraction of pages
DEFAULT_PAGE_HEIGHT = 792.0  # US-Letter fallback when /MediaBox is absent

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_NUM_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_WS_RE = re.compile(r"\s+")


class PDFParseError(ValueError):
    """Raised for structurally broken PDFs; message must be deterministic."""


class _Obj:
    __slots__ = ("num", "head", "stream")

    def __init__(self, num: int, head: bytes, stream: bytes | None):
        self.num = num
        self.head = head  # dict/header bytes before any stream
        self.stream = stream


def _scan_objects(data: bytes) -> dict[int, _Obj]:
    objs: dict[int, _Obj] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        start = m.end()
        end = data.find(b"endobj", start)
        if end == -1:
            end = len(data)
        body = data[start:end]
        sm = re.search(rb"stream\r?\n", body)
        if sm:
            head = body[: sm.start()]
            raw = body[sm.end() :]
            # Prefer the declared direct /Length (PDF 32000-1 §7.3.8.2):
            # the EOL-stripping heuristic below mis-trims streams whose
            # compressed data happens to END with 0x0D (the writer's '\n'
            # then looks like a '\r\n' EOL and two bytes get stripped).
            lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
            if lm and int(lm.group(1)) <= len(raw):
                stream = raw[: int(lm.group(1))]
            else:
                se = raw.rfind(b"endstream")
                stream = raw[:se] if se != -1 else raw
                # strip the single trailing EOL before endstream
                if stream.endswith(b"\r\n"):
                    stream = stream[:-2]
                elif stream.endswith(b"\n"):
                    stream = stream[:-1]
        else:
            head, stream = body, None
        objs[num] = _Obj(num, head, stream)
    return objs


def _dict_ref(head: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", head)
    return int(m.group(1)) if m else None


def _dict_refs(head: bytes, key: bytes) -> list[int]:
    """Resolve ``/Key N 0 R`` or ``/Key [N 0 R M 0 R …]`` to object numbers."""
    m = re.search(re.escape(key) + rb"\s*\[(.*?)\]", head, re.DOTALL)
    if m:
        return [int(g.group(1)) for g in _NUM_REF_RE.finditer(m.group(1))]
    one = _dict_ref(head, key)
    return [one] if one is not None else []


def _page_order(objs: dict[int, _Obj], data: bytes) -> list[int]:
    """Page object numbers in document order via the /Root→/Pages→/Kids walk;
    fallback: ascending object number of /Type /Page objects."""
    root = None
    tm = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
    if tm:
        root = int(tm.group(1))
    else:
        for o in sorted(objs.values(), key=lambda o: o.num):
            if b"/Type" in o.head and b"/Catalog" in o.head:
                root = o.num
                break
    pages: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64 or num not in objs:
            return
        head = objs[num].head
        if b"/Kids" in head:
            for kid in _dict_refs(head, b"/Kids"):
                walk(kid, depth + 1)
        elif re.search(rb"/Type\s*/Page\b", head):
            pages.append(num)

    if root is not None and root in objs:
        pages_root = _dict_ref(objs[root].head, b"/Pages")
        if pages_root is not None:
            walk(pages_root)
    if not pages:
        pages = sorted(
            o.num for o in objs.values() if re.search(rb"/Type\s*/Page\b", o.head)
        )
    return pages


def _decode_stream(obj: _Obj) -> bytes:
    if obj.stream is None:
        return b""
    if b"/FlateDecode" in obj.head:
        try:
            return zlib.decompress(obj.stream)
        except zlib.error as e:
            raise PDFParseError(f"FlateDecode failed: {e}") from e
    return obj.stream


# --- content-stream tokenizer ------------------------------------------------

_ESCAPES = {
    b"n"[0]: "\n",
    b"r"[0]: "\r",
    b"t"[0]: "\t",
    b"b"[0]: "\b",
    b"f"[0]: "\f",
    b"("[0]: "(",
    b")"[0]: ")",
    b"\\"[0]: "\\",
}


def _parse_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse ``(...)`` starting at the '('; returns (decoded, index after ')')."""
    # fast path — the overwhelmingly common case: no escape and no nested
    # paren before the closing ')' means every byte passes through
    # verbatim, identical to what the general loop below would build
    end = data.find(b")", i + 1)
    if end != -1:
        seg = data[i + 1 : end]
        if b"\\" not in seg and b"(" not in seg:
            return seg.decode("cp1252", "replace"), end + 1
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                oct_digits = [e]
                for _ in range(2):
                    if i + 1 < n and 0x30 <= data[i + 1] <= 0x37:
                        i += 1
                        oct_digits.append(data[i])
                    else:
                        break
                out.append(int(bytes(oct_digits), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:
                ch = _ESCAPES.get(e)
                if ch is not None:
                    out.extend(ch.encode("latin-1"))
                else:
                    out.append(e)
            i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return out.decode("cp1252", "replace"), i


def _parse_hex_string(data: bytes, i: int) -> tuple[str, int]:
    end = data.find(b">", i)
    if end == -1:
        end = len(data)
    hexpart = re.sub(rb"\s", b"", data[i + 1 : end])
    if len(hexpart) % 2:
        hexpart += b"0"
    try:
        raw = bytes.fromhex(hexpart.decode("ascii"))
    except ValueError:
        raw = b""
    return raw.decode("cp1252", "replace"), end + 1


_NUM_TOKEN_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_TOKEN_RE = re.compile(rb"/[^\s()<>\[\]{}/%]*")
_OP_TOKEN_RE = re.compile(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]*")


def _tokenize(data: bytes):
    """Yield ('num', float) | ('str', str) | ('name', bytes) | ('op', bytes)
    | ('arr_open'|'arr_close', None)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == 0x25:  # % comment
            j = data.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == 0x28:  # (
            s, i = _parse_literal_string(data, i)
            yield ("str", s)
        elif c == 0x3C:  # < — hex string or dict
            if i + 1 < n and data[i + 1] == 0x3C:
                i += 2
                yield ("op", b"<<")
            else:
                s, i = _parse_hex_string(data, i)
                yield ("str", s)
        elif c == 0x3E and i + 1 < n and data[i + 1] == 0x3E:
            i += 2
            yield ("op", b">>")
        elif c == 0x5B:  # [
            i += 1
            yield ("arr_open", None)
        elif c == 0x5D:  # ]
            i += 1
            yield ("arr_close", None)
        elif c == 0x2F:  # /name
            m = _NAME_TOKEN_RE.match(data, i)
            i = m.end()
            yield ("name", m.group())
        else:
            m = _NUM_TOKEN_RE.match(data, i)
            if m:
                i = m.end()
                yield ("num", float(m.group()))
                continue
            m = _OP_TOKEN_RE.match(data, i)
            if m:
                i = m.end()
                yield ("op", m.group())
            else:
                i += 1  # unknown byte — skip (tolerant)


class _TextState:
    __slots__ = ("tm", "tlm", "leading", "font_size")

    def __init__(self) -> None:
        self.tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
        self.tlm = list(self.tm)
        self.leading = 0.0
        self.font_size = 12.0


def _runs_from_content(data: bytes) -> list[tuple[float, float, float, str]]:
    """Extract text runs (x, y, font_size, text) from one content stream."""
    runs: list[tuple[float, float, float, str]] = []
    st = _TextState()
    stack: list = []
    arr: list | None = None
    in_text = False

    def show(s: str) -> None:
        if s:
            runs.append((st.tm[4], st.tm[5], st.font_size, s))

    def td(tx: float, ty: float) -> None:
        # tlm = translate(tx,ty) × tlm ; tm = tlm
        a, b, c, d, e, f = st.tlm
        st.tlm = [a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f]
        st.tm = list(st.tlm)

    for kind, val in _tokenize(data):
        if kind == "arr_open":
            arr = []
            continue
        if kind == "arr_close":
            if arr is not None:
                stack.append(arr)
            arr = None
            continue
        if kind in ("num", "str", "name"):
            (arr if arr is not None else stack).append((kind, val))
            continue
        # operator
        op = val
        if op == b"BT":
            in_text = True
            st.tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
            st.tlm = list(st.tm)
        elif op == b"ET":
            in_text = False
        elif op == b"Tf":
            if stack and stack[-1][0] == "num":
                st.font_size = float(stack[-1][1])
        elif op == b"TL":
            if stack and stack[-1][0] == "num":
                st.leading = float(stack[-1][1])
        elif op == b"Td" and in_text:
            if len(stack) >= 2 and stack[-1][0] == "num" and stack[-2][0] == "num":
                td(float(stack[-2][1]), float(stack[-1][1]))
        elif op == b"TD" and in_text:
            if len(stack) >= 2 and stack[-1][0] == "num" and stack[-2][0] == "num":
                st.leading = -float(stack[-1][1])
                td(float(stack[-2][1]), float(stack[-1][1]))
        elif op == b"Tm" and in_text:
            nums = [v for k, v in stack[-6:] if k == "num"]
            if len(nums) == 6:
                st.tm = [float(x) for x in nums]
                st.tlm = list(st.tm)
        elif op == b"T*" and in_text:
            td(0.0, -st.leading)
        elif op == b"Tj" and in_text:
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b"'" and in_text:
            td(0.0, -st.leading)
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b'"' and in_text:
            td(0.0, -st.leading)
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b"TJ" and in_text:
            if stack and isinstance(stack[-1], list):
                parts: list[str] = []
                for k, v in stack[-1]:
                    if k == "str":
                        parts.append(v)
                    elif k == "num" and v <= -TJ_WORD_GAP:
                        parts.append(" ")
                show("".join(parts))
        stack = []
    return runs


def _cluster_lines(
    runs: list[tuple[float, float, float, str]],
) -> list[tuple[float, str]]:
    """y-sweep: sort runs by descending y (PDF origin is bottom-left), group
    into lines within a font-size-scaled tolerance, x-sort within each line,
    join run texts with single spaces. Returns [(line_y, line_text)]."""
    if not runs:
        return []
    ordered = sorted(runs, key=lambda r: (-r[1], r[0]))
    lines: list[tuple[float, str]] = []
    cur_y = ordered[0][1]
    cur: list[tuple[float, str]] = []
    cur_tol = max(LINE_TOL_MIN, LINE_TOL_FACTOR * ordered[0][2])

    def flush() -> None:
        if cur:
            text = _WS_RE.sub(" ", " ".join(t for _, t in sorted(cur))).strip()
            if text:
                lines.append((cur_y, text))

    for x, y, fs, text in ordered:
        tol = max(LINE_TOL_MIN, LINE_TOL_FACTOR * fs)
        if abs(y - cur_y) <= max(tol, cur_tol):
            cur.append((x, text))
        else:
            flush()
            cur_y, cur_tol, cur = y, tol, [(x, text)]
    flush()
    return lines


def _page_height(head: bytes, objs: dict[int, _Obj]) -> float:
    m = _MEDIABOX_RE.search(head)
    if not m:
        parent = _dict_ref(head, b"/Parent")
        if parent is not None and parent in objs:
            m = _MEDIABOX_RE.search(objs[parent].head)
    if m:
        try:
            return float(m.group(4)) - float(m.group(2))
        except ValueError:
            pass
    return DEFAULT_PAGE_HEIGHT


def extract_pdf(payload: bytes) -> ExtractResult:
    """Extract reading-order text from PDF bytes.

    Raises :class:`PDFParseError` on structurally broken input (contained to
    an error row by the dispatcher)."""
    objs = _scan_objects(payload)
    if not objs:
        raise PDFParseError("no PDF objects found")
    page_nums = _page_order(objs, payload)
    if not page_nums:
        raise PDFParseError("no pages found")

    pages: list[list[tuple[float, str]]] = []  # per page: [(y, line_text)]
    heights: list[float] = []
    for pnum in page_nums:
        head = objs[pnum].head
        heights.append(_page_height(head, objs))
        content = b""
        for cnum in _dict_refs(head, b"/Contents"):
            if cnum in objs:
                content += _decode_stream(objs[cnum]) + b"\n"
        pages.append(_cluster_lines(_runs_from_content(content)))

    # cross-page header/footer suppression
    suppress: set[str] = set()
    if len(pages) >= HF_MIN_PAGES:
        from collections import Counter

        band_counts: Counter[str] = Counter()
        for lines, h in zip(pages, heights):
            band = HF_BAND_FRACTION * h
            seen: set[str] = set()
            for y, text in lines:
                if (y >= h - band or y <= band) and text not in seen:
                    seen.add(text)
                    band_counts[text] += 1
        need = HF_PAGE_FRACTION * len(pages)
        suppress = {t for t, c in band_counts.items() if c >= need}

    page_texts: list[str] = []
    blocks: list[Block] = []
    idx = 0
    for pi, (lines, h) in enumerate(zip(pages, heights)):
        band = HF_BAND_FRACTION * h
        kept_lines = [
            t
            for y, t in lines
            if not (t in suppress and (y >= h - band or y <= band))
        ]
        ptext = "\n".join(kept_lines)
        if ptext:
            blocks.append(
                Block(
                    idx=idx,
                    tag_path=f"pdf/page[{pi}]",
                    text=ptext,
                    text_density=round(
                        len(ptext) / max(1, len(kept_lines)), 6
                    ),
                    link_density=0.0,
                    kept=True,
                )
            )
            idx += 1
            page_texts.append(ptext)

    text = "\n".join(page_texts)
    doc_type = "pdf" if text else "empty"
    return ExtractResult(doc_type=doc_type, text=text, blocks=blocks)
