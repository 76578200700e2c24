"""Minimal deterministic PDF writer.

Emits the exact operator subset the from-scratch parser supports
(FIXTURES.md §3.2): objects + xref + trailer; one FlateDecode content stream
per page using only ``BT/ET, Tf, Td, TD, Tm, TL, T*, Tj, ', TJ`` with
ASCII/WinAnsi text. Having the writer in-repo closes the parser's input
domain (SURVEY.md §7 M0 scope control).
"""

from __future__ import annotations

import zlib

PAGE_W = 612.0
PAGE_H = 792.0


def escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class PageContent:
    """Builds one page's content stream from text-positioning ops."""

    def __init__(self) -> None:
        self.ops: list[str] = []

    def begin(self, font_size: float = 12.0) -> "PageContent":
        self.ops.append(f"BT /F1 {font_size:g} Tf")
        return self

    def tm(self, x: float, y: float) -> "PageContent":
        self.ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
        return self

    def td(self, tx: float, ty: float) -> "PageContent":
        self.ops.append(f"{tx:g} {ty:g} Td")
        return self

    def tl(self, leading: float) -> "PageContent":
        self.ops.append(f"{leading:g} TL")
        return self

    def tstar(self) -> "PageContent":
        self.ops.append("T*")
        return self

    def tj(self, text: str) -> "PageContent":
        self.ops.append(f"({escape_pdf_string(text)}) Tj")
        return self

    def quote(self, text: str) -> "PageContent":
        self.ops.append(f"({escape_pdf_string(text)}) '")
        return self

    def tj_array(self, parts: list[str | float]) -> "PageContent":
        items = []
        for p in parts:
            if isinstance(p, str):
                items.append(f"({escape_pdf_string(p)})")
            else:
                items.append(f"{p:g}")
        self.ops.append("[" + " ".join(items) + "] TJ")
        return self

    def end(self) -> "PageContent":
        self.ops.append("ET")
        return self

    def build(self) -> bytes:
        return "\n".join(self.ops).encode("latin-1")


def write_pdf(pages: list[PageContent], compress: bool = True) -> bytes:
    """Assemble a complete PDF: catalog(1) → pages(2) → font(3) →
    per page: page obj + content obj. Proper xref + trailer."""
    n_pages = len(pages)
    objects: dict[int, bytes] = {}
    font_num = 3
    page_nums = [4 + 2 * i for i in range(n_pages)]
    content_nums = [5 + 2 * i for i in range(n_pages)]

    kids = " ".join(f"{n} 0 R" for n in page_nums)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode("latin-1")
    )
    objects[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    for i, page in enumerate(pages):
        data = page.build()
        if compress:
            stream = zlib.compress(data, 6)
            filt = b"/Filter /FlateDecode "
        else:
            stream = data
            filt = b""
        objects[page_nums[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} "
            f"{PAGE_H:g}] /Contents {content_nums[i]} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode("latin-1")
        objects[content_nums[i]] = (
            b"<< "
            + filt
            + f"/Length {len(stream)} >>\nstream\n".encode("latin-1")
            + stream
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin-1")
        out += objects[num]
        out += b"\nendobj\n"
    xref_pos = len(out)
    max_num = max(objects)
    out += f"xref\n0 {max_num + 1}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
        else:
            out += b"0000000000 65535 f \n"
    out += (
        f"trailer\n<< /Size {max_num + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)
