"""Typed extraction results — mirrors the `extracted` table schema
(FIXTURES.md §4) so the Spark stage can emit rows without reshaping.

The reference models its output with pydantic rows
(/root/reference/pdf_processor.py:26-37); here plain dataclasses suffice —
the hard schema lives in the Spark StructType (operators/extract.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Block:
    """One content block (the graft's analog of the reference's OCR box
    tuples, /root/reference/pdf_processor.py:355-366)."""

    idx: int
    tag_path: str
    text: str
    text_density: float
    link_density: float
    kept: bool


@dataclass
class ExtractResult:
    doc_type: str  # 'html' | 'pdf' | 'empty' | 'error'
    text: str  # THE invariant column (byte-identical per url)
    blocks: list[Block] = field(default_factory=list)
    error: str = ""

    @property
    def n_blocks(self) -> int:
        return len(self.blocks)

    @property
    def n_chars(self) -> int:
        return len(self.text)
