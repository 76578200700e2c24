"""Pure-Python single-document reference extractor — the executable spec.

This package has NO Spark dependency. It defines, deterministically, what
"extracted text" means for one payload. Golden fixtures are produced from it
(fixtures/golden/*), and the Spark pipeline (operators/extract.py) must match
it byte-for-byte per url (BASELINE.json north_rule invariant).

Reference semantics preserved (SURVEY.md §2):
- O3 dispatch: content sniff on the binary payload (reference:
  /root/reference/pdf_processor.py:157-160 "digital vs scanned" becomes
  "HTML vs PDF vs empty").
- O4/O8: layout-aware text with reading order from a y-coordinate sweep
  (reference pdf_processor.py:322-330, 364-370).
- O7: confidence-threshold keep/drop becomes block-level text-density /
  link-density classification.
- O9: fallback chain — if primary extraction keeps nothing, fall back to the
  whole-body text (reference pdf_processor.py:372-380 "<50 chars → backup").
- O22: byte-stable canonical output (reference pdf_processor.py:165-182).
- O23: error containment — any per-document failure yields an error record,
  never an exception (reference pdf_processor.py:184-186).
"""

from pdf_extractor_spark.ref_extractor.dispatch import extract, sniff_doc_type
from pdf_extractor_spark.ref_extractor.types import Block, ExtractResult

__all__ = ["extract", "sniff_doc_type", "Block", "ExtractResult"]
