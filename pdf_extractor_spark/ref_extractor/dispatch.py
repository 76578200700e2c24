"""Content-type dispatch + error containment.

The reference dispatches "digital vs scanned" by trying the text layer and
falling back to OCR when blank (/root/reference/pdf_processor.py:157-160,
SURVEY.md O3). The graft dispatches on the payload itself: ``%PDF-`` magic →
the layout parser, otherwise → the HTML pass; empty payloads short-circuit.

Error containment (SURVEY.md O23): the reference converts any failure into a
fixed error string (pdf_processor.py:184-186) so one bad document never
fails the service; here any exception becomes a deterministic error record
(``doc_type='error'``, ``error=<ExcClass>: <msg>``) so one bad row never
fails a 10^12-row job.
"""

from __future__ import annotations

from pdf_extractor_spark.ref_extractor.html_extract import extract_html
from pdf_extractor_spark.ref_extractor.pdf_extract import extract_pdf
from pdf_extractor_spark.ref_extractor.types import ExtractResult

PDF_MAGIC = b"%PDF-"


def sniff_doc_type(payload: bytes | None) -> str:
    """O3 dispatch rule, vectorizable: empty → 'empty'; %PDF- → 'pdf';
    else 'html' (any other bytes get the HTML treatment — family E3)."""
    if payload is None or not payload.strip():
        return "empty"
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    return "html"


def extract(payload: bytes | None) -> ExtractResult:
    """The executable spec: one payload in, one deterministic result out.

    Never raises. Error messages are deterministic (exception class + its
    message, both derived only from payload bytes)."""
    kind = sniff_doc_type(payload)
    if kind == "empty":
        return ExtractResult(doc_type="empty", text="")
    try:
        if kind == "pdf":
            return extract_pdf(payload)  # may downgrade to 'empty' (textless)
        return extract_html(payload)
    except Exception as e:  # noqa: BLE001 — containment is the contract
        return ExtractResult(
            doc_type="error",
            text="",
            error=f"{type(e).__name__}: {e}",
        )
