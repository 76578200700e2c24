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

from collections.abc import Callable

from pdf_extractor_spark.ref_extractor.html_extract import extract_html
from pdf_extractor_spark.ref_extractor.pdf_extract import extract_pdf
from pdf_extractor_spark.ref_extractor.types import ExtractResult

PDF_MAGIC = b"%PDF-"

# Secondary-extractor registry — the plug point for the reference's OCR
# arm (O5, /root/reference/pdf_processor.py:332-384: rasterize → EasyOCR
# → Tesseract backup). No OCR/raster libs exist offline, so the registry
# ships EMPTY and textless PDFs keep the documented `doc_type='empty'`
# behavior (goldens unchanged); a deployment with OCR registers a
# callable here (import-gated, like multimodal._EXTRA_IMAGE_DECODERS)
# and it slots into the SAME Spark plan — registration must happen at
# worker import time (e.g. a plugin module shipped via --py-files that
# registers on import), since the registry is per-Python-worker state.
SecondaryExtractor = Callable[[bytes], "ExtractResult | None"]
_SECONDARY_EXTRACTORS: list[SecondaryExtractor] = []


def register_secondary_extractor(fn: SecondaryExtractor) -> None:
    """Register a fallback for textless PDFs (the OCR arm's socket).
    ``fn(payload)`` returns an ExtractResult to adopt, or None to pass."""
    _SECONDARY_EXTRACTORS.append(fn)


def clear_secondary_extractors() -> None:
    _SECONDARY_EXTRACTORS.clear()


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
            res = extract_pdf(payload)  # may downgrade to 'empty' (textless)
            if res.doc_type == "empty":
                for secondary in _SECONDARY_EXTRACTORS:
                    try:
                        alt = secondary(payload)
                    except Exception:  # noqa: BLE001 — a broken plugin
                        continue  # must not break O23 containment
                    if alt is not None:
                        return alt
            return res
        return extract_html(payload)
    except Exception as e:  # noqa: BLE001 — containment is the contract
        return ExtractResult(
            doc_type="error",
            text="",
            error=f"{type(e).__name__}: {e}",
        )
