"""Single-document synchronous API — the reference's request/response
surface (/root/reference/main.py:24-42: one uploaded file in, one JSON
result out) as a plain function over the same executable spec the Spark
stage runs. Use it for ad-hoc checks, services, or notebooks; the batch
job (plans/extract_plan.py) remains the scale path — this function and
the Spark pipeline share ref_extractor, so their text is byte-identical
per payload by construction.

Also hosts the NER plug point (O14, /root/reference/
pdf_processor.py:452-461): the reference extracts person names with a
spaCy PER pass and falls back to a `NOME[:\\s]*(...)` regex. No NER
model exists offline, so the registry ships empty and the regex arm is
the behavior; a deployment registers a model-backed callable and it
becomes the primary arm of the same coalesce chain — identical contract
to dispatch.register_secondary_extractor (the OCR socket).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pdf_extractor_spark.ref_extractor import extract
from pdf_extractor_spark.version import EXTRACTOR_VERSION

# NER registry: fn(text) -> extracted person name, or None to pass.
NameExtractor = Callable[[str], "str | None"]
_NAME_EXTRACTORS: list[NameExtractor] = []

# the reference's regex fallback arm (pdf_processor.py:459-461:
# r"NOME[:\s]*([A-Za-zÀ-ÿ\s]+)" with re.IGNORECASE — accented Latin-1
# letters and case-insensitive labels, pt-BR names being the norm),
# plus the SERVIDOR line variant the payslip layouts emit; '#0-9' admits
# the synthetic Customer#N fixtures. Terminated at the following field
# label or end of line.
_NAME_RES = [
    re.compile(
        r"NOME[:\s]*([A-Za-zÀ-ÿ][A-Za-zÀ-ÿ#0-9 ]*?)"
        r"(?:\s+MATR[IÍ]CULA|\s*$)",
        re.IGNORECASE | re.MULTILINE,
    ),
    re.compile(
        r"SERVIDOR\s+([A-Za-zÀ-ÿ][A-Za-zÀ-ÿ#0-9 ]*?)"
        r"(?:\s+LOTA[CÇ][AÃ]O|\s*$)",
        re.IGNORECASE | re.MULTILINE,
    ),
]


def register_name_extractor(fn: NameExtractor) -> None:
    """Register a model-backed (NER) name extractor as the primary arm of
    the O14 coalesce chain. Registration is per-Python-process: for Spark
    workers, register at import time of a --py-files shipped plugin."""
    _NAME_EXTRACTORS.append(fn)


def clear_name_extractors() -> None:
    _NAME_EXTRACTORS.clear()


def extract_name(text: str) -> str | None:
    """O14 coalesce chain: NER plugins first, regex arms second, None if
    nothing matches (callers supply their own default)."""
    for ner in _NAME_EXTRACTORS:
        try:
            name = ner(text)
        except Exception:  # noqa: BLE001 — a broken model must not
            continue  # break the chain (O23 containment)
        if name:
            return name
    for rx in _NAME_RES:
        m = rx.search(text)
        if m:
            return m.group(1).strip()
    return None


def extract_document(
    payload: bytes | None, url: str | None = None
) -> dict:
    """Extract one payload now — the synchronous analog of the
    reference's POST handler. Never raises (O23): failures come back as
    ``doc_type='error'`` with a deterministic ``error`` string.

    Returns the same fields the batch pipeline lands per row, plus the
    O14 name chain, as one JSON-serializable dict."""
    res = extract(payload)
    return {
        "url": url,
        "doc_type": res.doc_type,
        "text": res.text,
        "n_blocks": res.n_blocks,
        "n_chars": res.n_chars,
        "blocks": [
            {
                "idx": b.idx,
                "tag_path": b.tag_path,
                "text": b.text,
                "text_density": b.text_density,
                "link_density": b.link_density,
                "kept": b.kept,
            }
            for b in res.blocks
        ],
        "name": extract_name(res.text),
        "error": res.error or None,
        "extractor_version": EXTRACTOR_VERSION,
    }
