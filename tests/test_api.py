"""Single-document synchronous API (reference main.py:24-42 parity) and
the O14 NER plug point."""

from __future__ import annotations

import json

from pdf_extractor_spark.api import (
    clear_name_extractors,
    extract_document,
    extract_name,
    register_name_extractor,
)
from pdf_extractor_spark.corpus.generator import generate_rows
from pdf_extractor_spark.ref_extractor import extract


def test_extract_document_matches_spec_and_serializes():
    rows = list(generate_rows(11, 10, 3))
    for r in rows:
        got = extract_document(r.html, url=r.url)
        spec = extract(r.html)
        assert got["url"] == r.url
        assert got["doc_type"] == spec.doc_type
        assert got["text"] == spec.text  # byte-identical per payload
        assert got["n_chars"] == spec.n_chars
        assert len(got["blocks"]) == len(spec.blocks)
        json.dumps(got)  # response-shaped: JSON-serializable


def test_extract_document_contains_errors():
    got = extract_document(b"%PDF-1.4\nbroken")
    assert got["doc_type"] == "error"
    assert got["error"].startswith("PDFParseError")
    assert extract_document(None)["doc_type"] == "empty"


def test_name_chain_regex_arms():
    assert extract_name("NOME: Customer#42 MATRICULA 7") == "Customer#42"
    assert extract_name("SERVIDOR Customer#9 LOTACAO 1") == "Customer#9"
    assert extract_name("no names here") is None
    # reference semantics (pdf_processor.py:459-461): accented pt-BR
    # names and case-insensitive labels must match
    assert extract_name("NOME: JOÃO DA SILVA MATRICULA 7") == "JOÃO DA SILVA"
    assert extract_name("nome: Maria José") == "Maria José"
    assert extract_name("Servidor Antônio Conceição LOTAÇÃO 3") == (
        "Antônio Conceição"
    )


def test_name_chain_ner_plug_point():
    try:
        register_name_extractor(lambda t: None)  # passes
        register_name_extractor(lambda t: (_ for _ in ()).throw(RuntimeError))
        register_name_extractor(
            lambda t: "Model Person" if "MODEL" in t else None
        )
        # model arm wins when it fires...
        assert extract_name("MODEL NOME: Customer#1 X") == "Model Person"
        # ...regex arm still backs it up
        assert extract_name("NOME: Customer#1 MATRICULA 2") == "Customer#1"
    finally:
        clear_name_extractors()
