"""Semantic tests for pii_scrub on constructed strings — the oracle
parity test covers the committed fixture; these pin edge semantics."""

from __future__ import annotations

from pdf_extractor_spark.queries.pii import pii_scrub_of


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "rec_id long, text string"
    )
    return {r["rec_id"]: r for r in pii_scrub_of(df).collect()}


def test_each_kind_scrubbed_and_counted(spark):
    out = _run(spark, [
        "write to ana.bob+7@mail.example.org today",
        "call (555) 123-4567 or +1-800-555-0199 now",
        "host is 10.0.255.3 ok",
        "clean text with no pii at all",
    ])
    assert out[0]["n_emails"] == 1 and "<EMAIL>" in out[0]["text_scrubbed"]
    assert "@" not in out[0]["text_scrubbed"]
    assert out[1]["n_phones"] == 2
    assert out[1]["text_scrubbed"] == "call <PHONE> or <PHONE> now"
    assert out[2]["n_ips"] == 1
    assert out[2]["text_scrubbed"] == "host is <IP> ok"
    assert out[3]["text_scrubbed"] == "clean text with no pii at all"
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ips"]) == (0, 0, 0)


def test_sentence_punctuation_stays(spark):
    out = _run(spark, [
        "ping 192.168.0.1.",          # trailing period is not part of the IP
        "dial +44-202-555-0101.",
    ])
    assert out[0]["text_scrubbed"] == "ping <IP>."
    assert out[1]["text_scrubbed"] == "dial <PHONE>."


def test_mixed_kinds_one_doc_and_cascade_order(spark):
    # email host looks IP-ish: the EMAIL rule runs first and consumes
    # the whole span, so no <IP> appears inside the placeholder
    out = _run(spark, [
        "a@b.co 1.2.3.4 (555) 123-4567",
    ])
    r = out[0]
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 1)
    assert r["text_scrubbed"] == "<EMAIL> <IP> <PHONE>"
