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


def test_seeded_crossengine_differential(spark):
    """A SECOND-seed PII corpus (not the committed fixture) through
    java.util.regex (Spark) vs RE2 (DuckDB) — the two engines must
    agree byte-for-byte on counts and scrubbed text."""
    import duckdb
    import pandas as pd

    from scripts.build_pii_fixture import build_rows
    from pdf_extractor_spark.queries.pii import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        _sq,
        pii_scrub_of,
    )

    rows = build_rows(seed=777, n=400)
    got = pii_scrub_of(
        spark.createDataFrame(
            [(r["rec_id"], r["text"]) for r in rows],
            "rec_id long, text string",
        )
    ).toPandas()

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    want = con.sql(f"""
        SELECT rec_id,
               CAST(len(regexp_extract_all(text, {_sq(PII_EMAIL)})) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(text, {_sq(PII_PHONE)})) AS BIGINT)
                 AS n_phones,
               CAST(len(regexp_extract_all(text, {_sq(PII_IPV4)})) AS BIGINT)
                 AS n_ips,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, {_sq(PII_EMAIL)}, '<EMAIL>', 'g'),
                   {_sq(PII_PHONE)}, '<PHONE>', 'g'),
                 {_sq(PII_IPV4)}, '<IP>', 'g') AS text_scrubbed
        FROM t
    """).df()

    def norm(d):
        d = d[sorted(d.columns)]
        return d.sort_values(list(d.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(norm(got), norm(want), check_dtype=False)
    assert want["n_emails"].sum() > 50  # the corpus has real signal
