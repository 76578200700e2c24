"""Hand-computed semantics for the Gopher-style repetition signals
(queries/textstats.py::text_repetition_of). Oracle parity at sf0.001 is
covered by tests/test_queries_oracle.py.
"""

from __future__ import annotations

import pytest

from pdf_extractor_spark.queries.textstats import text_repetition_of


def _run(spark, text):
    df = spark.createDataFrame(
        [(1, text)], "doc_id BIGINT, text STRING"
    )
    return text_repetition_of(df).collect()[0].asDict()


def test_looping_text(spark):
    # "a b a b a b": 6 tokens, 2 distinct, top tok "a"x3,
    # 2-grams: [a b, b a, a b, b a, a b] -> 2 distinct of 5
    out = _run(spark, "a b a b a b")
    assert out["n_tokens"] == 6 and out["n_distinct"] == 2
    assert out["ttr"] == pytest.approx(round(2 / 6, 5))
    assert out["top_tok_n"] == 3
    assert out["top_ratio"] == 0.5
    assert out["dup_2gram_ratio"] == pytest.approx(round(1 - 2 / 5, 5))


def test_all_unique_text(spark):
    out = _run(spark, "one two three four five")
    assert out["ttr"] == 1.0
    assert out["top_tok_n"] == 1 and out["top_ratio"] == 0.2
    assert out["dup_2gram_ratio"] == 0.0


def test_single_token_doc(spark):
    out = _run(spark, "solo")
    assert out["n_tokens"] == 1 and out["ttr"] == 1.0
    assert out["dup_2gram_ratio"] == 0.0


def test_degenerate_single_word_loop(spark):
    # "x x x x": ttr 0.25, top_ratio 1.0, one distinct 2-gram of 3
    out = _run(spark, "x x x x")
    assert out["top_ratio"] == 1.0
    assert out["dup_2gram_ratio"] == pytest.approx(round(1 - 1 / 3, 5))
