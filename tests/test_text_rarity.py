"""text_rarity semantics on constructed corpora (oracle parity covers
the sf corpus)."""

from __future__ import annotations

from pdf_extractor_spark.queries.textstats import text_rarity_of


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in text_rarity_of(df).collect()}


def test_hapax_and_mean_freq(spark):
    rows = [
        (1, "the the the zzzunique"),   # 'the' freq 4 (3 here + 1 below)
        (2, "the common words here"),
        (3, ""),                         # tokenless -> absent from output
    ]
    out = _run(spark, rows)
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1["n_tokens"] == 4
    # freqs: the=4,4,4, zzzunique=1 -> sum 13, hapax 1
    assert r1["sum_tok_freq"] == 13 and r1["n_hapax"] == 1
    assert r1["mean_tok_freq"] == 3.25
    r2 = out[2]
    # the=4, common=1, words=1, here=1
    assert r2["sum_tok_freq"] == 7 and r2["n_hapax"] == 3


def test_rare_garbled_doc_scores_below_common_doc(spark):
    common = "spark data table query join " * 4
    rows = [(i, common) for i in range(10)] + [
        (99, "qx7 zzp9 vvk3 m0q8 r4tz")  # all hapax
    ]
    out = _run(spark, rows)
    assert out[99]["mean_tok_freq"] == 1.0
    assert out[99]["n_hapax"] == 5
    assert out[0]["mean_tok_freq"] > 10 * out[99]["mean_tok_freq"]
