"""Drift-monitor invariants (cross-engine value parity is covered by
the catalog oracle suite):

- differential vs a plain-Python chi-square with the same token-sorted
  fold order (Python float addition == the engines' ordered left fold,
  exactly);
- drift direction: injecting an over-represented token into the batch
  slice raises chi2 vs the undisturbed corpus; an unseen token shows
  up in n_new_tokens / new_mass_pm (the OOV signal chi-square cannot
  carry) and not in chi2;
- degenerate safety: a batch with no in-vocabulary overlap yields
  chi2 over o=0 contributions only (= sum of expected counts).
"""

from __future__ import annotations

from collections import Counter

from pdf_extractor_spark.queries.corpus_select import (
    BATCH_DRIFT_MIN,
    BATCH_DRIFT_MOD,
    corpus_drift_chi2,
    drift_chi2_of,
)

SF = "/root/testdata/sf0.001"


def _py_chi2(texts: dict[int, str]):
    ct: Counter = Counter()
    bt: Counter = Counter()
    for d, t in texts.items():
        toks = [x for x in t.split(" ") if x]
        (bt if d % BATCH_DRIFT_MOD >= BATCH_DRIFT_MIN else ct).update(toks)
    big_c, big_b = sum(ct.values()), sum(bt.values())
    chi2 = 0.0
    for tok in sorted(ct):  # the engines' fold order
        o, c = bt.get(tok, 0), ct[tok]
        r = float(o * big_c - c * big_b)
        chi2 += r / float(big_c) * (r / float(big_b)) / float(c)
    new = {t: n for t, n in bt.items() if t not in ct}
    return (
        len(ct),
        round(chi2, 2),
        len(new),
        sum(new.values()) * 1000 // big_b,
    )


def test_equals_python_spec(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    row = corpus_drift_chi2(spark, SF).collect()[0]
    assert (
        row["n_shared"],
        row["chi2"],
        row["n_new_tokens"],
        row["new_mass_pm"],
    ) == _py_chi2(texts)


def test_drift_direction_and_oov_signal(spark):
    # corpus docs (doc_id % 10 < 8) share one distribution; batch doc 8
    # mirrors it (no drift baseline), batch doc 18 floods one token and
    # introduces a brand-new token
    base = "aa bb cc dd " * 6
    calm = [(i, base) for i in range(8)] + [(8, base)]
    drifted = calm + [(18, "aa aa aa aa aa aa aa aa zz zz")]
    calm_row = drift_chi2_of(
        spark.createDataFrame(calm, "doc_id long, text string")
    ).collect()[0]
    drift_row = drift_chi2_of(
        spark.createDataFrame(drifted, "doc_id long, text string")
    ).collect()[0]
    assert drift_row["chi2"] > calm_row["chi2"]
    assert calm_row["n_new_tokens"] == 0
    assert drift_row["n_new_tokens"] == 1  # zz
    assert drift_row["new_mass_pm"] > 0
    # python spec agrees on both corpora
    assert (
        drift_row["n_shared"],
        drift_row["chi2"],
        drift_row["n_new_tokens"],
        drift_row["new_mass_pm"],
    ) == _py_chi2(dict(drifted))


def test_disjoint_batch_is_all_expected_mass(spark):
    rows = [(0, "aa bb cc"), (1, "aa bb cc"), (8, "xx yy zz")]
    out = drift_chi2_of(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()[0]
    # every corpus token has o=0: contribution = e_t, so chi2 = B = 3
    assert out["chi2"] == 3.0
    assert out["n_new_tokens"] == 3
    assert out["new_mass_pm"] == 1000
