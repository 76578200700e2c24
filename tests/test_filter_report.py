"""corpus_filter_report: each rule proven to fire on a constructed doc
and the totals to reconcile (the oracle parity test covers the sf
corpus)."""

from __future__ import annotations

from pdf_extractor_spark.queries.corpus_select import (
    corpus_filter_report_of,
)


def _report(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return dict(
        (r["rule"], r["n_docs"])
        for r in corpus_filter_report_of(df).collect()
    )


def test_each_rule_fires_and_totals_reconcile(spark):
    good = " ".join(
        f"the w{i} of a{i} and b{i}" for i in range(10)
    )  # 50 tokens, all distinct-ish, english stopwords
    rows = [
        (1, good),                              # pass_all
        (2, "the of and to in it"),             # too_short (6 tokens)
        (3, " ".join(f"zz{i} qq{i} rr{i}" for i in range(20))),  # lang_unknown
        (4, "the the the the the " * 5 + "of and a in is it x y z w"),  # low_ttr+dup
        (5, good + " extra unique trailing tokens here now"),    # pass_all
    ]
    rep = _report(spark, rows)
    assert rep["total"] == 5
    assert rep["too_short"] == 1
    assert rep["lang_unknown"] == 1
    assert rep["low_ttr"] >= 1
    assert rep["dup_2grams"] >= 1
    assert rep["pass_all"] == 2
    assert rep["fail_any"] == 3
    assert rep["pass_all"] + rep["fail_any"] == rep["total"]


def test_report_is_single_scan(spark):
    from tests.test_plans import plan_of
    from pdf_extractor_spark.queries import CATALOG

    plan = plan_of(
        CATALOG["corpus_filter_report"].fn(spark, "/root/testdata/sf0.001")
    )
    assert plan.count("FileScan") == 1
    assert "Join" not in plan
    # the only Generate is the 1-row stack() unpivot, never a corpus
    # explode: it must sit ABOVE the final aggregate, i.e. the plan
    # fragment below it contains the HashAggregate
    gen_idx = plan.index("Generate stack")
    assert "HashAggregate" in plan[gen_idx:]
    # column pruning reached the scan: only `text` is read
    assert "ReadSchema: struct<text:string>" in plan
