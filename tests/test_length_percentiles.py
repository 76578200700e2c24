"""Independent semantic check for text_length_percentiles: the
histogram-based inverse CDF must agree with a plain-Python sort-based
percentile (smallest value whose cumulative count reaches
ceil(p*N/100)) computed directly from the parquet — a third
implementation, independent of both the Spark plan and the oracle CTE.
"""

from __future__ import annotations

import math

import duckdb

from pdf_extractor_spark.queries.textstats import (
    _PCTS,
    text_length_percentiles,
)

SF = "/root/testdata/sf0.001"


def _expected():
    rows = duckdb.sql(
        f"SELECT lang, len(list_filter(string_split(text, ' '), "
        f"t -> t <> '')) AS n FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_lang: dict[str, list[int]] = {}
    for lang, n in rows:
        by_lang.setdefault(lang, []).append(n)
    out = {}
    for lang, ns in by_lang.items():
        ns.sort()
        out[lang] = {
            "n_docs": len(ns),
            **{
                f"p{p}": ns[math.ceil(p * len(ns) / 100) - 1]
                for p in _PCTS
            },
        }
    return out

def test_matches_sort_based_percentiles(spark):
    want = _expected()
    got = {
        r["lang"]: r.asDict()
        for r in text_length_percentiles(spark, SF).collect()
    }
    assert set(got) == set(want)
    for lang, exp in want.items():
        for k, v in exp.items():
            assert got[lang][k] == v, (lang, k, got[lang], exp)


def test_percentiles_are_monotone(spark):
    for r in text_length_percentiles(spark, SF).collect():
        assert r["p25"] <= r["p50"] <= r["p90"] <= r["p99"]
