"""Budget-waterfill invariants (cross-engine value parity is covered by
the catalog oracle suite):

- differential vs a plain-Python waterfill (iterative saturate-and-
  redistribute — an independent formulation of the prefix-chain SQL)
  on the real corpus AND on a crafted CASCADE (a source that only
  saturates after an earlier source's overflow is redistributed);
- allocation invariants: alloc <= cap everywhere, sum(alloc) <=
  budget, unallocated remainder < #unsaturated (floor loss only),
  saturated sources form a prefix of the cap/weight order;
- design-scale magnitudes: 1e13-token caps x 1e10-doc weights flow
  through the DECIMAL(38,0) chain condition without overflow and
  still match the Python waterfill exactly (BIGINT cross-products
  would be ~1e23).
"""

from __future__ import annotations

from fractions import Fraction

from pdf_extractor_spark.queries.corpus_select import (
    BUDGET_PCT,
    budget_alloc_of,
    corpus_budget_alloc,
    waterfill_of,
)

SF = "/root/testdata/sf0.001"


def _py_waterfill(caps: dict, ws: dict, budget: int) -> dict:
    # EXACT rational order (Fraction) — the engine ranks by the
    # cross-multiplied integer comparison; a double ratio collides at
    # design-scale magnitudes (see test_double_ratio_collision)
    order = sorted(caps, key=lambda s: (Fraction(caps[s], ws[s]), s))
    b, w_rem = budget, sum(ws.values())
    sat = set()
    for s in order:
        if b * ws[s] >= caps[s] * w_rem:
            sat.add(s)
            b -= caps[s]
            w_rem -= ws[s]
        else:
            break
    return {
        s: (caps[s], 1) if s in sat else ((b * ws[s]) // w_rem, 0)
        for s in caps
    }


def _check(rows, caps, ws):
    budget = sum(caps.values()) * BUDGET_PCT // 100
    expected = _py_waterfill(caps, ws, budget)
    got = {r["source"]: (r["alloc_tokens"], r["saturated"]) for r in rows}
    assert got == expected
    total = sum(a for a, _ in got.values())
    n_unsat = sum(1 for _, s in got.values() if s == 0)
    assert total <= budget
    assert budget - total < max(n_unsat, 1)  # floor loss only
    for s, (a, _) in got.items():
        assert a <= caps[s]
    # saturated sources form a prefix of the cap/weight ratio order
    order = sorted(caps, key=lambda s: (Fraction(caps[s], ws[s]), s))
    flags = [got[s][1] for s in order]
    assert flags == sorted(flags, reverse=True)


def test_equals_python_on_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stats = (
        docs.selectExpr(
            "source",
            "size(filter(split(text, ' '), t -> t <> '')) AS n",
        )
        .groupBy("source")
        .agg({"n": "sum", "*": "count"})
        .collect()
    )
    caps = {r["source"]: r["sum(n)"] for r in stats}
    ws = {r["source"]: r["count(1)"] for r in stats}
    rows = corpus_budget_alloc(spark, SF).collect()
    _check(rows, caps, ws)
    assert sum(r["saturated"] for r in rows) > 0  # signal at this SF


def test_cascade_saturation(spark):
    # source a saturates on its base share; b's cap is ABOVE its base
    # share and saturates only once a's overflow is redistributed
    docs = spark.createDataFrame(
        [("a", " ".join(["t"] * 1)) for _ in range(10)]
        + [("b", " ".join(["t"] * 50)) for _ in range(10)]
        + [("c", " ".join(["t"] * 100)) for _ in range(10)],
        "source string, text string",
    )
    caps = {"a": 10, "b": 500, "c": 1000}
    ws = {"a": 10, "b": 10, "c": 10}
    out = budget_alloc_of(docs).collect()
    _check(out, caps, ws)
    sat = {r["source"]: r["saturated"] for r in out}
    # budget = 1510*90//100 = 1359; b's BASE share 1359*10/30 = 453
    # < 500 (unsaturated stand-alone), but after a saturates the
    # redistributed share is 1349*10/20 = 674 >= 500 — the cascade
    assert sat == {"a": 1, "b": 1, "c": 0}


def test_design_scale_magnitudes(spark):
    # 1e13-token caps, 1e10-doc weights: cross-products ~1e23 — BIGINT
    # would overflow; the DECIMAL/HUGEINT path must match Python ints
    caps = {
        "web": 40_000_000_000_000,
        "code": 3_000_000_000_000,
        "books": 600_000_000_000,
        "wiki": 90_000_000_000,
    }
    ws = {
        "web": 20_000_000_000,
        "code": 4_000_000_000,
        "books": 2_000_000_000,
        "wiki": 1_500_000_000,
    }
    per = spark.createDataFrame(
        [(s, ws[s], caps[s]) for s in caps],
        "source string, w_docs long, cap_tokens long",
    )
    _check(waterfill_of(per).collect(), caps, ws)


def _py_fixedpoint(caps: dict, ws: dict, budget: int) -> dict:
    """Order-FREE waterfill: repeatedly saturate ANY source whose
    proportional share covers its cap, until stable — an independent
    formulation of the same fixed point (no ratio sort anywhere)."""
    sat: set = set()
    while True:
        b = budget - sum(caps[s] for s in sat)
        w = sum(ws[s] for s in ws if s not in sat)
        newly = {
            s
            for s in caps
            if s not in sat and w > 0 and b * ws[s] >= caps[s] * w
        }
        if not newly:
            break
        sat |= newly
    b = budget - sum(caps[s] for s in sat)
    w = sum(ws[s] for s in ws if s not in sat)
    return {
        s: (caps[s], 1) if s in sat else ((b * ws[s]) // w, 0)
        for s in caps
    }


def test_prefix_chain_equals_fixed_point_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from([f"s{i}" for i in range(8)]),
            st.tuples(
                st.integers(min_value=1, max_value=10**6),  # cap
                st.integers(min_value=1, max_value=10**4),  # weight
            ),
            min_size=1,
            max_size=8,
        ),
        st.integers(min_value=0, max_value=99),  # budget pct of total
    )
    def check(spec, pct):
        caps = {s: c for s, (c, _) in spec.items()}
        ws = {s: w for s, (_, w) in spec.items()}
        budget = sum(caps.values()) * pct // 100
        assert _py_waterfill(caps, ws, budget) == _py_fixedpoint(
            caps, ws, budget
        )

    check()


def test_equal_ratio_tie_boundary(spark):
    # three sources with IDENTICAL cap/weight ratios: the saturation
    # boundary falls inside the tie group, so the source-name
    # tie-break decides — pinned against the Python spec
    docs = spark.createDataFrame(
        [("a", " ".join(["t"] * 10))] * 5
        + [("b", " ".join(["t"] * 10))] * 5
        + [("c", " ".join(["t"] * 40))] * 5,
        "source string, text string",
    )
    caps = {"a": 50, "b": 50, "c": 200}
    ws = {"a": 5, "b": 5, "c": 5}
    _check(budget_alloc_of(docs).collect(), caps, ws)


def test_double_ratio_collision(spark):
    """Two sources whose exact cap/weight ratios DIFFER as rationals
    (by 1.2e-15) but round to the SAME double: the double order falls
    to the source-name tie-break, which puts the exactly-HIGHER ratio
    first — and under that wrong order the saturation chain stops
    immediately (nothing saturates), while the exact order saturates
    b_pairlow. The budget (90% of total, tuned via the `web` tail
    source) sits inside the [r_low·W, r_high·W) window, so the two
    orders produce DIFFERENT saturated sets — the engine must match
    the exact-rational Python spec."""
    caps = {
        "b_pairlow": 50_000_000_000_000_037,   # ratio exactly lower
        "a_pairhigh": 50_000_000_000_000_003,  # ratio exactly higher
        "web": 22_222_222_222_222_223,
    }
    ws = {
        "b_pairlow": 5_000_000_000_000_003,
        "a_pairhigh": 4_999_999_999_999_999,
        "web": 1_000_000_000_000_000,
    }
    # the premise: same double, different rational, inverted tie-break
    assert (
        caps["b_pairlow"] / ws["b_pairlow"]
        == caps["a_pairhigh"] / ws["a_pairhigh"]
    )
    assert Fraction(caps["b_pairlow"], ws["b_pairlow"]) < Fraction(
        caps["a_pairhigh"], ws["a_pairhigh"]
    )
    per = spark.createDataFrame(
        [(s, ws[s], caps[s]) for s in caps],
        "source string, w_docs long, cap_tokens long",
    )
    rows = waterfill_of(per).collect()
    _check(rows, caps, ws)
    sat = {r["source"]: r["saturated"] for r in rows}
    # the double order would yield all-zeros here
    assert sat == {"b_pairlow": 1, "a_pairhigh": 0, "web": 0}


def test_single_source(spark):
    docs = spark.createDataFrame(
        [("only", " ".join(["t"] * 20))] * 3,
        "source string, text string",
    )
    out = budget_alloc_of(docs).collect()
    assert len(out) == 1
    # budget 90% < cap: never saturates, alloc = the whole budget
    assert out[0]["saturated"] == 0
    assert out[0]["alloc_tokens"] == 60 * BUDGET_PCT // 100
