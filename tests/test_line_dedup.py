"""Semantic tests for dedup_lines (cross-document segment boilerplate
strip) on constructed corpora — the oracle parity test
(test_queries_oracle) covers the sf0.001 corpus; these pin the
SEMANTICS: what counts as boilerplate, what survives, and reassembly
order."""

from __future__ import annotations

from pdf_extractor_spark.queries.dedup import (
    LINE_SEG_LEN,
    dedup_lines_of,
)


def _mkdoc(*segments: str) -> str:
    """Build a doc whose LINE_SEG_LEN-token windows are exactly
    `segments` (each segment is padded to LINE_SEG_LEN tokens with
    tokens derived from the segment CONTENT, so equal segments pad
    equally regardless of position or document)."""
    import hashlib

    toks = []
    for seg in segments:
        words = seg.split()
        assert len(words) <= LINE_SEG_LEN
        tag = hashlib.md5(seg.encode()).hexdigest()[:6]
        words = words + [
            f"p{tag}x{j}" for j in range(LINE_SEG_LEN - len(words))
        ]
        toks.extend(words)
    return " ".join(toks)


BOILER = "subscribe to our newsletter terms privacy cookie"


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in dedup_lines_of(df).collect()}


def test_cross_doc_segment_removed_everywhere(spark):
    rows = [
        (1, _mkdoc(BOILER, "alpha beta gamma")),
        (2, _mkdoc("delta epsilon", BOILER)),
        (3, _mkdoc("unique three content here")),
    ]
    out = _run(spark, rows)
    assert out[1]["n_boiler"] == 1 and BOILER not in out[1]["text_clean"]
    assert out[2]["n_boiler"] == 1 and BOILER not in out[2]["text_clean"]
    assert out[3]["n_boiler"] == 0
    # survivors keep their own content, in order
    assert out[1]["text_clean"].startswith("alpha beta gamma")
    assert out[2]["text_clean"].startswith("delta epsilon")


def test_within_doc_repeat_is_not_boilerplate(spark):
    # the same segment twice in ONE doc: distinct-doc count is 1,
    # below LINE_MIN_DOCS, so both instances survive
    seg = "only in this doc repeated twice yes"
    rows = [
        (1, _mkdoc(seg) + " " + _mkdoc(seg)),
        (2, _mkdoc("completely different words over here")),
    ]
    out = _run(spark, rows)
    assert out[1]["n_boiler"] == 0
    assert out[1]["text_clean"].count("only in this doc") == 2


def test_every_instance_of_boiler_removed_and_empty_doc_ok(spark):
    # doc 1 is NOTHING BUT the boilerplate (twice) -> cleans to ''
    rows = [
        (1, _mkdoc(BOILER) + " " + _mkdoc(BOILER)),
        (2, _mkdoc("real content words", BOILER)),
    ]
    out = _run(spark, rows)
    assert out[1]["n_boiler"] == 2 and out[1]["text_clean"] == ""
    assert out[2]["n_boiler"] == 1
    assert out[2]["text_clean"].startswith("real content words")


def test_tail_segment_shorter_than_window(spark):
    # 10 tokens = one full segment + a 2-token tail; the tail is its
    # own segment and survives when unique
    rows = [
        (1, _mkdoc(BOILER) + " tail end"),
        (2, _mkdoc("other doc for the frequency pass", BOILER)),
    ]
    out = _run(spark, rows)
    assert out[1]["n_segs"] == 2 and out[1]["n_boiler"] == 1
    assert out[1]["text_clean"] == "tail end"


def test_empty_and_whitespace_docs_have_zero_segments(spark):
    # Spark's sequence(0, -1) descends — without the empty guard an
    # empty doc grows two phantom '' segments (and two empty docs then
    # boilerplate-match each other)
    rows = [(1, ""), (2, "   "), (3, _mkdoc(BOILER)), (4, _mkdoc(BOILER))]
    out = _run(spark, rows)
    assert out[1]["n_segs"] == 0 and out[1]["text_clean"] == ""
    assert out[2]["n_segs"] == 0 and out[2]["n_boiler"] == 0
    assert out[3]["n_boiler"] == 1  # the real boilerplate still flagged


def test_freq_dir_staging_equivalent_and_reused(spark, tmp_path):
    """The persisted-frequency path (production shape) produces the
    same cleaning as the inline path, and a second run REUSES the
    staged table (its file set is untouched)."""
    import os

    from pdf_extractor_spark.queries.dedup import dedup_lines_of

    rows = [
        (1, _mkdoc(BOILER, "alpha beta gamma")),
        (2, _mkdoc("delta epsilon", BOILER)),
        (3, _mkdoc("unique three content here")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fd = str(tmp_path / "freq")

    inline = {r["doc_id"]: r for r in dedup_lines_of(df).collect()}
    staged = {
        r["doc_id"]: r for r in dedup_lines_of(df, freq_dir=fd).collect()
    }
    assert inline == staged

    mtimes = {
        f: os.path.getmtime(os.path.join(fd, f)) for f in os.listdir(fd)
    }
    again = {
        r["doc_id"]: r for r in dedup_lines_of(df, freq_dir=fd).collect()
    }
    assert again == inline
    assert mtimes == {
        f: os.path.getmtime(os.path.join(fd, f)) for f in os.listdir(fd)
    }


def test_seeded_crossengine_differential(spark):
    """300 seeded random docs — empties, whitespace-only, unicode
    tokens, injected shared boilerplate, within-doc repeats — through
    the Spark plan AND the DuckDB oracle SQL on the same table."""
    import random

    import duckdb
    import pandas as pd

    from pdf_extractor_spark.queries.dedup import DEDUP_LINES_SQL

    rng = random.Random(31337)
    vocab = [f"w{i}" for i in range(40)] + ["héllo", "wörld", "日本", "emoji😀"]
    boiler = " ".join(rng.choice(vocab) for _ in range(LINE_SEG_LEN))
    rows = []
    for i in range(300):
        r = rng.random()
        if r < 0.05:
            text = ""
        elif r < 0.08:
            text = "   "
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randrange(1, 60))]
            if rng.random() < 0.3:
                # splice the shared boilerplate at a segment boundary
                cut = (rng.randrange(0, len(toks) // LINE_SEG_LEN + 1)
                       * LINE_SEG_LEN)
                toks[cut:cut] = boiler.split()
            text = " ".join(toks)
        rows.append((i, text))

    got = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .transform(lambda df: __import__(
            "pdf_extractor_spark.queries.dedup", fromlist=["dedup_lines_of"]
        ).dedup_lines_of(df))
        .toPandas()
    )
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("documents", pdf)
    want = con.sql(DEDUP_LINES_SQL).df()

    def norm(d):
        d = d[sorted(d.columns)]
        return d.sort_values(list(d.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(
        norm(got), norm(want), check_dtype=False
    )
    # the spliced boilerplate must actually have been flagged
    assert want["n_boiler"].sum() > 20
