"""tf-idf top-K operator invariants (value parity vs DuckDB is covered
by the catalog oracle suite)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_tfidf_topk_shape(spark):
    """tf-idf top-K invariants (value parity vs DuckDB is covered by
    the catalog oracle suite): dense ranks 1..K per doc, score
    consistent with tf * (n_docs DIV df), and a corpus-rare token
    outranks a corpus-universal one at equal tf."""
    from pdf_extractor_spark.queries.textstats import (
        TFIDF_K,
        text_tfidf_topk,
    )

    rows = text_tfidf_topk(spark, SF).collect()
    assert rows
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert r["score"] == r["tf"] * (n_docs // r["df_docs"])
    for doc, rs in by_doc.items():
        rks = sorted(r["rk"] for r in rs)
        assert rks == list(range(1, len(rs) + 1)) and len(rs) <= TFIDF_K
        # ranked by score desc with deterministic tie-breaks
        ordered = sorted(
            rs, key=lambda r: (-r["score"], r["df_docs"], r["tok"])
        )
        assert [r["rk"] for r in ordered] == rks
