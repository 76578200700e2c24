"""ANN quality regression: multiprobe IVF must strictly beat single-probe
IVF recall against the exact brute-force top-k (the whole point of the
Hamming-1 probe expansion). Absolute floors are loose because random
near-orthogonal embeddings are LSH's worst case — real clustered
embeddings sit far higher — but a regression below these floors means the
bucketing broke."""

from __future__ import annotations

from pdf_extractor_spark.queries import CATALOG

SF = "/root/testdata/sf0.001"


def _pairs(spark, name):
    return {
        (r.query_id, r.neighbor_id)
        for r in CATALOG[name].fn(spark, SF).collect()
    }


def test_multiprobe_beats_single_probe(spark):
    exact = _pairs(spark, "embedding_topk")
    ivf = _pairs(spark, "embedding_ivf_topk")
    multi = _pairs(spark, "embedding_ivf_multiprobe")
    r_ivf = len(ivf & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi > r_ivf
    assert r_ivf >= 0.15
    assert r_multi >= 0.45
