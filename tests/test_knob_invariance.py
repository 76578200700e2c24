"""Execution-knob invariance — the correctness face of the north rule's
two-cluster-size criterion: a representative slice of the catalog's
shuffle/join-heavy operators must produce IDENTICAL result sets when
the execution geometry changes (shuffle partition count, AQE on/off).
Any operator whose output depends on partitioning — a nondeterministic
window order, a partition-dependent sample, an unseeded hash — fails
here before it flakes on a real cluster re-size.

The slice covers each mechanism class: LSH self-join + iterative
clustering, Arrow-batch partial aggregation, broadcast-bitmap Bloom,
running-sum islands, per-shard prefix sums, hash-threshold sampling,
window ranking with tie-breaks, and the capstone composed pipeline.
"""

from __future__ import annotations

import pytest

from pdf_extractor_spark.queries import CATALOG

SF = "/root/testdata/sf0.001"

ENTRIES = [
    "dedup_near_pipeline",
    "dedup_clusters_star",
    "dedup_semantic",
    "dedup_bloom_probe_bitmap",
    "dedup_substring_spans",
    "dedup_substring_strided",
    "dedup_substring_cut",
    "dedup_jaccard_prefix",
    "dedup_cms_hot",
    "sketch_distinct_kmv_partial",
    "sketch_distinct_kmv_merged",
    "text_winnow",
    "dedup_winnow_pairs",
    "web_bpe_train",
    "web_bpe_tokens",
    "web_bpe_encode",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "web_decontaminate_semantic",
    "web_split_by_cluster",
    "media_phash_pairs",
    "media_phash_clusters",
    "media_audiofp_pairs",
    "media_audiofp_clusters",
    "media_vhash_pairs",
    "media_vhash_pairs_offset",
    "image_pairs_dedup",
    "corpus_budget_alloc",
    "corpus_drift_chi2",
    "text_tfidf_topk",
    "corpus_pack_sequences",
    "corpus_sample_stratified",
    "corpus_sample_priority",
    "corpus_shuffle_shards",
]

KNOBS = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.enabled": "false",
}


def _rows(spark, name):
    return sorted(map(tuple, CATALOG[name].fn(spark, SF).collect()))


@pytest.mark.parametrize("name", ENTRIES)
def test_result_set_is_knob_invariant(spark, name):
    baseline = _rows(spark, name)
    assert baseline
    prev = {k: spark.conf.get(k) for k in KNOBS}
    try:
        for k, v in KNOBS.items():
            spark.conf.set(k, v)
        assert _rows(spark, name) == baseline, (
            f"{name}: result set changed under "
            "shuffle.partitions=7 / AQE off"
        )
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
