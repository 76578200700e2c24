"""Skew guards for the dedup family, proven on a pathological corpus:

- LSH bucket cap: a boilerplate bucket of B identical docs would emit
  B(B-1)/2 candidate pairs in ONE task; with B > LSH_BUCKET_CAP the
  bucket is dropped wholesale, so total pair count stays bounded by the
  genuine near-dup population.
- Shingle DF pruning: one stop-bigram spanning ALL docs of a source
  would alone emit S(S-1)/2 intersection rows; pruned, the pair count
  stays linear in the number of docs that share *rare* shingles.

Both guards are mirrored in the DuckDB oracles (tests/test_queries_oracle
checks value parity on real data); here we check the BOUND itself.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor_spark.queries.dedup import (
    LSH_BUCKET_CAP,
    SHINGLE_DF_CAP,
    dedup_minhash_lsh_pairs,
    ngram_jaccard,
)

N_BOILER = 120  # > LSH_BUCKET_CAP and > SHINGLE_DF_CAP
N_REAL = 12


@pytest.fixture(scope="module")
def patho_dir(tmp_path_factory):
    """N_BOILER byte-identical boilerplate docs + N_REAL distinct docs
    forming near-dup pairs, all in one source; every doc also shares one
    corpus-wide stop-bigram sentence."""
    assert N_BOILER > LSH_BUCKET_CAP and N_BOILER > SHINGLE_DF_CAP
    stop = "of the"  # present in every doc → DF = N_BOILER + N_REAL
    rows = []
    for i in range(N_BOILER):
        rows.append(
            {
                "doc_id": i,
                "text": f"cookie notice please accept terms {stop} site",
                "lang": "en",
                "source": "crawl-a",
                "n_chars": 40,
            }
        )
    for i in range(N_REAL):
        # pairs (even, odd) share a long distinctive body differing only
        # in the trailing variant token → strong near-dups
        words = [f"w{i // 2}x{j}" for j in range(40)]
        body = " ".join(words)
        rows.append(
            {
                "doc_id": N_BOILER + i,
                "text": f"{body} variant{i % 2} {stop}",
                "lang": "en",
                "source": "crawl-a",
                "n_chars": 50,
            }
        )
    out = tmp_path_factory.mktemp("patho")
    pq.write_table(
        pa.Table.from_pylist(rows), out / "documents.parquet"
    )
    return str(out)


def test_lsh_bucket_cap_bounds_pairs(spark, patho_dir):
    pairs = dedup_minhash_lsh_pairs(spark, patho_dir).collect()
    # uncapped, the boilerplate bucket alone emits N_BOILER*(N_BOILER-1)/2
    # = 7140 pairs; capped, only the small-bucket (real near-dup) pairs
    # survive
    assert len(pairs) < N_BOILER * (N_BOILER - 1) // 2
    assert len(pairs) <= LSH_BUCKET_CAP**2
    ids = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert all(i >= N_BOILER for i in ids), "boilerplate bucket leaked"
    # the genuine near-dup pairs are still found
    found = {(r.doc_a, r.doc_b) for r in pairs}
    expect = {
        (N_BOILER + 2 * k, N_BOILER + 2 * k + 1) for k in range(N_REAL // 2)
    }
    assert expect <= found


def test_shingle_df_cap_keeps_pairs_linear(spark, patho_dir):
    pairs = ngram_jaccard(spark, patho_dir).collect()
    # the corpus-wide stop-bigram must not connect everything: without
    # pruning the intersection join emits >= C(N_BOILER+N_REAL, 2) = 8646
    # rows through one shingle key
    n_docs = N_BOILER + N_REAL
    assert len(pairs) < n_docs * (n_docs - 1) // 2
    # near-dup (even, odd) pairs still score above threshold
    found = {(r.doc_a, r.doc_b) for r in pairs}
    expect = {
        (N_BOILER + 2 * k, N_BOILER + 2 * k + 1) for k in range(N_REAL // 2)
    }
    assert expect <= found


def test_staged_band_path_is_equivalent(spark, tmp_path):
    """The petabyte staging path (band table written to parquet before
    the self-join) must produce the identical candidate-pair set — the
    flag changes the physical plan only."""
    from pdf_extractor_spark.queries.dedup import dedup_minhash_lsh_pairs

    sf = "/root/testdata/sf0.001"
    plain = sorted(
        tuple(r) for r in dedup_minhash_lsh_pairs(spark, sf).collect()
    )
    staged = sorted(
        tuple(r)
        for r in dedup_minhash_lsh_pairs(
            spark, sf, stage_dir=str(tmp_path)
        ).collect()
    )
    assert plain == staged and plain
