"""Deterministic clustered-embedding fixture for the ANN scale-path
demonstration.

The driver testdata's embeddings are uniform random — sign-LSH's worst
case, where recall ≈ scan fraction and the multiprobe knob must be
cranked to 14/16 buckets for recall 0.9 (see scripts/ann_probe_sweep.py).
Real embedding spaces are CLUSTERED, and there the same bucketing wins:
this fixture (20 tight Gaussian clusters in 64-dim, 2000 vectors, the
first N_QUERIES as queries) lets `embedding_multiprobe_clustered` hit
recall 0.94 probing only 4/16 buckets — ~30% of the table scanned vs the
~87% the same recall costs on random vectors
(tests/test_similarity_recall.py).

Regenerate (only if the layout ever changes — committed fixture is the
contract): python scripts/build_clustered_embeddings.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "fixtures" / "golden" / "embeddings_clustered.parquet"
N_VECS = 2000
N_CLUSTERS = 20
DIM = 64
NOISE = 0.05  # cluster tightness (per-dim Gaussian sigma around center)


def build() -> pa.Table:
    rng = np.random.default_rng(20260817)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, N_CLUSTERS, size=N_VECS)
    vecs = centers[assign] + NOISE * rng.standard_normal((N_VECS, DIM))
    vecs = vecs.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )


if __name__ == "__main__":
    tbl = build()
    pq.write_table(tbl, OUT)
    print(f"wrote {OUT}: {tbl.num_rows} rows")
