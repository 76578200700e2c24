"""Offline sweep that sizes the multiprobe ANN knobs (MP_PLANES,
MP_PROBES in queries/similarity.py): for each plane count and probe
budget T, compute recall@5 of query-directed (margin-ranked) multiprobe
against the exact brute-force top-k, plus the fraction of the table
scanned.

    python scripts/ann_probe_sweep.py [sf_dir ...]

Key finding on the synthetic tables (random near-orthogonal 64-dim
embeddings — the worst case for sign-LSH): recall ≈ scan fraction, i.e.
the bucketing carries almost no signal, so recall >= 0.9 requires
probing ~14/16 buckets. On clustered embeddings the same scheme reaches
0.9 recall at a small fraction of that cost; the point of the sweep is
that MP_PROBES is an explicit, measured recall/cost knob, not a guess.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np


def load(sf_dir: str):
    t = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in t])
    vecs = np.array([r[1] for r in t], dtype=np.float64)
    return ids, vecs


def planes(n_planes: int, dim: int = 64) -> np.ndarray:
    """Same deterministic md5-derived hyperplanes as queries/similarity."""
    out = np.zeros((n_planes, dim))
    for p in range(n_planes):
        for d in range(1, dim + 1):
            h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0]
            out[p, d - 1] = int(h, 16) - 7.5
    return out


def sweep(sf_dir: str, n_queries: int = 10, k: int = 5) -> None:
    ids, vecs = load(sf_dir)
    n = len(ids)
    nrm = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(nrm, nrm)
    exact = {}
    for q in range(n_queries):
        c = cos[q].copy()
        c[q] = -9
        order = np.lexsort((ids, -np.round(c, 9)))
        exact[q] = set(ids[order[:k]])
    print(f"{sf_dir}: N={n}")
    for n_pl in (3, 4, 5):
        pl = planes(n_pl)
        dots = vecs @ pl.T
        bucket = (dots >= 0) @ (1 << np.arange(n_pl)[::-1])
        masks = list(range(2**n_pl))
        for t in range(1, 2**n_pl + 1):
            rec = scan = 0
            for q in range(n_queries):
                margin = np.abs(dots[q])
                scores = [
                    sum(
                        margin[p]
                        for p in range(n_pl)
                        if m >> (n_pl - 1 - p) & 1
                    )
                    for m in masks
                ]
                order = np.lexsort((masks, scores))
                probed = {bucket[q] ^ masks[i] for i in order[:t]}
                cand = [
                    i for i in range(n) if bucket[i] in probed and i != q
                ]
                scan += len(cand)
                top = sorted(
                    cand, key=lambda i: (-round(cos[q][i], 9), i)
                )[:k]
                rec += len({ids[i] for i in top} & exact[q])
            print(
                f"  planes={n_pl} T={t:2d}: "
                f"recall={rec / (n_queries * k):.2f} "
                f"scan={scan / n_queries / n:.2f}"
            )


if __name__ == "__main__":
    for sf in sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        sweep(sf)
