"""Build fixtures/hostgraph_micro.parquet — a deterministic host-level
link graph (edges src_host -> dst_host) for the graph_pagerank entry:
~50 hosts, preferential-attachment-ish edge counts so ranks are skewed,
plus dangling hosts (no out-edges) and sink-only hosts.

Regenerate (content-identical, seeded):

    python scripts/build_hostgraph_fixture.py
"""

from __future__ import annotations

import pathlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent

SEED = 77
N_HOSTS = 50
N_EDGES = 260


def build_rows(seed: int) -> list[dict]:
    rng = random.Random(seed)
    hosts = [f"h{i:02d}.example" for i in range(N_HOSTS)]
    # hubs: low-index hosts are linked more often (quadratic skew)
    def pick_dst() -> str:
        return hosts[min(rng.randrange(N_HOSTS), rng.randrange(N_HOSTS))]

    edges = set()
    while len(edges) < N_EDGES:
        src = hosts[rng.randrange(5, N_HOSTS)]  # h00-h04 are dangling
        dst = pick_dst()
        if src != dst:
            edges.add((src, dst))
    return [
        {"src_host": s, "dst_host": d} for s, d in sorted(edges)
    ]


def main() -> None:
    rows = build_rows(SEED)
    out = REPO / "fixtures" / "hostgraph_micro.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("src_host", pa.string()), ("dst_host", pa.string())]
            ),
        ),
        out,
    )
    print(f"wrote {len(rows)} edges -> {out}")


if __name__ == "__main__":
    main()
