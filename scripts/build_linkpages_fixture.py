"""Build fixtures/linkpages_micro.parquet — a 60-page HTML corpus whose
anchors CROSS hosts (the golden pages_micro corpus only has relative
hrefs, so its host graph is all self-edges): 12 hosts, seeded
preferential attachment toward low-index hubs, a mix of absolute and
relative links, entity-bearing anchor text. Feeds the composed
link_graph_rank catalog entry (links → host edges → PageRank).

Standalone HTML strings — deliberately NOT the golden corpus generator,
whose output is frozen by the byte-identity invariant.

Regenerate (content-identical, seeded):

    python scripts/build_linkpages_fixture.py
"""

from __future__ import annotations

import pathlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent

SEED = 909
N_HOSTS = 12
PAGES_PER_HOST = 5
WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _host(i: int) -> str:
    return f"h{i:02d}.example"


def build_rows(seed: int) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for hi in range(N_HOSTS):
        for p in range(PAGES_PER_HOST):
            url = f"https://{_host(hi)}/page/{p}"
            links = []
            for _ in range(rng.randrange(2, 7)):
                # preferential attachment: hubs (low index) linked more
                ti = min(rng.randrange(N_HOSTS), rng.randrange(N_HOSTS))
                anchor = " &amp; ".join(
                    rng.choice(WORDS) for _ in range(rng.randrange(1, 3))
                )
                if ti == hi or rng.random() < 0.25:
                    href = f"/local/{rng.randrange(9)}"  # relative: self-host
                else:
                    href = f"https://{_host(ti)}/page/{rng.randrange(9)}"
                links.append(f'<a href="{href}">{anchor}</a>')
            body = " ".join(
                f"<p>{rng.choice(WORDS)} {links[i] if i < len(links) else ''}"
                f" {rng.choice(WORDS)}</p>"
                for i in range(max(len(links), 3))
            )
            html = (
                "<html><head><title>t</title></head><body>"
                f"{body}</body></html>"
            ).encode()
            rows.append({"url": url, "html": html})
    return rows


def main() -> None:
    rows = build_rows(SEED)
    out = REPO / "fixtures" / "linkpages_micro.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema([("url", pa.string()), ("html", pa.binary())]),
        ),
        out,
    )
    n_links = sum(r["html"].count(b"<a href") for r in rows)
    print(f"wrote {len(rows)} pages, {n_links} anchors -> {out}")


if __name__ == "__main__":
    main()
