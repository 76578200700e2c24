"""Build fixtures/url_micro.parquet — a deterministic 400-row corpus of
messy crawl URLs for the url_normalize catalog entry: mixed-case
schemes/hosts, default ports, fragments, tracking params interleaved
with real ones, trailing slashes — generated as VARIANTS of ~160 clean
base urls so canonicalization collapses known duplicate groups.

Regenerate (content-identical, seeded):

    python scripts/build_url_fixture.py
"""

from __future__ import annotations

import pathlib
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SEED = 4242
N_BASES = 160

HOSTS = ["news.example.com", "blog.example.org", "shop.example.net",
         "wiki.example.edu", "media.example.io"]
SEGS = ["archive", "posts", "item", "2024", "deep", "p", "tag"]


def _base(rng: random.Random) -> str:
    scheme = rng.choice(["http", "https"])
    host = rng.choice(HOSTS)
    depth = rng.randrange(0, 4)
    path = "/" + "/".join(rng.choice(SEGS) + str(rng.randrange(100))
                          for _ in range(depth)) if depth else "/"
    params = [f"{k}={rng.randrange(1000)}"
              for k in rng.sample(["id", "page", "ref", "sort"],
                                  rng.randrange(0, 3))]
    q = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{path}{q}"


def _mess(rng: random.Random, url: str) -> str:
    scheme, rest = url.split("://", 1)
    host, _, tail = rest.partition("/")
    tail = "/" + tail if rest != host else ""
    path, _, q = tail.partition("?")
    if rng.random() < 0.3:
        scheme = scheme.upper() if rng.random() < 0.5 else scheme.title()
    if rng.random() < 0.3:
        host = host.upper() if rng.random() < 0.5 else host.title()
    if rng.random() < 0.25:
        host += ":80" if scheme.lower() == "http" else ":443"
    if rng.random() < 0.3 and len(path) > 1 and not path.endswith("/"):
        path += "/"
    params = [p for p in q.split("&") if p]
    n_track = rng.randrange(0, 3)
    for _ in range(n_track):
        k = rng.choice(["utm_source", "utm_medium", "utm_campaign", "fbclid"])
        params.insert(rng.randrange(len(params) + 1),
                      f"{k}=t{rng.randrange(100)}")
    q2 = "?" + "&".join(params) if params else ""
    frag = f"#sec{rng.randrange(20)}" if rng.random() < 0.3 else ""
    return f"{scheme}://{host}{path}{q2}{frag}"


def build_rows(seed: int) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    rec = 0
    for _ in range(N_BASES):
        base = _base(rng)
        for _ in range(rng.randrange(1, 4)):
            rows.append({"rec_id": rec, "url": _mess(rng, base)})
            rec += 1
    return rows


def main() -> None:
    rows = build_rows(SEED)
    out = REPO / "fixtures" / "url_micro.parquet"
    table = pa.Table.from_pylist(
        rows, schema=pa.schema([("rec_id", pa.int64()), ("url", pa.string())])
    )
    pq.write_table(table, out)
    print(f"wrote {len(rows)} urls -> {out}")


if __name__ == "__main__":
    main()
