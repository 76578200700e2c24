"""Deterministic robots.txt fixture for the crawl-politeness operator
(`frontier_robots_filter`): one row per host of the cross-host link
corpus (fixtures/linkpages_micro), cycling four archetypes so every
verdict class appears among the frontier candidates:

  i % 4 == 0  no robots row at all        -> default allow
  i % 4 == 1  Disallow: /page/1, Allow: /page/2
              -> /page/1* denied (first match), everything else allowed
  i % 4 == 2  Allow: /page/3, Disallow: /
              -> allow-list: only /page/3* allowed
  i % 4 == 3  Disallow: (empty), Disallow: /page/
              -> the CPython subtlety: an empty Disallow is an
                 allow-everything rule, and it matches FIRST, so the
                 later Disallow is dead — everything allowed

The rule subset is deliberately constrained to what BOTH the relational
implementation and CPython's urllib.robotparser interpret identically:
single `User-agent: *` group, no wildcards, no $ anchors, ASCII paths
(tests/test_robots.py cross-verifies every (host, url) verdict against
robotparser).

    python scripts/build_robots_fixture.py
"""

from __future__ import annotations

import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "fixtures" / "robots_micro.parquet"
N_HOSTS = 12  # h00.example .. h11.example (the linkpages corpus hosts)


def robots_text(i: int) -> str | None:
    if i % 4 == 0:
        return None
    if i % 4 == 1:
        return (
            "User-agent: *\n"
            "Disallow: /page/1\n"
            "Allow: /page/2\n"
        )
    if i % 4 == 2:
        return (
            "User-agent: *\n"
            "Allow: /page/3\n"
            "Disallow: /\n"
        )
    return (
        "User-agent: *\n"
        "Disallow:\n"
        "Disallow: /page/\n"
    )


def main() -> None:
    rows = []
    for i in range(N_HOSTS):
        txt = robots_text(i)
        if txt is not None:
            rows.append({"host": f"h{i:02d}.example", "robots_txt": txt})
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("host", pa.string()), ("robots_txt", pa.string())]
        ),
    )
    pq.write_table(tbl, OUT)
    print(f"wrote {OUT}: {tbl.num_rows} hosts with robots.txt")


if __name__ == "__main__":
    main()
