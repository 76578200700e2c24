"""url_normalize: pinned per-rule cases + a fixture-wide differential
against an independent plain-Python spec implementation (no shared
expressions with the SQL under test)."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from pdf_extractor_spark.queries.urlnorm import (
    URL_FIXTURE,
    url_normalize_of,
)


def py_canon(u: str) -> str:
    """Independent spec implementation — plain Python string surgery."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", u)
    scheme, host, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
    rest = rest.split("#", 1)[0]
    if scheme == "http" and host.endswith(":80"):
        host = host[: -len(":80")]
    if scheme == "https" and host.endswith(":443"):
        host = host[: -len(":443")]
    if "?" in rest:
        path, q = rest.split("?", 1)
        params = [
            p for p in q.split("&")
            if p and not re.match(r"^(utm_[A-Za-z0-9]+|fbclid)=", p)
        ]
        q = "&".join(params)
    else:
        path, q = rest, ""
    if len(path) > 1:
        path = path.rstrip("/") or "/"
    if path == "":
        path = "/"
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


PINNED = {
    "HTTP://Example.COM:80/a/b/?utm_source=x&q=1#frag":
        "http://example.com/a/b?q=1",
    "https://Site.Example:443/path/": "https://site.example/path",
    "https://site.example/?fbclid=123&real=2":
        "https://site.example/?real=2",
    "https://site.example/p?utm_a=1&utm_b=2": "https://site.example/p",
    "https://site.example:8080/x": "https://site.example:8080/x",
    "https://site.example": "https://site.example/",
    "https://site.example/a//b/": "https://site.example/a//b",
    # param ORDER is preserved (no re-sort: conservative dedup)
    "https://site.example/p?b=2&a=1": "https://site.example/p?b=2&a=1",
}


def _canon_map(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "rec_id long, url string"
    )
    return {
        urls[r["rec_id"]]: r["url_canon"]
        for r in url_normalize_of(df).collect()
    }


def test_pinned_rules(spark):
    got = _canon_map(spark, list(PINNED))
    assert got == PINNED
    # the python spec agrees with the pins too
    assert {u: py_canon(u) for u in PINNED} == PINNED


def test_fixture_differential_and_groups(spark):
    urls = [r["url"] for r in pq.read_table(URL_FIXTURE).to_pylist()]
    got = _canon_map(spark, urls)
    assert got == {u: py_canon(u) for u in urls}
    # messy variants of one base must collapse: fixture has ~160 bases
    # for 300+ records
    n_groups = len(set(got.values()))
    assert n_groups < len(urls) * 0.8


def test_group_stats_consistent(spark):
    urls = ["https://a.example/x?utm_s=1", "https://A.EXAMPLE/x/",
            "https://a.example/x", "https://b.example/y"]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "rec_id long, url string"
    )
    rows = {r["rec_id"]: r for r in url_normalize_of(df).collect()}
    assert [rows[i]["group_size"] for i in range(4)] == [3, 3, 3, 1]
    assert [rows[i]["canon_group"] for i in range(4)] == [0, 0, 0, 3]


def test_schemeless_and_empty_doc_edges(spark):
    # scheme-less rows pass through unchanged (no '://...' garbage)
    urls = ["not-a-url", "example.com/x?utm_s=1", "https://ok.example/a/"]
    got = _canon_map(spark, urls)
    assert got["not-a-url"] == "not-a-url"
    assert got["example.com/x?utm_s=1"] == "example.com/x?utm_s=1"
    assert got["https://ok.example/a/"] == "https://ok.example/a"


def test_seeded_grammar_differential(spark):
    """2000 grammar-generated URLs (wider than the fixture: userinfo-free
    but with odd ports, deep paths, duplicate params, mixed tracking
    positions, fragments with '?') through the Spark expression vs the
    plain-Python spec, one DataFrame pass."""
    import random

    rng = random.Random(606)
    schemes = ["http", "https", "HTTP", "Https", "ftp"]
    hosts = ["A.Example.COM", "x.example", "news.example.org:8080",
             "shop.example.net", "WIKI.EXAMPLE.EDU"]
    segs = ["a", "B", "item7", "2024", "p.q", "x-y"]
    keys = ["id", "page", "utm_source", "utm_x9", "fbclid", "ref",
            "utmx", "xutm_source"]  # near-misses must NOT be stripped

    def gen():
        scheme = rng.choice(schemes)
        host = rng.choice(hosts)
        if rng.random() < 0.3:
            host += ":80" if rng.random() < 0.5 else ":443"
        path = "".join(
            "/" + rng.choice(segs) for _ in range(rng.randrange(0, 4))
        )
        if rng.random() < 0.4:
            path += "/" * rng.randrange(1, 3)
        params = "&".join(
            f"{rng.choice(keys)}={rng.randrange(100)}"
            for _ in range(rng.randrange(0, 4))
        )
        q = f"?{params}" if params else ("?" if rng.random() < 0.1 else "")
        frag = f"#s{rng.randrange(9)}?x=1" if rng.random() < 0.3 else ""
        return f"{scheme}://{host}{path}{q}{frag}"

    urls = list({gen() for _ in range(2000)})
    got = _canon_map(spark, urls)
    want = {u: py_canon(u) for u in urls}
    bad = {u: (got[u], want[u]) for u in urls if got[u] != want[u]}
    assert not bad, dict(list(bad.items())[:5])
