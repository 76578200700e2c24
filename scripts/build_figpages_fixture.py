"""Build fixtures/figpages_micro.parquet — a 48-page HTML corpus rich
in ``<img>`` / ``<figure>`` / ``<figcaption>`` markup for the
image-caption pair miner (the golden pages_micro corpus has no img
tags at all). Every caption-priority branch is planted: figcaption
before AND after its img, empty figcaption falling back to alt,
alt-only, caption-less, src-less (skipped), nested figures, second
figcaption ignored, entity refs, filename-junk alt texts (the LAION
filter case), one PDF payload and one mid-tag-truncated page (O23
containment), plus unclosed figures at EOF.

Standalone HTML strings — deliberately NOT the golden corpus generator,
whose output is frozen by the byte-identity invariant.

Regenerate (content-identical, seeded):

    python scripts/build_figpages_fixture.py
"""

from __future__ import annotations

import pathlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent

SEED = 1717
N_HOSTS = 8
PAGES_PER_HOST = 6
WORDS = (
    "sunset harbor mountain forest river canyon meadow glacier "
    "lighthouse orchard village bridge"
).split()
EXTS = ["jpg", "png", "webp"]


def _cap(rng: random.Random, n_lo: int = 2, n_hi: int = 8) -> str:
    return " ".join(
        rng.choice(WORDS) for _ in range(rng.randrange(n_lo, n_hi))
    )


def _img_block(rng: random.Random, hi: int, p: int, j: int) -> str:
    src = f"https://img{hi}.example/{rng.choice(WORDS)}_{p}{j}.{rng.choice(EXTS)}"
    kind = rng.randrange(10)
    if kind < 2:  # figcaption AFTER img
        return (
            f'<figure><img src="{src}" alt="{_cap(rng)}">'
            f"<figcaption>{_cap(rng)} &amp; {_cap(rng, 1, 3)}"
            f"</figcaption></figure>"
        )
    if kind < 4:  # figcaption BEFORE img
        return (
            f"<figure><figcaption>{_cap(rng)}</figcaption>"
            f'<img src="{src}"></figure>'
        )
    if kind == 4:  # empty figcaption -> alt fallback
        return (
            f"<figure><figcaption>  </figcaption>"
            f'<img src="{src}" alt="{_cap(rng)}"></figure>'
        )
    if kind == 5:  # nested figure: innermost wins for the inner img
        return (
            f"<figure><figcaption>{_cap(rng)}</figcaption>"
            f"<figure><figcaption>{_cap(rng)}</figcaption>"
            f'<img src="{src}"></figure>'
            f'<img src="https://img{hi}.example/outer_{p}{j}.png"></figure>'
        )
    if kind == 6:  # second figcaption ignored
        return (
            f"<figure><figcaption>{_cap(rng)}</figcaption>"
            f"<figcaption>{_cap(rng)}</figcaption>"
            f'<img src="{src}"></figure>'
        )
    if kind == 7:  # filename-junk alt (the LAION filter case)
        base = f"{rng.choice(WORDS)}-{rng.choice(WORDS)}"
        return (
            f'<img src="https://img{hi}.example/{base}.jpg" alt="{base}">'
        )
    if kind == 8:  # src-less (skipped) + caption-less
        return f'<img alt="{_cap(rng)}"><img src="{src}">'
    return f'<img src="{src}" alt="{_cap(rng)}">'  # plain alt-only


def build_rows(seed: int) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for hi in range(N_HOSTS):
        for p in range(PAGES_PER_HOST):
            url = f"https://h{hi:02d}.example/gallery/{p}"
            blocks = [
                _img_block(rng, hi, p, j)
                for j in range(rng.randrange(2, 6))
            ]
            body = " ".join(
                f"<p>{_cap(rng)}</p> {b}" for b in blocks
            )
            html = (
                "<html><head><title>g</title></head><body>"
                f"{body}</body></html>"
            ).encode()
            rows.append({"url": url, "html": html})
    # planted DUPLICATE image srcs for the dedup-by-canonical-URL step:
    # the same image appears on three pages under url variants that
    # canonicalize to one key (raw / utm-tracking param / mixed-case
    # host) — the LAION crawl reality where one hot image is embedded
    # site-wide
    for di in range(5):
        base = f"img{di}.example/shared_{rng.choice(WORDS)}_{di}.jpg"
        variants = [
            f"https://{base}",
            f"https://{base}?utm_source=feed{di}",
            f"https://{base.upper()[: len(f'img{di}.example')]}"
            f"{base[len(f'img{di}.example'):]}",
        ]
        for vi, src in enumerate(variants):
            url = f"https://h{di:02d}.example/embed/{vi}"
            html = (
                "<html><body>"
                f"<p>{_cap(rng)}</p>"
                f'<img src="{src}" alt="{_cap(rng)}">'
                "</body></html>"
            ).encode()
            rows.append({"url": url, "html": html})
    # O23 rows: a PDF payload (zero pairs) and a truncated page whose
    # figure never closes (flushed at EOF)
    rows.append(
        {"url": "https://h00.example/doc.pdf", "html": b"%PDF-1.4 x"}
    )
    rows.append(
        {
            "url": "https://h00.example/truncated",
            "html": (
                '<html><body><figure><img src="https://img0.example/t.png">'
                "<figcaption>cut mid stream"
            ).encode(),
        }
    )
    return rows


def main() -> None:
    rows = build_rows(SEED)
    out = REPO / "fixtures" / "figpages_micro.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema([("url", pa.string()), ("html", pa.binary())]),
        ),
        out,
    )
    n_imgs = sum(r["html"].count(b"<img") for r in rows)
    print(f"wrote {len(rows)} pages, {n_imgs} img tags -> {out}")


if __name__ == "__main__":
    main()
