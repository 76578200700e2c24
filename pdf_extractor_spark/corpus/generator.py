"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md).

One seeded PRNG drives everything; no wall clock, no external data. Row i of
a corpus with seed S is identical across runs and machines. Payload families
(FIXTURES.md §3) each exercise one reference semantic from SURVEY.md §2.

The size distribution is heavy-tailed and the bench corpus pins a giant-blob
tail (family E4) — the skew driver that byte-length-bucketed salting must
spread (SURVEY.md §4.2).
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass

from pdf_extractor_spark.corpus.pdf_writer import PageContent, write_pdf

EPOCH = dt.datetime(2025, 6, 14, 0, 0, 0)  # fixed base crawl timestamp

WORDS = (
    "data spark table query engine scale crawl page text block density "
    "extract parse layout stream batch shuffle partition skew salt lineage "
    "snapshot manifest column vector arrow pandas filter project join "
    "aggregate window sort cluster line glyph sweep header footer content "
    "boilerplate anchor dense sparse corpus golden fixture deterministic "
    "seed byte identical url timestamp binary payload dispatch magic"
).split()

PT_WORDS = (
    "dados tabela consulta motor escala pagina texto bloco densidade "
    "extrair analisar fluxo lote coluna vetor filtro projetar juntar "
    "agregar janela ordenar linha varredura conteudo ancora denso esparso"
).split()

NAV_LINKS = ["Home", "About", "Products", "Blog", "Contact", "Login", "Search"]
LANGS = ["en", "pt", "de", "zh"]

HTML_FAMILIES = ["H1", "H2", "H3", "H4", "H5", "H6", "H7", "H8"]
PDF_FAMILIES = ["P1", "P2", "P3", "P4", "P5"]
EDGE_FAMILIES = ["E1", "E2", "E3", "E5"]


@dataclass
class PageRow:
    url: str
    warc_ts: dt.datetime
    html: bytes
    text: str | None
    lang: str
    family: str  # generator-internal label (not part of the table schema)


def _sentence(rng: random.Random, lo: int = 6, hi: int = 16, words=WORDS) -> str:
    n = rng.randint(lo, hi)
    toks = [rng.choice(words) for _ in range(n)]
    return (" ".join(toks)).capitalize() + "."


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 6, words=WORDS) -> str:
    return " ".join(_sentence(rng, words=words) for _ in range(rng.randint(lo, hi)))


def _nav(rng: random.Random) -> str:
    links = "".join(f'<a href="/{w.lower()}">{w}</a> | ' for w in NAV_LINKS)
    return f"<nav><div>{links}</div></nav>"


def _footer(rng: random.Random) -> str:
    return (
        '<footer><p>Copyright 2025 Example Site. '
        '<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
    )


def _sidebar(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/p/{i}">{_sentence(rng, 2, 4)}</a></li>' for i in range(5)
    )
    return f'<div class="sidebar"><ul>{items}</ul></div>'


def _shell(rng: random.Random, body_inner: str, charset: str = "utf-8") -> str:
    return (
        "<!DOCTYPE html><html><head>"
        f'<meta charset="{charset}"><title>{_sentence(rng, 3, 6)}</title>'
        "<style>body{margin:0}</style></head><body>"
        f"{_nav(rng)}{body_inner}{_sidebar(rng)}{_footer(rng)}"
        "</body></html>"
    )


# --- HTML families -----------------------------------------------------------


def _h1_plain_article(rng: random.Random) -> bytes:
    paras = "".join(
        f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(3, 12))
    )
    inner = f"<article><h1>{_sentence(rng, 3, 7)}</h1>{paras}</article>"
    return _shell(rng, inner).encode("utf-8")


def _h2_div_soup(rng: random.Random) -> bytes:
    good_cls = rng.choice(["content", "post", "main-text", "entry"])
    bad_cls = rng.choice(["sidebar", "ad-box", "comment", "footer-links"])
    good = "".join(
        f'<div class="{good_cls}"><p>{_paragraph(rng)}</p></div>'
        for _ in range(rng.randint(2, 8))
    )
    bad = "".join(
        f'<div class="{bad_cls}"><p>{_paragraph(rng, 1, 2)}</p></div>'
        for _ in range(rng.randint(1, 4))
    )
    return _shell(rng, good + bad).encode("utf-8")


def _h3_link_farm(rng: random.Random) -> bytes:
    links = "".join(
        f'<p><a href="/l/{i}">{_sentence(rng, 4, 10)}</a></p>'
        for i in range(rng.randint(15, 40))
    )
    real = f"<p>{_paragraph(rng, 3, 5)}</p>"
    return _shell(rng, f"<div>{links}{real}</div>").encode("utf-8")


def _h4_table_layout(rng: random.Random) -> bytes:
    rows = "".join(
        f"<tr><td>{_paragraph(rng, 1, 3)}</td><td>{_sentence(rng, 2, 4)}</td></tr>"
        for _ in range(rng.randint(3, 8))
    )
    inner = f'<table width="100%">{rows}</table>'
    return _shell(rng, inner).encode("utf-8")


def _h5_encodings(rng: random.Random) -> bytes:
    # windows-1252 body with accented text; half the time the declared
    # charset is WRONG (declares utf-8, bytes are cp1252) — decode rule test.
    accented = "café résumé naïve coördinate — déjà vu"
    paras = "".join(
        f"<p>{_paragraph(rng)} {accented}</p>" for _ in range(rng.randint(3, 6))
    )
    wrong = rng.random() < 0.5
    declared = "utf-8" if wrong else "windows-1252"
    doc = _shell(rng, f"<article>{paras}</article>", charset=declared)
    return doc.encode("cp1252", "replace")


def _h6_entities_scripts(rng: random.Random) -> bytes:
    paras = "".join(
        f"<p>{_paragraph(rng)} &amp; caf&eacute; &#233;clair &lt;tag&gt;</p>"
        for _ in range(rng.randint(3, 8))
    )
    decoy = (
        f"<script>var decoy = '{_paragraph(rng)}';</script>"
        f"<style>.x {{ content: '{_sentence(rng)}' }}</style>"
        f"<!-- hidden comment {_paragraph(rng, 1, 2)} -->"
    )
    return _shell(rng, f"<article>{decoy}{paras}</article>").encode("utf-8")


def _h7_malformed(rng: random.Random) -> bytes:
    paras = "".join(
        f"<p>{_paragraph(rng)}" + ("</p>" if rng.random() < 0.5 else "")
        for _ in range(rng.randint(3, 8))
    )
    inner = f"<div><div>{paras}</div>"  # unclosed outer div + stray close below
    return _shell(rng, inner + "</div></div><p>" + _paragraph(rng, 1, 2)).encode(
        "utf-8"
    )


def _h8_ptbr_article(rng: random.Random) -> bytes:
    matricula = rng.randint(10000, 99999)
    mes = rng.choice(
        ["Janeiro", "Maio", "Agosto", "Outubro"]
    )
    ano = rng.randint(2020, 2025)
    total = f"{rng.randint(1, 99)}.{rng.randint(100, 999)},{rng.randint(10, 99)}"
    paras = "".join(
        f"<p>{_paragraph(rng, 2, 4, PT_WORDS)}</p>" for _ in range(rng.randint(2, 5))
    )
    fields = (
        f"<p>MATRÍCULA: {matricula} referência do servidor público estadual</p>"
        f"<p>REFERÊNCIA: {mes}/{ano} competência da folha de pagamento</p>"
        f"<p>TOTAL DE VANTAGENS: {total} valor bruto consolidado no mês</p>"
    )
    return _shell(rng, f"<article>{paras}{fields}</article>").encode("utf-8")


def _giant_html(rng: random.Random, target_bytes: int) -> bytes:
    para = f"<p>{_paragraph(rng, 4, 8)}</p>"
    reps = max(1, target_bytes // len(para.encode("utf-8")))
    return _shell(rng, "<article>" + para * reps + "</article>").encode("utf-8")


# --- PDF families ------------------------------------------------------------


def _p1_single_column(rng: random.Random) -> bytes:
    pc = PageContent().begin(12).tl(14).tm(72, 720)
    for _ in range(rng.randint(5, 30)):
        pc.quote(_sentence(rng, 4, 10))
    pc.end()
    return write_pdf([pc])


def _p2_two_column(rng: random.Random) -> bytes:
    pc = PageContent().begin(10)
    y = 720.0
    for _ in range(rng.randint(6, 18)):
        pc.tm(72, y).tj(_sentence(rng, 2, 5))
        pc.tm(330, y).tj(_sentence(rng, 2, 5))
        y -= 13.0
    pc.end()
    return write_pdf([pc])


def _p3_header_footer(rng: random.Random) -> bytes:
    n_pages = rng.randint(3, 6)
    header = "CONFIDENTIAL REPORT 2025"
    footer_base = "Example Corp - page"
    pages = []
    for p in range(n_pages):
        pc = PageContent().begin(11).tl(13)
        pc.tm(72, 760).tj(header)  # top band (band = 0.08*792 ≈ 63pt)
        pc.tm(72, 700)
        for _ in range(rng.randint(4, 12)):
            pc.quote(_sentence(rng, 4, 9))
        pc.tm(72, 30).tj(footer_base)  # bottom band, repeated text
        pc.end()
        pages.append(pc)
    return write_pdf(pages)


def _p4_tj_kerning(rng: random.Random) -> bytes:
    pc = PageContent().begin(12).tl(14).tm(72, 720)
    for _ in range(rng.randint(4, 12)):
        words = [rng.choice(WORDS) for _ in range(rng.randint(3, 8))]
        parts: list[str | float] = []
        for w in words:
            # intra-word kerning (small, NOT a gap) + inter-word gap (large)
            mid = max(1, len(w) // 2)
            parts.extend([w[:mid], -40.0, w[mid:], -260.0])
        pc.tj_array(parts[:-1])
        pc.tstar()
    pc.end()
    return write_pdf([pc])


def _p5_textless(rng: random.Random) -> bytes:
    return write_pdf([PageContent()])  # valid PDF, zero text operators


def _giant_pdf(rng: random.Random, n_pages: int) -> bytes:
    pages = []
    for _ in range(n_pages):
        pc = PageContent().begin(10).tl(12).tm(72, 740)
        for _ in range(50):
            pc.quote(_sentence(rng, 5, 9))
        pc.end()
        pages.append(pc)
    return write_pdf(pages)


# --- edge families -----------------------------------------------------------


def _e2_truncated_pdf(rng: random.Random) -> bytes:
    return b"%PDF-1.4\n" + bytes(rng.getrandbits(8) for _ in range(rng.randint(40, 400)))


def _e3_random_binary(rng: random.Random) -> bytes:
    return bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 2048)))


# --- corpus assembly ---------------------------------------------------------

_HTML_BUILDERS = {
    "H1": _h1_plain_article,
    "H2": _h2_div_soup,
    "H3": _h3_link_farm,
    "H4": _h4_table_layout,
    "H5": _h5_encodings,
    "H6": _h6_entities_scripts,
    "H7": _h7_malformed,
    "H8": _h8_ptbr_article,
}
_PDF_BUILDERS = {
    "P1": _p1_single_column,
    "P2": _p2_two_column,
    "P3": _p3_header_footer,
    "P4": _p4_tj_kerning,
    "P5": _p5_textless,
}


def make_row(seed: int, i: int, n_days: int, giant: str | None = None) -> PageRow:
    """Build row i deterministically. ``giant`` forces family E4 with the
    given sub-kind ('html' or 'pdf')."""
    rng = random.Random((seed << 20) ^ i)
    site = rng.randint(0, 9999)
    section = rng.choice(["news", "blog", "docs", "wiki", "shop"])
    url = f"https://site{site:04d}.example/{section}/{i:08d}"
    day = i % n_days
    ts = EPOCH + dt.timedelta(days=day, seconds=(i * 9973) % 86400)
    lang = rng.choice(LANGS)

    if giant == "html":
        target = rng.choice([5, 10, 25, 50]) * 1024 * 1024
        payload, family = _giant_html(rng, target), "E4h"
    elif giant == "pdf":
        payload, family = _giant_pdf(rng, rng.randint(500, 1200)), "E4p"
    else:
        roll = rng.random()
        if roll < 0.85:
            family = HTML_FAMILIES[rng.randrange(len(HTML_FAMILIES))]
            payload = _HTML_BUILDERS[family](rng)
        elif roll < 0.95:
            family = PDF_FAMILIES[rng.randrange(len(PDF_FAMILIES))]
            payload = _PDF_BUILDERS[family](rng)
        else:
            family = EDGE_FAMILIES[rng.randrange(len(EDGE_FAMILIES))]
            if family == "E1":
                payload = b""
            elif family == "E2":
                payload = _e2_truncated_pdf(rng)
            elif family == "E3":
                payload = _e3_random_binary(rng)
            else:  # E5 duplicate-content distinct-url: payloads drawn from a
                # pool of 3 seeds so multiple urls share identical bytes
                twin = random.Random((seed << 20) ^ 0xE5 ^ (i % 3))
                payload = _h1_plain_article(twin)

    # noisy "as-crawled" text column — present so the pipeline must extract
    # from `html`, not this column; null 10% of the time (FIXTURES.md §1).
    if rng.random() < 0.10:
        text = None
    else:
        text = _paragraph(rng, 1, 3) + " [crawler boilerplate remnant]"
    return PageRow(url=url, warc_ts=ts, html=payload, text=text, lang=lang,
                   family=family)


def generate_rows(
    seed: int,
    n_rows: int,
    n_days: int = 8,
    giant_html: int = 0,
    giant_pdf: int = 0,
):
    """Yield PageRow for a corpus: n_rows regular rows + pinned giant-blob
    tail rows (family E4, the skew driver)."""
    for i in range(n_rows):
        yield make_row(seed, i, n_days)
    for j in range(giant_html):
        yield make_row(seed, n_rows + j, n_days, giant="html")
    for j in range(giant_pdf):
        yield make_row(seed, n_rows + giant_html + j, n_days, giant="pdf")
