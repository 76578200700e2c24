"""Build fixtures/pii_micro.parquet — a deterministic 300-row corpus of
word text with injected PII spans (emails, phones in two canonical
layouts, IPv4s), for the pii_scrub catalog entry.

The synthetic sf* documents contain no PII-shaped strings, so the scrub
operator needs its own fixture — same pattern as pages_micro /
warc_micro / media fixtures. Regenerate with:

    python scripts/build_pii_fixture.py

Rows are seeded (SEED below); regeneration is content-identical.
"""

from __future__ import annotations

import pathlib
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SEED = 2024
N_ROWS = 300

WORDS = (
    "contact us at for more info call our office the quick report was "
    "filed by server at address please email support team billing "
    "reachable on line new order from customer shipped to node"
).split()

FIRST = ["ana", "bob", "carla", "dev", "eve", "frank", "gita", "hugo"]
DOM = ["example.com", "mail.example.org", "corp.example.net", "uni.example.edu"]


def _email(rng: random.Random) -> str:
    user = rng.choice(FIRST)
    if rng.random() < 0.4:
        user += f".{rng.choice(FIRST)}"
    if rng.random() < 0.3:
        user += f"+{rng.randrange(100)}"
    return f"{user}@{rng.choice(DOM)}"


def _phone(rng: random.Random) -> str:
    a, b, c = rng.randrange(200, 999), rng.randrange(100, 999), rng.randrange(1000, 9999)
    if rng.random() < 0.5:
        return f"({a}) {b}-{c}"
    return f"+{rng.randrange(1, 99)}-{a}-{b}-{c}"


def _ip(rng: random.Random) -> str:
    return ".".join(str(rng.randrange(0, 256)) for _ in range(4))


def build_rows(seed: int, n: int) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        toks: list[str] = []
        n_pii = rng.randrange(0, 4) if rng.random() < 0.7 else 0
        spans = [rng.choice(["email", "phone", "ip"]) for _ in range(n_pii)]
        n_words = rng.randrange(8, 40)
        slots = sorted(rng.randrange(n_words + 1) for _ in spans)
        si = 0
        for w in range(n_words):
            while si < len(spans) and slots[si] == w:
                kind = spans[si]
                pii = {"email": _email, "phone": _phone, "ip": _ip}[kind](rng)
                # sometimes glue sentence punctuation to the span end
                if kind != "email" and rng.random() < 0.3:
                    pii += "."
                toks.append(pii)
                si += 1
            toks.append(rng.choice(WORDS))
        while si < len(spans):
            toks.append({"email": _email, "phone": _phone, "ip": _ip}[spans[si]](rng))
            si += 1
        rows.append({"rec_id": i, "text": " ".join(toks)})
    return rows


def main() -> None:
    rows = build_rows(SEED, N_ROWS)
    out = REPO / "fixtures" / "pii_micro.parquet"
    out.parent.mkdir(parents=True, exist_ok=True)
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema([("rec_id", pa.int64()), ("text", pa.string())]),
    )
    pq.write_table(table, out)
    n_pii_rows = sum(1 for r in rows if "@" in r["text"] or "(" in r["text"])
    print(f"wrote {len(rows)} rows -> {out} (~{n_pii_rows} with PII-ish chars)")


if __name__ == "__main__":
    main()
