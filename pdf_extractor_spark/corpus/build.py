"""Materialize corpora and golden fixtures (FIXTURES.md §2).

Goldens are produced by the PURE-PYTHON reference extractor — never by the
Spark pipeline — so the byte-identity test (tests/test_golden_bytes.py) is a
genuine two-implementation cross-check, not a tautology.

Canonical corpora (FIXTURES.md §1):
  sf-micro  200 rows  seed 42 — committed goldens, pytest
  sf-small  20k rows  seed 42 — e2e + resume tests (generated on demand)
  sf-bench  200k rows seed 42 + giant-blob tail — scaling bench
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_spark.corpus.generator import PageRow, generate_rows
from pdf_extractor_spark.ref_extractor import extract

GOLDEN_SEED = 42
GOLDEN_ROWS = 200
GOLDEN_DAYS = 8

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def rows_to_pages_table(rows: list[PageRow]) -> pa.Table:
    return pa.table(
        {
            "url": [r.url for r in rows],
            "warc_ts": [r.warc_ts for r in rows],
            "html": [r.html for r in rows],
            "text": [r.text for r in rows],
            "lang": [r.lang for r in rows],
        },
        schema=PAGES_SCHEMA,
    )


def write_pages_parquet(
    out_path: str | pathlib.Path,
    seed: int = GOLDEN_SEED,
    n_rows: int = GOLDEN_ROWS,
    n_days: int = GOLDEN_DAYS,
    giant_html: int = 0,
    giant_pdf: int = 0,
    batch_rows: int = 5000,
) -> int:
    """Write a pages corpus to ONE parquet file (unpartitioned ingest form —
    the Iceberg-style partitioned table is written by tables/icetable.py).
    Streams in batches so sf-bench giant blobs don't need corpus-sized RAM."""
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    gen = generate_rows(seed, n_rows, n_days, giant_html, giant_pdf)
    writer = pq.ParquetWriter(out_path, PAGES_SCHEMA, compression="zstd")
    n = 0
    batch: list[PageRow] = []
    try:
        for row in gen:
            batch.append(row)
            if len(batch) >= batch_rows:
                writer.write_table(rows_to_pages_table(batch))
                n += len(batch)
                batch = []
        if batch:
            writer.write_table(rows_to_pages_table(batch))
            n += len(batch)
    finally:
        writer.close()
    return n


def golden_record(row: PageRow) -> dict:
    res = extract(row.html)
    return {
        "url": row.url,
        "doc_type": res.doc_type,
        "extracted_text": res.text,
        "text_sha256": hashlib.sha256(res.text.encode("utf-8")).hexdigest(),
        "n_blocks": res.n_blocks,
        "n_chars": res.n_chars,
        "error": res.error,
        "family": row.family,
    }


def build_goldens(
    out_dir: str | pathlib.Path,
    seed: int = GOLDEN_SEED,
    n_rows: int = GOLDEN_ROWS,
    n_days: int = GOLDEN_DAYS,
) -> int:
    """Write goldens.parquet + goldens.jsonl + the matching pages corpus."""
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = list(generate_rows(seed, n_rows, n_days))
    records = [golden_record(r) for r in rows]
    table = pa.table(
        {k: [rec[k] for rec in records] for k in records[0]},
    )
    pq.write_table(table, out_dir / "goldens.parquet", compression="zstd")
    with open(out_dir / "goldens.jsonl", "w", encoding="utf-8") as f:
        for rec in records:
            f.write(json.dumps(rec, ensure_ascii=False, sort_keys=True) + "\n")
    write_pages_parquet(out_dir / "pages_micro.parquet", seed, n_rows, n_days)
    build_warc_fixture(out_dir, seed, n_rows, n_days)
    return len(records)


WARC_FILES_MICRO = 4


def build_warc_fixture(
    out_dir: str | pathlib.Path,
    seed: int = GOLDEN_SEED,
    n_rows: int = GOLDEN_ROWS,
    n_days: int = GOLDEN_DAYS,
) -> int:
    """The SAME micro corpus as .warc.gz archives (WARC_FILES_MICRO
    files) — the catalog's `warc_extract_pages` reads these and must
    hash-match the parquet path's expected output, proving the WARC
    round-trip is lossless end to end."""
    import shutil

    from pdf_extractor_spark.sources.warc import write_warc_dir

    warc_dir = pathlib.Path(out_dir) / "warc_micro"
    # clear first: regeneration with fewer rows/files must not leave
    # stale part files behind (read_warc globs the whole directory, so a
    # survivor would silently corrupt the fixture's row set)
    shutil.rmtree(warc_dir, ignore_errors=True)
    rows = list(generate_rows(seed, n_rows, n_days))
    return write_warc_dir(warc_dir, rows, WARC_FILES_MICRO)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="fixtures/golden")
    ap.add_argument("--seed", type=int, default=GOLDEN_SEED)
    ap.add_argument("--rows", type=int, default=GOLDEN_ROWS)
    ap.add_argument("--days", type=int, default=GOLDEN_DAYS)
    args = ap.parse_args()
    n = build_goldens(args.out, args.seed, args.rows, args.days)
    print(f"wrote {n} goldens to {args.out}")


if __name__ == "__main__":
    main()
