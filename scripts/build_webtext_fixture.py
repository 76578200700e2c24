"""Build fixtures/webtext_micro.parquet — the deterministic Heaps-law
natural-text corpus (pdf_extractor_spark/corpus/webtext.py): Zipf
vocabulary, real newline-separated lines with a recurring boilerplate
pool, ~10% token-mutation near-duplicates, and two lexical registers
(prose/spam) under the `label` column.

Exists because the driver sf* `documents` table has a CLOSED 31-token
vocabulary — the adversarial worst case for prefix-filtered Jaccard
joins and a dead end for learned classifiers (round-4 VERDICT item 1).
Same committed-fixture pattern as pii_micro / linkpages_micro.

Regenerate with:  python scripts/build_webtext_fixture.py
Rows are seeded (SEED below); regeneration is content-identical.
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pdf_extractor_spark.corpus.webtext import write_webtext_parquet  # noqa: E402

SEED = 7
N_DOCS = 1200
OUT = REPO / "fixtures" / "webtext_micro.parquet"

if __name__ == "__main__":
    write_webtext_parquet(OUT, SEED, N_DOCS)
    print(f"wrote {N_DOCS} docs to {OUT}")
