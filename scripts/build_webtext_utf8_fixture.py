"""Build fixtures/webtext_utf8_micro.parquet — the multi-byte UTF-8
twin of webtext_micro (pdf_extractor_spark/corpus/webtext.py:
webtext_utf8_rows): the same Heaps-law corpus with 2-/3-/4-byte
codepoints injected per token by a pure function of the token, so
cross-document duplicated runs stay BYTE-duplicated. Exists for the
byte-granularity exact-substring family: the ASCII fixture pins
byte == char; this one exercises real multi-byte splicing (cut
boundaries must snap to codepoint starts or the output is not UTF-8).

Regenerate with:  python scripts/build_webtext_utf8_fixture.py
Rows are seeded (SEED below); regeneration is content-identical.
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pdf_extractor_spark.corpus.webtext import (  # noqa: E402
    write_webtext_utf8_parquet,
)

SEED = 7
N_DOCS = 400
OUT = REPO / "fixtures" / "webtext_utf8_micro.parquet"

if __name__ == "__main__":
    write_webtext_utf8_parquet(OUT, SEED, N_DOCS)
    print(f"wrote {N_DOCS} docs to {OUT}")
