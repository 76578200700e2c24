"""Build fixtures/media_phash_micro.parquet — the perceptual-hash
dedup fixture: images with PLANTED near-duplicate pairs (brightness
twins at hamming 0, tweak twins at hamming exactly 2/5, independent
negatives, one corrupt payload). Regenerate ONLY if the planted spec in
pdf_extractor_spark/corpus/media.py intentionally changes —
tests/test_multimodal.py pins fixture == generator output.

    python scripts/build_phash_fixture.py
"""
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pdf_extractor_spark.corpus.media import write_phash_media_parquet

if __name__ == "__main__":
    n = write_phash_media_parquet(REPO / "fixtures" / "media_phash_micro.parquet")
    print(f"wrote {n} rows")
