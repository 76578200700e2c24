"""Build dist/pdf_extractor_spark.zip for spark-submit --py-files.

Only package source goes in (no tests/fixtures); deterministic member
order and zeroed timestamps so the artifact is reproducible.
"""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "pdf_extractor_spark"
OUT = REPO / "dist" / "pdf_extractor_spark.zip"


def build() -> pathlib.Path:
    OUT.parent.mkdir(exist_ok=True)
    files = sorted(
        p for p in PKG.rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)))
            info.date_time = (1980, 1, 1, 0, 0, 0)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, p.read_bytes())
    return OUT


if __name__ == "__main__":
    path = build()
    print(f"wrote {path} ({path.stat().st_size} bytes)")
