"""Materialize expected outputs for the five previously oracle-less
catalog queries, so the driver's DuckDB hash gate covers 34/34.

Each expected table is computed by the PURE-PYTHON implementations
(ref_extractor.extract, operators/multimodal.py decoders) directly over
the committed fixtures — no Spark involved — then written under
``fixtures/golden/expected/``. The catalog's oracle SQL for these queries
is simply ``SELECT … FROM '<expected>.parquet'``: DuckDB reads the
fixture, the driver hash-compares it against the Spark result, and any
divergence between the Spark Arrow-batch path and the pure spec fails
the gate.

Regenerate ONLY when extractor/decoder semantics intentionally change
(same policy as the goldens — bump EXTRACTOR_VERSION alongside):

    python scripts/build_expected_oracles.py

``tests/test_expected_oracles.py`` recomputes everything in-memory and
asserts the committed fixtures match, so silent drift is caught by CI.
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "fixtures" / "golden"
EXPECTED = GOLDEN / "expected"


def expected_extract_pages() -> pa.Table:
    from pdf_extractor_spark.ref_extractor import extract

    pages = pq.read_table(GOLDEN / "pages_micro.parquet").to_pylist()
    rows = []
    for p in pages:
        res = extract(p["html"])
        rows.append(
            {
                "url": p["url"],
                "doc_type": res.doc_type,
                "n_blocks": res.n_blocks,
                "n_chars": res.n_chars,
                "text_md5": hashlib.md5(
                    res.text.encode("utf-8")
                ).hexdigest(),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("doc_type", pa.string()),
                ("n_blocks", pa.int64()),
                ("n_chars", pa.int64()),
                ("text_md5", pa.string()),
            ]
        ),
    )


def expected_extract_first_block() -> pa.Table:
    from pdf_extractor_spark.ref_extractor import extract

    pages = pq.read_table(GOLDEN / "pages_micro.parquet").to_pylist()
    rows = []
    for p in pages:
        res = extract(p["html"])
        kept = [b for b in res.blocks if b.kept]
        if not kept:
            continue
        rows.append(
            {
                "url": p["url"],
                "first_block_text": kept[0].text,
                "first_block_path": kept[0].tag_path,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("first_block_text", pa.string()),
                ("first_block_path", pa.string()),
            ]
        ),
    )


def expected_extract_links() -> pa.Table:
    from pdf_extractor_spark.ref_extractor.links import collect_links

    pages = pq.read_table(GOLDEN / "pages_micro.parquet").to_pylist()
    rows = []
    for p in pages:
        for seq, href, anchor in collect_links(p["html"]):
            rows.append(
                {"url": p["url"], "seq": seq, "href": href,
                 "anchor": anchor}
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("seq", pa.int64()),
                ("href", pa.string()),
                ("anchor", pa.string()),
            ]
        ),
    )


def expected_link_graph_links() -> pa.Table:
    """Raw (url, seq, href, anchor) anchors of the CROSS-host link
    corpus (fixtures/linkpages_micro.parquet) — the composed
    link_graph_rank oracle derives hosts, edges and integer PageRank
    from these rows in SQL."""
    from pdf_extractor_spark.ref_extractor.links import collect_links

    pages = pq.read_table(
        REPO / "fixtures" / "linkpages_micro.parquet"
    ).to_pylist()
    rows = []
    for p in pages:
        for seq, href, anchor in collect_links(p["html"]):
            rows.append(
                {"url": p["url"], "seq": seq, "href": href,
                 "anchor": anchor}
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("seq", pa.int64()),
                ("href", pa.string()),
                ("anchor", pa.string()),
            ]
        ),
    )


def _media(kind: str) -> list[dict]:
    tbl = pq.read_table(GOLDEN / "media_micro.parquet")
    return [r for r in tbl.to_pylist() if r["kind"] == kind]


def expected_media_image_features() -> pa.Table:
    from pdf_extractor_spark.operators.multimodal import decode_image

    rows = []
    for m in _media("image"):
        row = {"media_id": m["media_id"], "width": None, "height": None,
               "channels": None, "mean_luma": None, "error": None}
        try:
            img = decode_image(m["payload"])
            h, w, c = img.shape
            f = img.astype(np.float64)
            luma = (
                0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
            )
            row.update(
                width=w, height=h, channels=c,
                mean_luma=round(float(luma.mean()), 6),
            )
        except Exception as e:  # noqa: BLE001 — mirrors O23 containment
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("media_id", pa.int64()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("channels", pa.int32()),
                ("mean_luma", pa.float64()),
                ("error", pa.string()),
            ]
        ),
    )


def expected_media_audio_features() -> pa.Table:
    from pdf_extractor_spark.operators.multimodal import decode_wav

    rows = []
    for m in _media("audio"):
        row = {"media_id": m["media_id"], "sample_rate": None,
               "n_samples": None, "channels": None, "duration_ms": None,
               "rms": None, "error": None}
        try:
            samples, rate = decode_wav(m["payload"])
            n, ch = samples.shape
            rms = float(np.sqrt(np.mean(np.square(samples)))) if n else 0.0
            row.update(
                sample_rate=rate, n_samples=n, channels=ch,
                duration_ms=int(n * 1000 / rate), rms=round(rms, 6),
            )
        except Exception as e:  # noqa: BLE001
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("media_id", pa.int64()),
                ("sample_rate", pa.int32()),
                ("n_samples", pa.int64()),
                ("channels", pa.int32()),
                ("duration_ms", pa.int64()),
                ("rms", pa.float64()),
                ("error", pa.string()),
            ]
        ),
    )


def expected_media_frame_sample(every_k: int = 4) -> pa.Table:
    from pdf_extractor_spark.operators.multimodal import decode_rawv

    rows = []
    for m in _media("video"):
        row = {"media_id": m["media_id"], "n_frames": None,
               "n_sampled": None, "error": None}
        try:
            frames = decode_rawv(m["payload"])
            row.update(
                n_frames=len(frames), n_sampled=len(frames[::every_k])
            )
        except Exception as e:  # noqa: BLE001
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("media_id", pa.int64()),
                ("n_frames", pa.int32()),
                ("n_sampled", pa.int32()),
                ("error", pa.string()),
            ]
        ),
    )


def expected_text_compress_ratio() -> pa.Table:
    """Compression-ratio quality signal over the extracted text of the
    golden corpus: zlib level 6 (the bundled zlib pins the bytes;
    tests/test_expected_oracles.py recomputes in-memory, so an
    interpreter/zlib upgrade that changes the stream is caught, not
    silently compared stale). ratio_pm is integer per-mille —
    compressed size relative to utf-8 size; LOW means repetitive/
    boilerplate text, the Dolma/C4-style gate signal."""
    import zlib

    from pdf_extractor_spark.ref_extractor import extract

    pages = pq.read_table(GOLDEN / "pages_micro.parquet").to_pylist()
    rows = []
    for p in pages:
        res = extract(p["html"])
        raw = res.text.encode("utf-8")
        comp = zlib.compress(raw, 6)
        rows.append(
            {
                "url": p["url"],
                "n_bytes": len(raw),
                "n_compressed": len(comp),
                "ratio_pm": len(comp) * 1000 // max(len(raw), 1),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("n_bytes", pa.int64()),
                ("n_compressed", pa.int64()),
                ("ratio_pm", pa.int64()),
            ]
        ),
    )


def expected_warc_cdx_index() -> pa.Table:
    """CDX index of the committed WARC corpus, computed by the
    pure-Python member walker (sources/warc.iter_warc_cdx) — the oracle
    for the Spark binaryFile -> mapInArrow index stage."""
    import datetime as dt

    from pdf_extractor_spark.sources.warc import iter_warc_cdx

    epoch = dt.datetime(1970, 1, 1)
    us = dt.timedelta(microseconds=1)
    rows = []
    for f in sorted((GOLDEN / "warc_micro").glob("*.warc.gz")):
        for off, ln, url, ts, dig in iter_warc_cdx(f.read_bytes()):
            rows.append(
                {
                    "file": f.name,
                    "offset": off,
                    "length": ln,
                    "url": url,
                    "ts_us": (ts - epoch) // us,
                    "payload_md5": dig,
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("file", pa.string()),
                ("offset", pa.int64()),
                ("length", pa.int64()),
                ("url", pa.string()),
                ("ts_us", pa.int64()),
                ("payload_md5", pa.string()),
            ]
        ),
    )


def expected_media_image_resize() -> pa.Table:
    """32x32 nearest-neighbor thumbnails of the image fixtures, computed
    by the pure-numpy resize + PPM encoder — md5-compared against the
    Spark Arrow-batch resize stage."""
    from pdf_extractor_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
        resize_nearest,
    )

    rows = []
    for m in _media("image"):
        row = {"media_id": m["media_id"], "thumb_bytes": None,
               "thumb_md5": "", "error": None}
        try:
            thumb = encode_ppm(resize_nearest(decode_image(m["payload"]), 32, 32))
            row.update(
                thumb_bytes=len(thumb),
                thumb_md5=hashlib.md5(thumb).hexdigest(),
            )
        except Exception as e:  # noqa: BLE001 — mirrors O23 containment
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("media_id", pa.int64()),
                ("thumb_bytes", pa.int64()),
                ("thumb_md5", pa.string()),
                ("error", pa.string()),
            ]
        ),
    )


def expected_media_phash() -> pa.Table:
    """Independent dHash recompute: decode via the library decoder, but
    the resize / luma / gradient-sign / bit-packing pipeline is inlined
    here (NOT a call to operators.multimodal.dhash64), so a bug in
    either side fails the gate."""
    from pdf_extractor_spark.operators.multimodal import decode_image

    tbl = pq.read_table(REPO / "fixtures" / "media_phash_micro.parquet")
    rows = []
    for m in tbl.to_pylist():
        row = {"media_id": m["media_id"], "phash": None, "error": None}
        try:
            img = decode_image(m["payload"])
            h, w, _ = img.shape
            rs = (np.arange(8) * h // 8).clip(0, h - 1)
            cs = (np.arange(9) * w // 9).clip(0, w - 1)
            small = img[rs[:, None], cs[None, :], :].astype(np.float64)
            luma = (
                0.299 * small[:, :, 0]
                + 0.587 * small[:, :, 1]
                + 0.114 * small[:, :, 2]
            )
            v = 0
            for y in range(8):
                for x in range(8):
                    if luma[y, x] > luma[y, x + 1]:
                        v |= 1 << (8 * y + x)
            row["phash"] = v - (1 << 64) if v >= 1 << 63 else v
        except Exception as e:  # noqa: BLE001 — mirrors O23 containment
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("media_id", pa.int64()),
                ("phash", pa.int64()),
                ("error", pa.string()),
            ]
        ),
    )


def expected_media_audiofp() -> pa.Table:
    """Independent audio-fingerprint recompute: decode via the library
    WAV decoder, but the mono-mix / windowed-energy / sign-of-delta /
    bit-packing pipeline is inlined here (NOT a call to
    operators.multimodal.audiofp64), so a bug in either side fails the
    gate."""
    from pdf_extractor_spark.operators.multimodal import decode_wav

    tbl = pq.read_table(REPO / "fixtures" / "media_audiofp_micro.parquet")
    rows = []
    for m in tbl.to_pylist():
        row = {"media_id": m["media_id"], "afp": None, "error": None}
        try:
            samples, _rate = decode_wav(m["payload"])
            mono = samples.astype(np.float64).mean(axis=1)
            n = mono.shape[0]
            if n < 65:
                raise ValueError(
                    f"audio too short for fingerprint: {n} samples"
                )
            sq = mono * mono
            e = []
            for i in range(65):
                lo, hi = (i * n) // 65, ((i + 1) * n) // 65
                e.append(float(np.mean(sq[lo:hi])))
            v = 0
            for i in range(64):
                if e[i] > e[i + 1]:
                    v |= 1 << i
            row["afp"] = v - (1 << 64) if v >= 1 << 63 else v
        except Exception as e:  # noqa: BLE001 — mirrors O23 containment
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("media_id", pa.int64()),
                ("afp", pa.int64()),
                ("error", pa.string()),
            ]
        ),
    )


def expected_media_vhash() -> pa.Table:
    """Independent frame-hash recompute: decode via the library RAWV
    demuxer + PPM decoder, but the sample / resize / luma / gradient /
    bit-packing pipeline is inlined here (NOT a call to dhash64), one
    row per SAMPLED frame (every VHASH_EVERY_K-th)."""
    from pdf_extractor_spark.operators.multimodal import (
        VHASH_EVERY_K,
        decode_ppm,
        decode_rawv,
    )

    tbl = pq.read_table(REPO / "fixtures" / "media_vhash_micro.parquet")
    rows = []
    for m in tbl.to_pylist():
        try:
            frames = decode_rawv(m["payload"])[::VHASH_EVERY_K]
            for ordn, fpayload in enumerate(frames):
                img = decode_ppm(fpayload)
                h, w, _ = img.shape
                rs = (np.arange(8) * h // 8).clip(0, h - 1)
                cs = (np.arange(9) * w // 9).clip(0, w - 1)
                small = img[rs[:, None], cs[None, :], :].astype(np.float64)
                luma = (
                    0.299 * small[:, :, 0]
                    + 0.587 * small[:, :, 1]
                    + 0.114 * small[:, :, 2]
                )
                v = 0
                for y in range(8):
                    for x in range(8):
                        if luma[y, x] > luma[y, x + 1]:
                            v |= 1 << (8 * y + x)
                rows.append(
                    {
                        "media_id": m["media_id"],
                        "frame_ord": ordn,
                        "fhash": v - (1 << 64) if v >= 1 << 63 else v,
                        "error": None,
                    }
                )
            if not frames:
                # a VALID zero-frame clip still gets one all-null row —
                # the operator's posexplode_outer emits exactly that, and
                # the clip must stay visible in the parity gate (the
                # error-row discipline, minus the error)
                rows.append(
                    {
                        "media_id": m["media_id"],
                        "frame_ord": None,
                        "fhash": None,
                        "error": None,
                    }
                )
        except Exception as e:  # noqa: BLE001 — mirrors O23 containment
            rows.append(
                {
                    "media_id": m["media_id"],
                    "frame_ord": None,
                    "fhash": None,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("media_id", pa.int64()),
                ("frame_ord", pa.int64()),
                ("fhash", pa.int64()),
                ("error", pa.string()),
            ]
        ),
    )


def expected_extract_image_pairs() -> pa.Table:
    """Raw (url, seq, src, alt, caption, caption_src) image-caption
    pairs of the figure-rich corpus (fixtures/figpages_micro.parquet),
    computed by the pure-Python collector — the gate value-compares the
    Spark Arrow-batch stage against a non-Spark execution."""
    from pdf_extractor_spark.ref_extractor.images import collect_images

    pages = pq.read_table(
        REPO / "fixtures" / "figpages_micro.parquet"
    ).to_pylist()
    rows = []
    for p in pages:
        for seq, src, alt, caption, csrc in collect_images(p["html"]):
            rows.append(
                {
                    "url": p["url"],
                    "seq": seq,
                    "src": src,
                    "alt": alt,
                    "caption": caption,
                    "caption_src": csrc,
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("seq", pa.int64()),
                ("src", pa.string()),
                ("alt", pa.string()),
                ("caption", pa.string()),
                ("caption_src", pa.string()),
            ]
        ),
    )


BUILDERS = {
    "extract_pages": expected_extract_pages,
    "extract_first_block": expected_extract_first_block,
    "extract_links": expected_extract_links,
    "link_graph_links": expected_link_graph_links,
    "media_image_features": expected_media_image_features,
    "media_audio_features": expected_media_audio_features,
    "media_frame_sample": expected_media_frame_sample,
    "text_compress_ratio": expected_text_compress_ratio,
    "warc_cdx_index": expected_warc_cdx_index,
    "media_image_resize": expected_media_image_resize,
    "media_phash": expected_media_phash,
    "media_audiofp": expected_media_audiofp,
    "media_vhash": expected_media_vhash,
    "extract_image_pairs": expected_extract_image_pairs,
}


def main() -> None:
    EXPECTED.mkdir(parents=True, exist_ok=True)
    for name, fn in BUILDERS.items():
        tbl = fn()
        pq.write_table(tbl, EXPECTED / f"{name}.parquet")
        print(f"wrote {name}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
