"""Deterministic synthetic media corpus for the multimodal operators.

Images are gradient/noise PPM P6, audio is sine-wave WAV PCM16, video is
RAWV (frame-concatenated PPM). A few rows are deliberately corrupt or in
an unsupported format to exercise the per-row error column (O23).
"""

from __future__ import annotations

import io
import pathlib
import struct
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_spark.operators.multimodal import encode_ppm, encode_rawv

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field(
            "meta", pa.struct([pa.field("declared_codec", pa.string())])
        ),
    ]
)


def make_image(rng: np.random.Generator, w: int, h: int) -> bytes:
    x = np.linspace(0, 255, w, dtype=np.float64)
    y = np.linspace(0, 255, h, dtype=np.float64)
    r = np.tile(x, (h, 1))
    g = np.tile(y[:, None], (1, w))
    b = rng.integers(0, 256, size=(h, w), dtype=np.uint8).astype(np.float64)
    img = np.stack([r, g, b], axis=2).astype(np.uint8)
    return encode_ppm(img)


def make_wav(rng: np.random.Generator, rate: int, ms: int, ch: int) -> bytes:
    n = rate * ms // 1000
    t = np.arange(n, dtype=np.float64) / rate
    freq = float(rng.integers(100, 2000))
    sig = 0.5 * np.sin(2 * np.pi * freq * t)
    pcm = (sig * 32767).astype("<i2")
    if ch == 2:
        pcm = np.column_stack([pcm, pcm]).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_video(rng: np.random.Generator, n_frames: int, w: int, h: int) -> bytes:
    frames = []
    for k in range(n_frames):
        shade = (k * 255 // max(1, n_frames - 1)) if n_frames > 1 else 0
        frames.append(np.full((h, w, 3), shade, dtype=np.uint8))
    return encode_rawv(frames)


def generate_media(seed: int, n_per_kind: int = 16) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "url", "kind", "payload", "meta")}
    mid = 0

    def add(kind: str, payload: bytes, codec: str) -> None:
        nonlocal mid
        rows["media_id"].append(mid)
        rows["url"].append(f"https://media.example/{kind}/{mid:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["meta"].append({"declared_codec": codec})
        mid += 1

    for _ in range(n_per_kind):
        w, h = int(rng.integers(16, 128)), int(rng.integers(16, 128))
        add("image", make_image(rng, w, h), "ppm")
    for _ in range(n_per_kind):
        rate = int(rng.choice([8000, 16000, 44100]))
        ms = int(rng.integers(50, 400))
        add("audio", make_wav(rng, rate, ms, int(rng.choice([1, 2]))), "wav")
    for _ in range(n_per_kind):
        add(
            "video",
            make_video(rng, int(rng.integers(4, 24)), 32, 24),
            "rawv",
        )
    # error rows: truncated PPM, unsupported format, empty payload
    add("image", b"P6\n64 64\n255\n\x00\x01", "ppm")
    add("image", b"\x89PNG\r\n\x1a\nnotreally", "png")
    add("audio", b"", "wav")
    return pa.table(rows, schema=MEDIA_SCHEMA)


def write_media_parquet(out_path: str | pathlib.Path, seed: int = 42) -> int:
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tbl = generate_media(seed)
    pq.write_table(tbl, out_path, compression="zstd")
    return tbl.num_rows
