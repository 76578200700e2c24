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


# ---------------------------------------------------------------------------
# Perceptual-hash dedup fixture: images with PLANTED near-duplicates.
#
# Each base image is a random 9x8 luma "pattern" whose horizontally
# adjacent cells differ by >= PHASH_MARGIN — so its dHash (the 8x8 grid
# of left>right comparisons after a nearest-neighbor resize to 9x8) is
# a deterministic function of the pattern with a wide noise margin.
# Upscaling by PHASH_SCALE with np.kron keeps nearest-neighbor resample
# points exactly on cell corners, so the dHash of the ENCODED image
# equals the dHash of the pattern by construction.
#
# Planted structure per base (the near-dup classes a LAION-style image
# dedup must catch, and the controls it must not):
#   - a BRIGHTNESS twin: +10 luma everywhere (values kept in [12, 243])
#     -> every comparison unchanged -> hamming 0, but different bytes —
#     the pair an exact md5 dedup misses and phash catches;
#   - a TWEAK twin: k pattern cells' comparisons deliberately flipped
#     -> hamming EXACTLY k (k in {2, 5}, both <= HAM_MAX);
#   - independent patterns as negatives (expected hamming ~32);
#   - one corrupt payload (error row, O23 containment).

PHASH_W, PHASH_H = 9, 8
PHASH_MARGIN = 48
PHASH_SCALE = 4


def _phash_pattern(rng: np.random.Generator) -> np.ndarray:
    """9x8 luma grid with adjacent-column differences >= PHASH_MARGIN,
    values in [12, 243] (headroom for the +10 brightness twin)."""
    pat = np.zeros((PHASH_H, PHASH_W), dtype=np.int64)
    for y in range(PHASH_H):
        v = int(rng.integers(12, 244))
        pat[y, 0] = v
        for x in range(1, PHASH_W):
            lo, hi = 12, 243
            up = rng.integers(0, 2) == 1
            if up and v + PHASH_MARGIN <= hi:
                v = int(rng.integers(v + PHASH_MARGIN, hi + 1))
            elif v - PHASH_MARGIN >= lo:
                v = int(rng.integers(lo, v - PHASH_MARGIN + 1))
            else:
                v = int(rng.integers(v + PHASH_MARGIN, hi + 1))
            pat[y, x] = v
    return pat


def _pattern_image(pat: np.ndarray) -> bytes:
    gray = np.kron(pat, np.ones((PHASH_SCALE, PHASH_SCALE), dtype=np.int64))
    img = np.stack([gray, gray, gray], axis=2).astype(np.uint8)
    return encode_ppm(img)


def _flip_cells(pat: np.ndarray, rng: np.random.Generator, k: int) -> np.ndarray:
    """Flip EXACTLY k of the 8x8 left>right comparisons. Only the edge
    cells participate in a single comparison (cell 0 in comparison 0,
    cell 8 in comparison 7) — moving one to the other side of its
    neighbour (margin kept) flips that one bit and no other. Interior
    cells sit in two comparisons, so a swap there perturbs 1-3 bits."""
    out = pat.copy()
    flipped = 0
    flip_margin = 8  # far above float-luma epsilon; wide range headroom
    cands = [(y, x) for y in range(PHASH_H) for x in (0, PHASH_W - 1)]
    for i in rng.permutation(len(cands)):
        if flipped == k:
            break
        y, x = cands[i]
        nb = 1 if x == 0 else PHASH_W - 2
        n = out[y, nb]
        new = n + flip_margin if out[y, x] < n else n - flip_margin
        if 12 <= new <= 243:
            out[y, x] = new
            flipped += 1
    if flipped != k:
        raise AssertionError(f"could only flip {flipped} of {k}")
    return out


def generate_phash_media(seed: int = 9, n_base: int = 24) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "url", "kind", "payload", "meta")}
    mid = 0

    def add(payload: bytes) -> None:
        nonlocal mid
        rows["media_id"].append(mid)
        rows["url"].append(f"https://media.example/phash/{mid:06d}")
        rows["kind"].append("image")
        rows["payload"].append(payload)
        rows["meta"].append({"declared_codec": "ppm"})
        mid += 1

    for i in range(n_base):
        pat = _phash_pattern(rng)
        add(_pattern_image(pat))
        if i % 3 == 0:  # brightness twin: hamming 0, different bytes
            add(_pattern_image(pat + 10))
        elif i % 3 == 1:  # tweak twin: hamming exactly 2 or 5
            k = 2 if i % 2 == 1 else 5
            add(_pattern_image(_flip_cells(pat, rng, k)))
        # i % 3 == 2 -> singleton (negative)
    add(b"P6\n16 16\n255\n\x00")  # corrupt: error row
    return pa.table(rows, schema=MEDIA_SCHEMA)


def write_phash_media_parquet(
    out_path: str | pathlib.Path, seed: int = 9
) -> int:
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tbl = generate_phash_media(seed)
    pq.write_table(tbl, out_path, compression="zstd")
    return tbl.num_rows


# ---------------------------------------------------------------------------
# Audio-fingerprint dedup fixture: WAVs with PLANTED near-duplicates —
# the audio analog of the phash fixture above.
#
# Each base signal is a 65-window amplitude "pattern" (adjacent windows
# differ by >= AUDIOFP_MARGIN pattern units) rendered as alternating
# +A/-A PCM16 samples, AUDIOFP_WIN samples per window — so every
# window's mean energy is EXACTLY (a * AUDIOFP_AMP / 32768)^2 (all
# values exact in float64: int16 / 2^15 is exact, squares < 2^53, means
# over 64 identical values exact) and the energy-dHash of the encoded
# WAV equals the comparison vector of the pattern by construction.
#
# Planted structure per base (the near-dup classes an audio dedup must
# catch, and the controls it must not):
#   - a GAIN twin: every sample halved (amp scale 64 -> 32, exact in
#     int16) -> every energy scales by exactly 1/4 -> every comparison
#     unchanged -> hamming 0, but different bytes — the pair an exact
#     md5 dedup misses;
#   - a STEREO-UPMIX twin: the identical signal duplicated into two
#     channels -> the mono mix is bit-identical -> hamming 0, with a
#     different header AND different payload length;
#   - a TWEAK twin: exactly k window-energy comparisons deliberately
#     flipped -> hamming EXACTLY k (k in {2, 5}, both <= the band-join
#     radius);
#   - independent patterns as negatives (expected hamming ~32);
#   - two error rows (O23): an empty payload (decode failure) and a
#     valid-but-too-short WAV (fingerprint precondition failure).

AUDIOFP_WINDOWS = 65
AUDIOFP_WIN = 64  # PCM samples per window
AUDIOFP_MARGIN = 6  # min adjacent amplitude gap, pattern units
AUDIOFP_AMP = 64  # pattern unit -> PCM16 amplitude (gain twin uses 32)
AUDIOFP_RATE = 8000


def _audiofp_pattern(rng: np.random.Generator) -> np.ndarray:
    """65 window amplitudes in [12, 243] with adjacent differences
    >= AUDIOFP_MARGIN (energy is monotone in amplitude, so the energy
    comparison vector is the amplitude comparison vector)."""
    pat = np.zeros(AUDIOFP_WINDOWS, dtype=np.int64)
    v = int(rng.integers(12, 244))
    pat[0] = v
    for i in range(1, AUDIOFP_WINDOWS):
        lo, hi = 12, 243
        up = rng.integers(0, 2) == 1
        if up and v + AUDIOFP_MARGIN <= hi:
            v = int(rng.integers(v + AUDIOFP_MARGIN, hi + 1))
        elif v - AUDIOFP_MARGIN >= lo:
            v = int(rng.integers(lo, v - AUDIOFP_MARGIN + 1))
        else:
            v = int(rng.integers(v + AUDIOFP_MARGIN, hi + 1))
        pat[i] = v
    return pat


def _flip_audio_comparisons(
    pat: np.ndarray, rng: np.random.Generator, k: int
) -> np.ndarray:
    """Flip EXACTLY k of the 64 adjacent-window comparisons by moving
    one endpoint window of each chosen comparison to the other side of
    its counterpart while PRESERVING that window's other comparison
    (when one exists) — the 1-D analog of the image _flip_cells."""
    out = pat.copy()
    m = 8  # safety margin for the moved value
    flipped: set[int] = set()
    for ci in rng.permutation(AUDIOFP_WINDOWS - 1):
        if len(flipped) == k:
            break
        ci = int(ci)
        if ci in flipped:
            continue
        done = False
        for j in (ci, ci + 1):  # the window we try to move
            other = out[ci + 1] if j == ci else out[ci]
            # flip constraint: new value crosses `other`
            if out[j] > other:
                f_lo, f_hi = 12, int(other) - m
            else:
                f_lo, f_hi = int(other) + m, 243
            # preserve constraint: stay on the same side of j's OTHER
            # neighbour (j+1 if j is the right endpoint, j-1 if left)
            nb = j + 1 if j == ci + 1 else j - 1
            if 0 <= nb < AUDIOFP_WINDOWS:
                nv = int(out[nb])
                if out[j] > nv:
                    f_lo = max(f_lo, nv + m)
                else:
                    f_hi = min(f_hi, nv - m)
            if f_lo <= f_hi:
                out[j] = int(rng.integers(f_lo, f_hi + 1))
                flipped.add(ci)
                done = True
                break
        if done:
            continue
    if len(flipped) != k:
        raise AssertionError(f"could only flip {len(flipped)} of {k}")
    return out


def _pattern_wav(pat: np.ndarray, amp_scale: int = AUDIOFP_AMP, ch: int = 1) -> bytes:
    """Render the amplitude pattern as PCM16 WAV: AUDIOFP_WIN samples
    per window alternating +a/-a (window mean energy exactly a^2)."""
    amps = np.repeat(pat * amp_scale, AUDIOFP_WIN).astype(np.int64)
    signs = np.tile(
        np.array([1, -1], dtype=np.int64), amps.shape[0] // 2 + 1
    )[: amps.shape[0]]
    pcm = (amps * signs).astype("<i2")
    if ch == 2:
        pcm = np.column_stack([pcm, pcm]).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(AUDIOFP_RATE)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def generate_audiofp_media(seed: int = 11, n_base: int = 24) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "url", "kind", "payload", "meta")}
    mid = 0

    def add(payload: bytes) -> None:
        nonlocal mid
        rows["media_id"].append(mid)
        rows["url"].append(f"https://media.example/audiofp/{mid:06d}")
        rows["kind"].append("audio")
        rows["payload"].append(payload)
        rows["meta"].append({"declared_codec": "wav"})
        mid += 1

    for i in range(n_base):
        pat = _audiofp_pattern(rng)
        add(_pattern_wav(pat))
        if i % 4 == 0:  # gain twin: hamming 0, different bytes
            add(_pattern_wav(pat, amp_scale=AUDIOFP_AMP // 2))
        elif i % 4 == 1:  # stereo-upmix twin: hamming 0, longer payload
            add(_pattern_wav(pat, ch=2))
        elif i % 4 == 2:  # tweak twin: hamming exactly 2 or 5
            # i % 4 == 2 makes i always even — alternate on i // 4 so
            # both radii actually get planted (3 twins each)
            k = 2 if (i // 4) % 2 == 0 else 5
            add(_pattern_wav(_flip_audio_comparisons(pat, rng, k)))
        # i % 4 == 3 -> singleton (negative)
    add(b"")  # decode failure -> error row
    # valid WAV, 30 samples < AUDIOFP_WINDOWS -> precondition error row
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(AUDIOFP_RATE)
        wf.writeframes((np.arange(30, dtype="<i2") * 100).tobytes())
    add(buf.getvalue())
    return pa.table(rows, schema=MEDIA_SCHEMA)


def write_audiofp_media_parquet(
    out_path: str | pathlib.Path, seed: int = 11
) -> int:
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tbl = generate_audiofp_media(seed)
    pq.write_table(tbl, out_path, compression="zstd")
    return tbl.num_rows


# ---------------------------------------------------------------------------
# Video-fingerprint dedup fixture: RAWV clips with PLANTED near-dups —
# the video analog of the phash fixture, built from the SAME pattern
# frames (each frame is a _phash_pattern image, so every sampled
# frame's dHash equals its pattern's comparison grid by construction).
#
# Planted structure per base (the near-dup classes a frame-sampled
# video dedup must catch, and the controls it must not):
#   - a BRIGHTNESS twin: +10 luma on every frame -> every sampled
#     frame at hamming 0, but different bytes;
#   - a TWEAK twin: ONE sampled frame's dHash flipped by exactly 5
#     bits -> pair kept with max_hamming 5;
#   - a TRUNCATED twin: the first VHASH_TRUNC frames only -> the
#     sampled prefix aligns frame-for-frame at hamming 0 (the
#     "same video, cut short" re-encode class);
#   - a POISONED control: ONE sampled frame flipped by 9 bits
#     (> the band-join radius) -> the other frames still band-collide,
#     but the all-overlapping-frames verify must REJECT the pair;
#   - a single-frame clip + its brightness twin: hamming 0 on the one
#     frame, but below the minimum-overlap bar -> must NOT pair;
#   - independent clips as negatives; one corrupt payload (O23).

VHASH_FRAMES = 8  # frames per base clip
VHASH_TRUNC = 6  # truncated-twin frame count
VHASH_LEAD_CUT = 2  # leading-truncated-twin frames dropped (1 sample step)


def _pattern_video(pats: list[np.ndarray], bright: int = 0) -> bytes:
    from pdf_extractor_spark.operators.multimodal import decode_ppm

    frames = [decode_ppm(_pattern_image(p + bright)) for p in pats]
    return encode_rawv(frames)


def generate_vhash_media(seed: int = 13, n_base: int = 12) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "url", "kind", "payload", "meta")}
    mid = 0

    def add(payload: bytes) -> None:
        nonlocal mid
        rows["media_id"].append(mid)
        rows["url"].append(f"https://media.example/vhash/{mid:06d}")
        rows["kind"].append("video")
        rows["payload"].append(payload)
        rows["meta"].append({"declared_codec": "rawv"})
        mid += 1

    for i in range(n_base):
        pats = [_phash_pattern(rng) for _ in range(VHASH_FRAMES)]
        add(_pattern_video(pats))
        if i % 4 == 0:  # brightness twin: all frames hamming 0
            add(_pattern_video(pats, bright=10))
        elif i % 4 == 1:  # tweak twin: sampled frame 2 at hamming 5
            tw = list(pats)
            tw[2] = _flip_cells(pats[2], rng, 5)
            add(_pattern_video(tw))
        elif i % 4 == 2:  # truncated twin: aligned prefix, hamming 0
            add(_pattern_video(pats[:VHASH_TRUNC]))
        else:  # poisoned control: one frame past the radius -> NO pair
            tw = list(pats)
            tw[0] = _flip_cells(pats[0], rng, 9)
            add(_pattern_video(tw))
    # single-frame clip + brightness twin: hamming 0 but overlap 1 -> no pair
    single = [_phash_pattern(rng)]
    add(_pattern_video(single))
    add(_pattern_video(single, bright=10))
    add(b"RAWVxxxx")  # corrupt: error row
    # LEADING-truncated twins (intro cut): first VHASH_LEAD_CUT frames
    # dropped, so sampled ords shift by VHASH_LEAD_CUT/VHASH_EVERY_K —
    # INVISIBLE to the aligned pass (ord-equal frames are independent
    # patterns), found by the offset pass at d = -1
    for _ in range(3):
        pats = [_phash_pattern(rng) for _ in range(VHASH_FRAMES)]
        add(_pattern_video(pats))
        add(_pattern_video(pats[VHASH_LEAD_CUT:]))
    return pa.table(rows, schema=MEDIA_SCHEMA)


def write_vhash_media_parquet(
    out_path: str | pathlib.Path, seed: int = 13
) -> int:
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tbl = generate_vhash_media(seed)
    pq.write_table(tbl, out_path, compression="zstd")
    return tbl.num_rows
