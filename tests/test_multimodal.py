"""Multimodal operators: decode correctness (vs direct numpy computation),
Spark plumbing (schema, batching, error containment O23)."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extractor_spark.corpus.media import (
    generate_media,
    make_image,
    make_video,
    make_wav,
)
from pdf_extractor_spark.operators import multimodal as mm


# --- pure decoder units -----------------------------------------------------


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    out = mm.decode_ppm(mm.encode_ppm(img))
    assert out.shape == (20, 30, 3)
    assert np.array_equal(out, img)


def test_ppm_rejects_truncated():
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P6\n64 64\n255\n\x00")


def test_resize_nearest_shape_and_corners():
    img = np.zeros((100, 200, 3), dtype=np.uint8)
    img[0, 0] = [1, 2, 3]
    img[99, 199] = [9, 8, 7]
    small = mm.resize_nearest(img, 20, 10)
    assert small.shape == (10, 20, 3)
    assert list(small[0, 0]) == [1, 2, 3]


def test_wav_roundtrip_features():
    rng = np.random.default_rng(3)
    payload = make_wav(rng, 16000, 250, 2)
    samples, rate = mm.decode_wav(payload)
    assert rate == 16000
    assert samples.shape == (4000, 2)
    # sine at 0.5 amplitude → rms ≈ 0.3535
    rms = float(np.sqrt(np.mean(np.square(samples))))
    assert abs(rms - 0.3535) < 0.01


def test_rawv_demux():
    payload = make_video(np.random.default_rng(1), 10, 8, 6)
    frames = mm.decode_rawv(payload)
    assert len(frames) == 10
    img0 = mm.decode_ppm(frames[0])
    assert img0.shape == (6, 8, 3)
    assert img0.max() == 0  # first frame is black
    assert mm.decode_ppm(frames[-1]).min() == 255  # last frame is white


# --- Spark operators --------------------------------------------------------


@pytest.fixture(scope="module")
def media_df(spark):
    import pyarrow.parquet  # noqa: F401

    tbl = generate_media(seed=42)
    return spark.createDataFrame(tbl.to_pandas())


def test_image_features_match_numpy(spark, media_df):
    imgs = media_df.filter("kind = 'image'")
    got = {
        r.media_id: r
        for r in mm.image_features(imgs).collect()
    }
    rng = np.random.default_rng(42)
    # regenerate the first image deterministically and cross-check
    w, h = int(rng.integers(16, 128)), int(rng.integers(16, 128))
    payload = make_image(rng, w, h)
    img = mm.decode_ppm(payload).astype(np.float64)
    luma = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    r0 = got[0]
    assert (r0.width, r0.height, r0.channels) == (w, h, 3)
    assert abs(r0.mean_luma - float(luma.mean())) < 1e-6
    assert r0.error is None


def test_image_features_error_rows(spark, media_df):
    rows = mm.image_features(media_df.filter("kind = 'image'")).collect()
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 2  # truncated PPM + PNG (no decoder offline)
    assert all(r.width is None for r in errs)


def test_resize_images(spark, media_df):
    rows = mm.resize_images(
        media_df.filter("kind = 'image' AND media_id < 16"), 16, 12
    ).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.error is None
        thumb = mm.decode_ppm(bytes(r.thumb))
        assert thumb.shape == (12, 16, 3)


def test_audio_features(spark, media_df):
    rows = mm.audio_features(media_df.filter("kind = 'audio'")).collect()
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(bad) == 1  # the empty payload
    for r in ok:
        assert r.sample_rate in (8000, 16000, 44100)
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate
        assert 0.3 < r.rms < 0.4  # 0.5-amplitude sine


def test_sample_frames(spark, media_df):
    rows = mm.sample_frames(
        media_df.filter("kind = 'video'"), every_k=4
    ).collect()
    assert rows and all(r.error is None for r in rows)
    for r in rows:
        assert len(r.sampled) == (r.n_frames + 3) // 4
        first = mm.decode_ppm(bytes(r.sampled[0]))
        assert first.shape == (24, 32, 3)
