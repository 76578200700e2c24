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


# --- perceptual hash (dHash) + banded near-dup join -------------------------


def _phash_fixture_path():
    import pathlib

    return (
        pathlib.Path(mm.__file__).resolve().parent.parent.parent
        / "fixtures"
        / "media_phash_micro.parquet"
    )


def test_phash_fixture_matches_generator_spec():
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.media import generate_phash_media

    committed = pq.read_table(_phash_fixture_path())
    assert committed.equals(generate_phash_media())


def test_dhash_brightness_invariant_and_bit_exact():
    """A +10 luma shift never moves a comparison; a single flipped edge
    comparison moves exactly one bit."""
    rng = np.random.default_rng(3)
    from pdf_extractor_spark.corpus.media import (
        _flip_cells,
        _pattern_image,
        _phash_pattern,
    )

    pat = _phash_pattern(rng)
    base = mm.dhash64(mm.decode_ppm(_pattern_image(pat)))
    bright = mm.dhash64(mm.decode_ppm(_pattern_image(pat + 10)))
    assert base == bright
    for k in (1, 2, 5, 7):
        tweak = mm.dhash64(
            mm.decode_ppm(_pattern_image(_flip_cells(pat, rng, k)))
        )
        assert bin((base ^ tweak) & (2**64 - 1)).count("1") == k


def test_phash_pairs_planted_structure(spark):
    """The banded join recovers EXACTLY the brute-force hamming<=7 pair
    set: the 8 brightness twins at hamming 0 (different payload bytes —
    the pair an exact md5 dedup misses), 4 tweak twins at exactly 2 and
    4 at exactly 5; nearest negative pair is 17 bits away."""
    import hashlib

    import pyarrow.parquet as pq

    media = spark.read.parquet(str(_phash_fixture_path()))
    ph = mm.image_phash(media)
    rows = {r["media_id"]: r["phash"] for r in ph.collect()
            if r["error"] is None}
    brute = {}
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((rows[a] ^ rows[b]) & (2**64 - 1)).count("1")
            if h <= mm.HAM_MAX:
                brute[(a, b)] = h
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.phash_pairs_of(ph).collect()
    }
    assert got == brute
    from collections import Counter

    assert Counter(got.values()) == {0: 8, 2: 4, 5: 4}

    # brightness twins: hamming 0 but different bytes (md5 differs)
    payloads = {
        m["media_id"]: m["payload"]
        for m in pq.read_table(_phash_fixture_path()).to_pylist()
    }
    for (a, b), h in got.items():
        if h == 0:
            assert (
                hashlib.md5(payloads[a]).digest()
                != hashlib.md5(payloads[b]).digest()
            )


def test_phash_pairs_radius_guard_and_edge(spark):
    """ham_max >= PHASH_BANDS loses the pigeonhole guarantee -> raises;
    a crafted pair at hamming exactly HAM_MAX is found, at HAM_MAX+1 is
    not."""
    with pytest.raises(ValueError):
        mm.phash_pairs_of(None, ham_max=mm.PHASH_BANDS)

    # 7 bits spread across 7 bands (band 7 shared) vs 8 bits in 8 bands
    seven = sum(1 << (8 * b) for b in range(7))
    eight = sum(1 << (8 * b) for b in range(8))
    df = spark.createDataFrame(
        [(0, 0, None), (1, seven, None), (2, eight, None)],
        "media_id LONG, phash LONG, error STRING",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in mm.phash_pairs_of(df).collect()}
    assert got == {(0, 1): 7, (1, 2): 1}  # (0,2) at hamming 8: excluded


def test_phash_plan_payload_never_shuffles(spark):
    """Only (ids, 8-byte hash, band) ever reach an Exchange — the
    binary payload stays inside the Arrow-batch scan stage."""
    from pdf_extractor_spark.queries import CATALOG
    from tests.test_plans import plan_of

    plan = plan_of(CATALOG["media_phash_pairs"].fn(spark, "unused"))
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "payload" not in head, head


def test_phash_clusters_keep_one_per_cluster(spark):
    """Exactly one keeper per cluster (the minimum media_id); the kept
    set contains NO hamming<=HAM_MAX pair; twins join their base's
    cluster; singletons keep themselves."""
    from collections import Counter

    from pdf_extractor_spark.queries import CATALOG

    rows = CATALOG["media_phash_clusters"].fn(spark, "unused").collect()
    assert len(rows) == 40  # 41 fixture rows minus the corrupt payload
    by_cluster = Counter(r["cluster_id"] for r in rows)
    keepers = [r for r in rows if r["keep"] == 1]
    assert len(keepers) == len(by_cluster)
    assert all(r["media_id"] == r["cluster_id"] for r in keepers)

    # kept set is pair-free under the banded join
    media = spark.read.parquet(str(_phash_fixture_path()))
    ph = mm.image_phash(media)
    kept_ids = {r["media_id"] for r in keepers}
    pairs = [
        (r["id_a"], r["id_b"]) for r in mm.phash_pairs_of(ph).collect()
    ]
    assert pairs and not [
        p for p in pairs if p[0] in kept_ids and p[1] in kept_ids
    ]
    # every pair co-clusters
    cl = {r["media_id"]: r["cluster_id"] for r in rows}
    assert all(cl[a] == cl[b] for a, b in pairs)


def test_phash_bucket_cap_never_binds_on_fixture_and_bounds_blowup(spark):
    """The cap is headroom on the fixture (max band-bucket occupancy
    far below PHASH_BUCKET_CAP, so the brute-force oracle equality in
    the tests above is the UNCAPPED semantics); on an
    identical-image flood the cap drops the hot buckets loudly-
    boundedly instead of going quadratic."""
    media = spark.read.parquet(str(_phash_fixture_path()))
    ph = mm.image_phash(media)
    from pyspark.sql import functions as F

    occ = (
        ph.filter(F.col("error").isNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("b"),
                            F.expr(
                                f"CAST(shiftrightunsigned(phash, {8 * b})"
                                " & 255 AS INT)"
                            ).alias("v"),
                        )
                        for b in range(mm.PHASH_BANDS)
                    ]
                )
            ).alias("band")
        )
        .groupBy("band")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert occ <= 16 < mm.PHASH_BUCKET_CAP

    # flood: one hash repeated past the cap -> zero pairs (dropped hot
    # buckets), not C(n,2) candidates
    n = mm.PHASH_BUCKET_CAP + 8
    flood = spark.createDataFrame(
        [(i, 12345, None) for i in range(n)],
        "media_id LONG, phash LONG, error STRING",
    )
    assert mm.phash_pairs_of(flood).count() == 0


# --- audio fingerprint (energy dHash) + banded near-dup join ----------------


def _audiofp_fixture_path():
    import pathlib

    return (
        pathlib.Path(mm.__file__).resolve().parent.parent.parent
        / "fixtures"
        / "media_audiofp_micro.parquet"
    )


def test_audiofp_fixture_matches_generator_spec():
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.media import generate_audiofp_media

    committed = pq.read_table(_audiofp_fixture_path())
    assert committed.equals(generate_audiofp_media())


def test_audiofp_gain_stereo_invariant_and_bit_exact():
    """Halving every sample never moves an energy comparison (gain
    invariance); a stereo upmix of the same signal mono-mixes back
    bit-identically (layout invariance); flipping exactly k window
    comparisons moves exactly k bits."""
    rng = np.random.default_rng(5)
    from pdf_extractor_spark.corpus.media import (
        AUDIOFP_AMP,
        _audiofp_pattern,
        _flip_audio_comparisons,
        _pattern_wav,
    )

    def fp(payload):
        samples, _ = mm.decode_wav(payload)
        return mm.audiofp64(samples)

    pat = _audiofp_pattern(rng)
    base = fp(_pattern_wav(pat))
    assert base == fp(_pattern_wav(pat, amp_scale=AUDIOFP_AMP // 2))
    assert base == fp(_pattern_wav(pat, ch=2))
    for k in (1, 2, 5, 7):
        tweak = fp(_pattern_wav(_flip_audio_comparisons(pat, rng, k)))
        assert bin((base ^ tweak) & (2**64 - 1)).count("1") == k


def test_audiofp_pairs_planted_structure(spark):
    """The banded join recovers EXACTLY the brute-force hamming<=7 pair
    set: 12 hamming-0 twins (6 half-gain — different bytes; 6 stereo
    upmix — different bytes AND different payload length: both
    invisible to md5 dedup), 3 tweak twins at exactly 2 and 3 at
    exactly 5; nearest negative pair is 19 bits away."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    media = spark.read.parquet(str(_audiofp_fixture_path()))
    afp = mm.audio_fingerprint(media)
    rows = {r["media_id"]: r["afp"] for r in afp.collect()
            if r["error"] is None}
    brute = {}
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((rows[a] ^ rows[b]) & (2**64 - 1)).count("1")
            if h <= mm.HAM_MAX:
                brute[(a, b)] = h
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.phash_pairs_of(
            afp.withColumnRenamed("afp", "phash")
        ).collect()
    }
    assert got == brute
    assert Counter(got.values()) == {0: 12, 2: 3, 5: 3}

    # hamming-0 twins: md5 always differs; the stereo twins also differ
    # in payload LENGTH (so even a length pre-filter wouldn't pair them)
    payloads = {
        m["media_id"]: m["payload"]
        for m in pq.read_table(_audiofp_fixture_path()).to_pylist()
    }
    lengths_differ = 0
    for (a, b), h in got.items():
        if h == 0:
            assert (
                hashlib.md5(payloads[a]).digest()
                != hashlib.md5(payloads[b]).digest()
            )
            lengths_differ += len(payloads[a]) != len(payloads[b])
    assert lengths_differ == 6  # the stereo-upmix twins


def test_audiofp_error_rows_contained(spark):
    """O23: the empty payload and the 30-sample WAV produce error rows
    (null fingerprint), never a failed task."""
    media = spark.read.parquet(str(_audiofp_fixture_path()))
    errs = {
        r["media_id"]: r["error"]
        for r in mm.audio_fingerprint(media).collect()
        if r["error"] is not None
    }
    assert set(errs) == {42, 43}
    assert "EOFError" in errs[42]
    assert "too short" in errs[43]


def test_audiofp_plan_payload_never_shuffles(spark):
    """Only (ids, 8-byte fingerprint, band) ever reach an Exchange —
    the PCM payload stays inside the Arrow-batch scan stage."""
    from pdf_extractor_spark.queries import CATALOG
    from tests.test_plans import plan_of

    plan = plan_of(CATALOG["media_audiofp_pairs"].fn(spark, "unused"))
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "payload" not in head, head


def test_audiofp_clusters_keep_one_per_cluster(spark):
    """Exactly one keeper per cluster (the minimum media_id); the kept
    set contains NO hamming<=HAM_MAX pair; every pair co-clusters."""
    from collections import Counter

    from pdf_extractor_spark.queries import CATALOG

    rows = CATALOG["media_audiofp_clusters"].fn(spark, "unused").collect()
    assert len(rows) == 42  # 44 fixture rows minus the two error rows
    by_cluster = Counter(r["cluster_id"] for r in rows)
    keepers = [r for r in rows if r["keep"] == 1]
    assert len(keepers) == len(by_cluster)
    assert all(r["media_id"] == r["cluster_id"] for r in keepers)

    media = spark.read.parquet(str(_audiofp_fixture_path()))
    afp = mm.audio_fingerprint(media).withColumnRenamed("afp", "phash")
    kept_ids = {r["media_id"] for r in keepers}
    pairs = [
        (r["id_a"], r["id_b"]) for r in mm.phash_pairs_of(afp).collect()
    ]
    assert pairs and not [
        p for p in pairs if p[0] in kept_ids and p[1] in kept_ids
    ]
    cl = {r["media_id"]: r["cluster_id"] for r in rows}
    assert all(cl[a] == cl[b] for a, b in pairs)


# --- video fingerprint (frame-sampled dHash) + aligned near-dup verify ------


def _vhash_fixture_path():
    import pathlib

    return (
        pathlib.Path(mm.__file__).resolve().parent.parent.parent
        / "fixtures"
        / "media_vhash_micro.parquet"
    )


def test_vhash_fixture_matches_generator_spec():
    import pyarrow.parquet as pq

    from pdf_extractor_spark.corpus.media import generate_vhash_media

    committed = pq.read_table(_vhash_fixture_path())
    assert committed.equals(generate_vhash_media())


def test_vhash_pairs_planted_structure(spark):
    """The banded-candidate + aligned-verify chain recovers EXACTLY the
    brute-force aligned pair set: 3 brightness twins (4 frames, max 0),
    3 one-frame tweak twins (4 frames, max 5), 3 truncated twins
    (3-frame prefix, max 0) — and REJECTS the 3 poisoned controls (one
    frame at 9 bits, even though their other frames band-collide at
    hamming 0) and the single-frame overlap pair."""
    from collections import Counter

    from pdf_extractor_spark.queries import CATALOG
    from pdf_extractor_spark.queries.catalog import _vhash_exploded

    vh = {
        (r["media_id"], r["frame_ord"]): r["fhash"]
        for r in _vhash_exploded(spark).collect()
        if r["error"] is None
    }
    by_clip = {}
    for (mid, ordn), fh in vh.items():
        by_clip.setdefault(mid, {})[ordn] = fh
    brute = {}
    ids = sorted(by_clip)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            common = sorted(set(by_clip[a]) & set(by_clip[b]))
            if len(common) < mm.VHASH_MIN_OVERLAP:
                continue
            hs = [
                bin((by_clip[a][o] ^ by_clip[b][o]) & (2**64 - 1)).count("1")
                for o in common
            ]
            if max(hs) <= mm.HAM_MAX:
                brute[(a, b)] = (len(common), max(hs))
    got = {
        (r["id_a"], r["id_b"]): (r["n_frames_cmp"], r["max_hamming"])
        for r in CATALOG["media_vhash_pairs"].fn(spark, "unused").collect()
    }
    assert got == brute
    assert Counter(got.values()) == {(4, 0): 3, (4, 5): 3, (3, 0): 3}

    # the poisoned controls exist in the fixture (one frame at 9 bits,
    # all others at 0) and are correctly absent from the pair set
    poisoned = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            common = sorted(set(by_clip[a]) & set(by_clip[b]))
            if len(common) < 2 or (a, b) in brute:
                continue
            hs = [
                bin((by_clip[a][o] ^ by_clip[b][o]) & (2**64 - 1)).count("1")
                for o in common
            ]
            if sum(h == 0 for h in hs) == len(hs) - 1 and max(hs) == 9:
                poisoned += 1
    assert poisoned == 3


def test_vhash_error_row_contained(spark):
    """O23: the corrupt RAWV payload yields one (null, null, error) row,
    never a failed task."""
    from pdf_extractor_spark.queries.catalog import _vhash_exploded

    errs = [
        r
        for r in _vhash_exploded(spark).collect()
        if r["error"] is not None
    ]
    assert len(errs) == 1
    assert errs[0]["media_id"] == 26
    assert errs[0]["frame_ord"] is None and errs[0]["fhash"] is None


def test_vhash_plan_payload_never_shuffles(spark):
    """Only (ids, sample ordinal, 8-byte frame hash, band) ever reach
    an Exchange — the video payload and frames stay inside the
    Arrow-batch scan stage."""
    from pdf_extractor_spark.queries import CATALOG
    from tests.test_plans import plan_of

    plan = plan_of(CATALOG["media_vhash_pairs"].fn(spark, "unused"))
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "payload" not in head and "fhashes" not in head, head


def test_vhash_pairs_radius_guard_and_min_overlap(spark):
    """ham_max >= PHASH_BANDS loses the pigeonhole guarantee -> raises;
    a two-clip overlap at exactly HAM_MAX on one frame passes, at
    HAM_MAX+1 fails; overlap below VHASH_MIN_OVERLAP is dropped."""
    with pytest.raises(ValueError):
        mm.vhash_pairs_of(None, ham_max=mm.PHASH_BANDS)

    seven = sum(1 << (8 * b) for b in range(7))
    eight = sum(1 << (8 * b) for b in range(8))
    rows = [
        # clips 0/1: two frames, one identical + one at hamming 7 -> pair
        (0, 0, 0), (0, 1, 0), (1, 0, 0), (1, 1, seven),
        # clip 2: one frame at hamming 8 from clip 0's frame 1 -> no pair
        (2, 0, 0), (2, 1, eight),
        # clips 3/4: single-frame identical -> below min overlap
        (3, 0, 12345), (4, 0, 12345),
    ]
    df = spark.createDataFrame(
        rows, "media_id LONG, frame_ord LONG, fhash LONG"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_frames_cmp"], r["max_hamming"])
        for r in mm.vhash_pairs_of(df).collect()
    }
    # (0,1): frame 1 at exactly HAM_MAX -> kept; (1,2): seven^eight is
    # ONE bit -> kept; (0,2): frame 1 at HAM_MAX+1 -> rejected;
    # (3,4): identical but single-frame overlap -> rejected
    assert got == {(0, 1): (2, 7), (1, 2): (2, 1)}


def test_vhash_offset_pairs_superset_and_lead_twins(spark):
    """The offset pass reproduces EVERY aligned pair at offset 0 (same
    overlap and max hamming) and additionally finds exactly the 3
    planted leading-truncated twins at offset -1 (3-frame overlap,
    hamming 0) — the intro-cut class the aligned pass provably misses
    (their ord-equal frames are independent patterns)."""
    from pdf_extractor_spark.queries import CATALOG

    aligned = {
        (r["id_a"], r["id_b"]): (r["n_frames_cmp"], r["max_hamming"])
        for r in CATALOG["media_vhash_pairs"].fn(spark, "unused").collect()
    }
    off = {
        (r["id_a"], r["id_b"]): (
            r["offset"],
            r["n_frames_cmp"],
            r["max_hamming"],
        )
        for r in CATALOG["media_vhash_pairs_offset"].fn(spark, "unused")
        .collect()
    }
    assert len(aligned) == 9 and len(off) == 12
    for pair, (n, mx) in aligned.items():
        assert off[pair] == (0, n, mx)
    extra = {p: v for p, v in off.items() if p not in aligned}
    assert len(extra) == 3
    assert all(v == (-1, 3, 0) for v in extra.values())
    # the extra pairs are exactly the planted (base, base+1) lead twins
    assert all(b == a + 1 for a, b in extra)


def test_vhash_offset_crafted_shift_recovery(spark):
    """Crafted clips: a leading-cut twin is found at d=-1, an aligned
    copy at d=0, and the twin-vs-copy pair at d=+1 — all with the
    correct overlap; an unrelated clip pairs with nothing."""
    import random

    rng = random.Random(5)
    H = []
    while len(H) < 5:
        c = rng.getrandbits(63)
        if all(bin(c ^ x).count("1") > 12 for x in H):
            H.append(c)
    rows = [(0, i, H[i]) for i in range(4)]
    rows += [(1, i, H[i + 1]) for i in range(3)]  # leading cut
    rows += [(2, i, H[i]) for i in range(4)]  # aligned copy
    rows += [(3, i, H[4]) for i in range(4)]  # unrelated
    df = spark.createDataFrame(
        rows, "media_id LONG, frame_ord LONG, fhash LONG"
    )
    got = sorted(tuple(r) for r in mm.vhash_pairs_offset_of(df).collect())
    assert got == [
        (0, 1, -1, 3, 0),
        (0, 2, 0, 4, 0),
        (1, 2, 1, 3, 0),
    ]


def test_vhash_offset_plan_payload_never_shuffles(spark):
    """Same discipline as the aligned pass: only ids, ordinals, 8-byte
    hashes and band keys ever reach an Exchange."""
    from pdf_extractor_spark.queries import CATALOG
    from tests.test_plans import plan_of

    plan = plan_of(
        CATALOG["media_vhash_pairs_offset"].fn(spark, "unused")
    )
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "payload" not in head and "fhashes" not in head, head


def test_vhash_clusters_offset_edges_and_keep_one(spark):
    """Clusters are built over the OFFSET pairs, so the three
    leading-truncated twins co-cluster with their bases (the aligned
    pass alone would leave them singletons); exactly one keeper per
    cluster; the kept set contains no offset pair."""
    from collections import Counter

    from pdf_extractor_spark.queries import CATALOG

    rows = CATALOG["media_vhash_clusters"].fn(spark, "unused").collect()
    assert len(rows) == 32  # 33 fixture rows minus the corrupt payload
    cl = {r["media_id"]: r["cluster_id"] for r in rows}
    off_pairs = [
        (r["id_a"], r["id_b"])
        for r in CATALOG["media_vhash_pairs_offset"].fn(spark, "unused")
        .collect()
    ]
    assert all(cl[a] == cl[b] for a, b in off_pairs)
    # the three lead twins (appended after the corrupt row, ids 27..32
    # as base,twin pairs) share their base's cluster
    for base in (27, 29, 31):
        assert cl[base + 1] == cl[base]
    keepers = [r for r in rows if r["keep"] == 1]
    by_cluster = Counter(r["cluster_id"] for r in rows)
    assert len(keepers) == len(by_cluster)
    kept_ids = {r["media_id"] for r in keepers}
    assert not [
        p for p in off_pairs if p[0] in kept_ids and p[1] in kept_ids
    ]


def test_media_dedup_manifest_unions_all_modalities(spark):
    """The capstone manifest is exactly the union of the three cluster
    tables (40 image + 42 audio + 32 video rows), with one keeper per
    (modality, cluster)."""
    from collections import Counter

    from pdf_extractor_spark.queries import CATALOG

    rows = CATALOG["media_dedup_manifest"].fn(spark, "unused").collect()
    per_mod = Counter(r["modality"] for r in rows)
    assert per_mod == {"image": 40, "audio": 42, "video": 32}
    clusters = Counter((r["modality"], r["cluster_id"]) for r in rows)
    keepers = [r for r in rows if r["keep"] == 1]
    assert len(keepers) == len(clusters)
    assert all(r["media_id"] == r["cluster_id"] for r in keepers)


def test_zero_frame_clip_stays_visible(spark):
    """A VALID RAWV container with zero frames (decodes cleanly, yields
    no sampled frames) must surface as one all-null row — not vanish:
    posexplode_outer on the operator side, and the expected-oracle
    builder mirrors the same row, so the parity gate cannot diverge the
    day such a clip enters the fixture."""
    from pdf_extractor_spark.operators.multimodal import (
        decode_rawv,
        encode_rawv,
        video_frame_hashes,
    )
    from pyspark.sql import functions as F

    payload = encode_rawv([])
    assert decode_rawv(payload) == []  # round-trips as a valid container
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "media_id long, payload binary"
    )
    vh = video_frame_hashes(df).select(
        "media_id",
        F.posexplode_outer("fhashes").alias("frame_ord", "fhash"),
        "error",
    )
    rows = vh.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.media_id, r.frame_ord, r.fhash, r.error) == (0, None, None, None)
