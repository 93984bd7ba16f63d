"""Perceptual image hashing (ops/imagehash.py).

Property pinned hardest: pHash/dHash are exactly invariant to a
global brightness offset (DC zeroed before the median / differences
cancel constants) — that's what lets the driver check image near-dup
recall against a SQL-expressible planted oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from bubbles_spark.ops import imagehash
from bubbles_spark.ops.multimodal import attach_media


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _smooth(seed: int, h: int = 48, w: int = 64):
    """Deterministic low-frequency test image (sum of a few 2-D
    cosines) — the regime perceptual hashes are designed for."""
    rng = np.random.default_rng(seed)
    y = np.arange(h)[:, None] / h
    x = np.arange(w)[None, :] / w
    img = np.zeros((h, w))
    for _ in range(4):
        fy, fx = rng.integers(1, 5, size=2)
        # amplitudes bounded so rasters stay in [28, 228]: the PGM
        # round-trip clips to [0, 255], and a clipped pixel would break
        # the exact brightness-offset invariance the tests pin
        img += rng.uniform(10, 25) * np.cos(np.pi * (fy * y + fx * x))
    return img + 128.0


# ---------------------------------------------------------------- numpy unit


def test_resize_downscale_area_mean():
    a = np.arange(16, dtype=float).reshape(4, 4)
    r = imagehash._resize(a, 2, 2)
    assert r.shape == (2, 2)
    assert r[0, 0] == pytest.approx(np.mean([0, 1, 4, 5]))
    assert r[1, 1] == pytest.approx(np.mean([10, 11, 14, 15]))


def test_resize_upscale_nearest():
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    r = imagehash._resize(a, 4, 4)
    assert r.shape == (4, 4)
    assert r[0, 0] == 1.0 and r[3, 3] == 4.0


def test_dct_matches_known_transform():
    # orthonormal: M @ M.T == I; dct2 of constant is DC-only
    m = imagehash._dct_mat(8)
    assert np.allclose(m @ m.T, np.eye(8), atol=1e-12)
    d = m @ np.full((8, 8), 5.0) @ m.T
    assert d[0, 0] == pytest.approx(40.0)  # 5 * 8 (orthonormal DC gain)
    assert np.abs(d).sum() == pytest.approx(abs(d[0, 0]))


@pytest.mark.parametrize("fn", [imagehash.phash64, imagehash.dhash64])
def test_brightness_offset_invariance(fn):
    # exact for integer rasters: _gray subtracts the min FIRST, so an
    # image and its +c twin are the identical float array before any
    # resize/DCT rounding can touch them (the contract the driver's
    # planted image-dedup oracle relies on)
    img = np.rint(_smooth(1))
    assert fn(img) == fn(img + 17.0)
    assert fn(img) == fn(img - 40.0)
    rgb = np.stack([img, img + 3.0, img - 3.0], axis=2)
    assert fn(rgb) == fn(rgb + 12.0)


def test_phash_discriminates_and_is_stable():
    a, b = _smooth(1), _smooth(2)
    assert imagehash.phash64(a) == imagehash.phash64(a.copy())
    assert _ham(imagehash.phash64(a), imagehash.phash64(b)) > 10


def test_phash_robust_to_mild_noise_and_rescale():
    img = _smooth(3)
    rng = np.random.default_rng(0)
    noisy = img + rng.normal(0, 1.0, img.shape)
    assert _ham(imagehash.phash64(img), imagehash.phash64(noisy)) <= 4
    # same scene rendered at a different resolution
    big = imagehash._resize(img, 96, 128)
    assert _ham(imagehash.phash64(img), imagehash.phash64(big)) <= 6


def test_dhash_bit_layout():
    # strictly increasing rows → every left<right bit set
    img = np.tile(np.arange(9, dtype=float), (8, 1))
    assert imagehash.dhash64(img) == imagehash._to_signed64((1 << 64) - 1)
    assert imagehash.dhash64(img[:, ::-1]) == 0


def test_signed64_roundtrip():
    assert imagehash._to_signed64(1) == 1
    assert imagehash._to_signed64((1 << 63)) == -(1 << 63)


# ---------------------------------------------------------------- spark


def _pgm_df(spark, imgs):
    """(id, raster) pairs → DataFrame with a media struct of binary
    P5 PGM bytes (the stdlib-decodable format)."""
    rows = []
    for i, img in imgs:
        a = np.clip(np.rint(img), 0, 255).astype(np.uint8)
        h, w = a.shape
        rows.append((i, b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()))
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    return attach_media(df, "raw", mime="image/x-portable-graymap")


def test_image_hash_matches_local(spark):
    img = _smooth(7)
    df = imagehash.image_hash(_pgm_df(spark, [(1, img)]))
    [row] = df.collect()
    a = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    assert row.img_hash == imagehash.phash64(a)


def test_image_hash_null_on_undecodable(spark):
    df = spark.createDataFrame([(1, b"not an image")], "doc_id long, raw binary")
    out = imagehash.image_hash(attach_media(df, "raw")).collect()
    assert out[0].img_hash is None


def test_image_dup_pairs_planted(spark):
    # integer-valued bases so the +9 twin survives the PGM uint8
    # round-trip as an exact shift (rint is half-even, not
    # shift-invariant on arbitrary floats)
    base = [(i, np.rint(_smooth(i))) for i in range(1, 6)]
    copies = [(i + 100, img + 9.0) for i, img in base]  # brightness twins
    df = _pgm_df(spark, base + copies)
    pairs = imagehash.image_dup_pairs(df, max_hamming=0).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert {(i, i + 100) for i in range(1, 6)} <= got
    assert all(r.hamming == 0 for r in pairs)


def test_image_dedup_drops_copies(spark):
    base = [(i, np.rint(_smooth(i))) for i in range(1, 6)]
    copies = [(i + 100, img + 9.0) for i, img in base]
    df = _pgm_df(spark, base + copies)
    kept = imagehash.image_dedup(df, max_hamming=0)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids == {1, 2, 3, 4, 5}


def test_dhash_method_dispatch(spark):
    img = _smooth(11)
    df = imagehash.image_hash(_pgm_df(spark, [(1, img)]), method="dhash")
    [row] = df.collect()
    a = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    assert row.img_hash == imagehash.dhash64(a)
    with pytest.raises(ValueError):
        imagehash.image_hash(df, method="md5")


def test_bands_for_pigeonhole():
    assert imagehash._bands_for(0) == 1
    assert imagehash._bands_for(3) == 4
    assert imagehash._bands_for(4) == 8
    assert imagehash._bands_for(15) == 16


def test_image_features_brightness_twin_identical(spark):
    base = np.rint(_smooth(21))
    df = _pgm_df(spark, [(1, base), (2, base + 9.0), (3, _smooth(22))])
    out = {r.doc_id: r.img_vec for r in imagehash.image_features(df).collect()}
    assert out[1] == out[2]            # exact twin vector
    assert out[1] != out[3]
    assert len(out[1]) == 64


def test_image_features_null_on_undecodable(spark):
    df = spark.createDataFrame([(1, b"junk")], "doc_id long, raw binary")
    out = imagehash.image_features(attach_media(df, "raw")).collect()
    assert out[0].img_vec is None


def test_image_features_feed_embedding_dedup(spark):
    """The composition the op exists for: image -> feature vector ->
    the standard embedding near-dup pipeline recovers the planted
    brightness twins at cosine ~1."""
    from bubbles_spark.ops import dedup

    base = [(i, np.rint(_smooth(i))) for i in range(1, 6)]
    twins = [(i + 100, img + 9.0) for i, img in base]
    feats = imagehash.image_features(_pgm_df(spark, base + twins)).filter(
        "img_vec IS NOT NULL"
    )
    pairs = dedup.embedding_dup_pairs(
        feats, id_col="doc_id", vec_col="img_vec", threshold=0.999999, dim=64
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + 100) for i in range(1, 6)} <= got


def _y4m(doc: int, off: int = 0, w: int = 32, h: int = 24, n_frames: int = 6):
    """Structured C420 Y4M stream: per-pixel luma pattern varies with
    (doc, frame, x, y); ``off`` adds a constant luma offset AFTER the
    base pattern (values stay in [20, 229] so uint8 never wraps)."""
    frame_uv = (w // 2) * (h // 2)
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    for f in range(n_frames):
        y = bytes(
            ((x * 3 + yy * 5 + doc * 11 + f * 7) % 200) + 20 + off
            for yy in range(h)
            for x in range(w)
        )
        out.append(b"FRAME\n" + y + b"\x80" * (2 * frame_uv))
    return b"".join(out)


def test_video_fingerprint_brightness_twin(spark):
    df = spark.createDataFrame(
        [(1, _y4m(1)), (2, _y4m(1, off=9)), (3, _y4m(3))],
        "doc_id long, raw binary",
    )
    m = attach_media(df, "raw", mime="video/x-yuv4mpeg")
    out = {r.doc_id: r.vid_hash for r in imagehash.video_fingerprint(m).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_video_fingerprint_null_on_non_y4m(spark):
    df = spark.createDataFrame([(1, b"mp4garbage")], "doc_id long, raw binary")
    out = imagehash.video_fingerprint(attach_media(df, "raw")).collect()
    assert out[0].vid_hash is None


def test_video_dup_pairs_planted(spark):
    base = [(i, _y4m(i)) for i in range(1, 5)]
    twins = [(i + 100, _y4m(i, off=9)) for i in range(1, 5)]
    df = spark.createDataFrame(base + twins, "doc_id long, raw binary")
    m = attach_media(df, "raw", mime="video/x-yuv4mpeg")
    pairs = imagehash.video_dup_pairs(m, max_hamming=0).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert {(i, i + 100) for i in range(1, 5)} <= got


def _wav_vals(doc: int, n: int = 256, gain: int = 1):
    return [(((doc * 7 + k * 13) % 256) - 128) * gain for k in range(n)]


def test_audio_fingerprint_gain_invariant(spark):
    from bubbles_spark.ops.multimodal import make_wav

    rows = []
    for doc, gain in ((1, 1), (2, 4), (3, 1)):
        base = _wav_vals(1 if doc in (1, 2) else 3, gain=gain)
        rows.append((doc, make_wav(8000, 1, len(base), fill=lambda i, b=base: b[i])))
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    m = attach_media(df, "raw", mime="audio/wav")
    out = {r.doc_id: r.audio_hash for r in imagehash.audio_fingerprint(m).collect()}
    assert out[1] == out[2]            # gain x4 twin
    assert out[1] != out[3]


def test_audio_fingerprint_null_paths(spark):
    from bubbles_spark.ops.multimodal import make_wav

    df = spark.createDataFrame(
        [(1, b"mp3junk"), (2, make_wav(8000, 1, 10))], "doc_id long, raw binary"
    )
    out = {
        r.doc_id: r.audio_hash
        for r in imagehash.audio_fingerprint(attach_media(df, "raw")).collect()
    }
    assert out[1] is None
    assert out[2] is None  # < 64 samples: too short to window


def test_audio_dup_pairs_planted(spark):
    from bubbles_spark.ops.multimodal import make_wav

    rows = []
    for i in range(1, 5):
        base = _wav_vals(i)
        rows.append((i, make_wav(8000, 1, len(base), fill=lambda k, b=base: b[k])))
        twin = _wav_vals(i, gain=2)
        rows.append(
            (i + 100, make_wav(8000, 1, len(twin), fill=lambda k, b=twin: b[k]))
        )
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    m = attach_media(df, "raw", mime="audio/wav")
    pairs = imagehash.audio_dup_pairs(m, max_hamming=0).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert {(i, i + 100) for i in range(1, 5)} <= got
