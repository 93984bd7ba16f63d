"""Multimodal struct plumbing + the REAL netpbm decoder."""

from __future__ import annotations

import pytest

from bubbles_spark.ops import multimodal
from bubbles_spark.ops.multimodal import _decode_netpbm


def _pgm(w: int, h: int, binary: bool = True) -> bytes:
    if binary:
        return f"P5\n{w} {h}\n255\n".encode() + bytes(range(256))[: w * h].ljust(
            w * h, b"\0"
        )
    vals = " ".join(str(i % 256) for i in range(w * h))
    return f"P2\n{w} {h}\n255\n{vals}\n".encode()


def _ppm(w: int, h: int) -> bytes:
    return f"P6\n# a comment\n{w} {h}\n255\n".encode() + b"\1" * (3 * w * h)


def test_netpbm_decoder_pure():
    assert _decode_netpbm(_pgm(8, 4)) == (8, 4, 1, "pgm")
    assert _decode_netpbm(_pgm(3, 2, binary=False)) == (3, 2, 1, "pgm")
    assert _decode_netpbm(_ppm(5, 5)) == (5, 5, 3, "ppm")
    # truncated raster must FAIL, not decode the header blindly
    assert _decode_netpbm(_pgm(8, 4)[:-1]) is None
    assert _decode_netpbm(b"\x89PNG\r\n") is None
    assert _decode_netpbm(b"P5\n-3 2\n255\nxxxxxx") is None


def test_decode_image_real_and_gated(spark):
    rows = [(1, _pgm(8, 4)), (2, _ppm(5, 5))]
    df = spark.createDataFrame(rows, "id long, raw binary")
    m = multimodal.attach_media(df, "raw", mime="image/x-portable-anymap")
    out = {r["id"]: (r["width"], r["height"], r["channels"], r["format"])
           for r in multimodal.decode_image(m).collect()}
    assert out == {1: (8, 4, 1, "pgm"), 2: (5, 5, 3, "ppm")}

    # non-netpbm without fake -> loud failure inside the task
    bad = multimodal.attach_media(
        spark.createDataFrame([(1, b"\x89PNG...")], "id long, raw binary"), "raw"
    )
    with pytest.raises(Exception, match="NotImplementedError|netpbm"):
        multimodal.decode_image(bad).collect()
    # with fake=True the placeholder path still flows
    fake = multimodal.decode_image(bad, fake=True).collect()
    assert fake[0]["format"] == "fake"


def test_media_stats_and_frame_sample(spark):
    df = spark.createDataFrame([(1, b"abc"), (2, b"defgh")], "id long, raw binary")
    m = multimodal.attach_media(df, "raw", mime="application/x-test")
    stats = multimodal.media_stats(m).collect()[0]
    assert stats["n_items"] == 2 and stats["total_bytes"] == 8

    frames = multimodal.frame_sample(m, every_n=2, max_frames=3, fake=True)
    got = frames.groupBy("id").count().collect()
    assert {r["id"]: r["count"] for r in got} == {1: 1, 2: 2}


def test_wav_decoder_pure():
    from bubbles_spark.ops.multimodal import _decode_wav, make_wav

    wav = make_wav(16000, 2, 16000)  # 1 second stereo
    assert _decode_wav(wav) == (16000, 2, 16, 1.0, "wav")
    assert _decode_wav(wav[:20]) is None
    assert _decode_wav(b"ID3\x03mp3data") is None
    # mono 8kHz half-second
    assert _decode_wav(make_wav(8000, 1, 4000)) == (8000, 1, 16, 0.5, "wav")


def test_decode_audio_spark(spark):
    from bubbles_spark.ops.multimodal import make_wav

    rows = [(1, make_wav(16000, 1, 8000)), (2, make_wav(44100, 2, 44100))]
    df = spark.createDataFrame(rows, "id long, raw binary")
    m = multimodal.attach_media(df, "raw", mime="audio/wav")
    out = {r["id"]: (r["sample_rate"], r["channels"], r["duration_s"])
           for r in multimodal.decode_audio(m).collect()}
    assert out == {1: (16000, 1, 0.5), 2: (44100, 2, 1.0)}
    bad = multimodal.attach_media(
        spark.createDataFrame([(1, b"ID3mp3")], "id long, raw binary"), "raw"
    )
    with pytest.raises(Exception, match="NotImplementedError|WAV"):
        multimodal.decode_audio(bad).collect()


def test_y4m_roundtrip_and_frame_sample(spark):
    """Real Y4M decode: synthesized stream → sampled frames with
    correct indices, dims, plane sizes, and raster bytes."""
    from bubbles_spark.ops.multimodal import (
        _decode_y4m,
        attach_media,
        frame_sample,
        make_y4m,
    )

    b = make_y4m(6, 4, 7, fill=lambda i: 10 * i)
    w, h, chroma, frames = _decode_y4m(b)
    assert (w, h, chroma, len(frames)) == (6, 4, "420", 7)
    assert all(len(f) == 6 * 4 * 3 // 2 for f in frames)
    assert [f[0] for f in frames] == [0, 10, 20, 30, 40, 50, 60]

    df = spark.createDataFrame([(1, bytearray(b))], "vid_id long, vid binary")
    m = attach_media(df, "vid", mime="video/x-yuv4mpeg")
    out = frame_sample(m, every_n=3, max_frames=2).collect()
    assert [(r["frame_index"], r["frame"]["data"][0]) for r in out] == [(0, 0), (3, 30)]
    assert out[0]["frame"]["meta"]["width"] == "6"


def test_y4m_rejects_garbage(spark):
    import pytest

    from bubbles_spark.ops.multimodal import _decode_y4m

    with pytest.raises(ValueError):
        _decode_y4m(b"RIFFnotavideo\n")


# --- stdlib PNG / JPEG-header codecs (ops/codecs.py) -----------------


def test_png_roundtrip_all_color_types():
    import numpy as np

    from bubbles_spark.ops.codecs import decode_png, encode_png, png_dims

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, (13, 9, c), dtype=np.uint8)
        data = encode_png(img)
        assert np.array_equal(decode_png(data), img)
        assert png_dims(data) == (9, 13, c, "png")


def test_png_rejects_garbage_and_truncation():
    import numpy as np

    from bubbles_spark.ops.codecs import encode_png, png_dims

    assert png_dims(b"not a png") is None
    img = np.zeros((4, 4, 3), np.uint8)
    data = encode_png(img)
    assert png_dims(data[:-20]) is None  # truncated IDAT/IEND


def test_jpeg_sof_dims():
    import struct

    from bubbles_spark.ops.codecs import jpeg_dims

    jpg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc2" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 480, 640, 3) + b"\x00" * 4
    )
    assert jpeg_dims(jpg) == (640, 480, 3, "jpeg")
    assert jpeg_dims(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no frame
    assert jpeg_dims(b"nope") is None


def test_decode_image_png_path(spark):
    import numpy as np

    from bubbles_spark.ops import multimodal
    from bubbles_spark.ops.codecs import encode_png

    img = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    df = spark.createDataFrame([(1, bytearray(encode_png(img)))], "id long, raw binary")
    m = multimodal.attach_media(df, "raw", mime="image/png")
    got = multimodal.decode_image(m).select("width", "height", "channels", "format").collect()[0]
    assert tuple(got) == (4, 3, 3, "png")


def test_image_pixel_stats_real_rasters(spark):
    import numpy as np

    from bubbles_spark.ops import multimodal
    from bubbles_spark.ops.codecs import encode_png

    # PNG with known stats + PGM with uniform raster + undecodable
    img = np.array([[0, 100], [200, 255]], np.uint8)[:, :, None]
    png = encode_png(img)
    pgm = b"P5\n2 2\n255\n\x2e\x2e\x2e\x2e"  # all pixels 46
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(pgm)), (3, bytearray(b"junk"))],
        "id long, raw binary",
    )
    m = multimodal.attach_media(df, "raw")
    got = {
        r["id"]: (r["width"], r["height"], r["channels"], r["px_mean"], r["px_min"], r["px_max"])
        for r in multimodal.image_pixel_stats(m).collect()
    }
    assert got[1] == (2, 2, 1, (0 + 100 + 200 + 255) / 4.0, 0, 255)
    assert got[2] == (2, 2, 1, 46.0, 46, 46)
    assert got[3] == (None, None, None, None, None, None)


def test_image_pixel_stats_jpeg(spark):
    """Baseline JPEG flows through the pixel-stats operator (wiring
    for ops/codecs.py decode_jpeg; exactness is tests/test_jpeg.py)."""
    import numpy as np

    from tests.test_jpeg import encode_jpeg

    img = np.full((8, 16), 130, np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img, quant=16)))], "doc_id long, jpg binary"
    )
    m = multimodal.attach_media(df, "jpg", mime="image/jpeg")
    row = multimodal.image_pixel_stats(m).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (16, 8, 1)
    assert (row["px_mean"], row["px_min"], row["px_max"]) == (130.0, 130, 130)


def test_wav_samples_roundtrip_16bit():
    import numpy as np

    from bubbles_spark.ops.multimodal import _wav_samples, make_wav

    vals = [0, 100, -100, 32767, -32768, 7, -7, 0]
    wav = make_wav(8000, 1, len(vals), fill=lambda i: vals[i])
    rate, ch, s = _wav_samples(wav)
    assert (rate, ch) == (8000, 1)
    assert list(s) == vals


def test_wav_samples_8bit_recenters():
    import struct

    from bubbles_spark.ops.multimodal import _wav_samples

    body = bytes([128, 255, 0, 128])
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE",
        b"fmt ", 16, 1, 1, 8000, 8000, 1, 8,
        b"data", len(body),
    )
    rate, ch, s = _wav_samples(hdr + body)
    assert list(s) == [0, 127, -128, 0]


def test_audio_stats_matches_numpy(spark):
    import numpy as np

    from bubbles_spark.ops.multimodal import attach_media, audio_stats, make_wav

    vals = [(i * 37) % 200 - 100 for i in range(64)]
    wav = make_wav(16000, 1, 64, fill=lambda i: vals[i])
    df = spark.createDataFrame([(1, wav), (2, b"not audio")], "id long, raw binary")
    out = {r.id: r for r in audio_stats(attach_media(df, "raw")).collect()}
    a = np.array(vals, dtype=np.float64)
    assert out[1].n_samples == 64
    assert out[1].rms == round(float(np.sqrt(np.mean(a * a))), 6)
    assert out[1].peak == int(np.max(np.abs(a)))
    neg = a < 0
    assert out[1].zero_crossings == int(np.count_nonzero(neg[1:] != neg[:-1]))
    assert out[2].rms is None and out[2].n_samples is None


def test_audio_stats_silence(spark):
    from bubbles_spark.ops.multimodal import attach_media, audio_stats, make_wav

    df = spark.createDataFrame(
        [(1, make_wav(8000, 2, 100))], "id long, raw binary"
    )
    [r] = audio_stats(attach_media(df, "raw")).collect()
    assert (r.rms, r.peak, r.zero_crossings) == (0.0, 0, 0)
    assert r.n_samples == 200 and r.channels == 2
