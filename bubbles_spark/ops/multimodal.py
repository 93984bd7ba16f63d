"""Multimodal column operators (SURVEY.md §2.14).

Image/audio/video as opaque ``binary`` columns wrapped in a typed
struct — ``{uri, mime, data, meta}`` — so pipelines can carry media
through filters/joins/dedup without touching bytes until a decode
stage.

``decode_image`` decodes netpbm (PGM/PPM) FOR REAL with pure stdlib
(header parse + raster-length validation).  Formats that need codec
libraries (JPEG/PNG/video) are STUBBED — NotImplementedError unless
``fake=True``, which substitutes a clearly marked deterministic fake
(dimensions from a content hash) so the full Spark-side plumbing —
schema, batching, partition behavior — stays exercised and tested.

Design notes for the real thing at 100 TB:
- media bytes go through ``mapInPandas`` (arrow batches), never a
  row-at-a-time UDF; batch size bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch to cap executor RSS.
- decoded features (dims, duration, frames) are small scalar structs;
  frames themselves re-emerge as new binary rows via the iterator
  (one in-batch → many out-rows is native to mapInPandas).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bubbles_spark.ops import codecs

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def attach_media(
    df: DataFrame,
    data_col: str,
    mime: str = "application/octet-stream",
    uri_col: str | None = None,
    out: str = "media",
) -> DataFrame:
    """Wrap a binary (or string→utf8) column into the media struct."""
    data = F.col(data_col).cast("binary")
    uri = F.col(uri_col) if uri_col else F.lit(None).cast("string")
    return df.withColumn(
        out,
        F.struct(
            uri.alias("uri"),
            F.lit(mime).alias("mime"),
            data.alias("data"),
            F.map_from_arrays(
                F.array(F.lit("n_bytes")),
                F.array(F.length(data).cast("string")),
            ).alias("meta"),
        ),
    )


IMAGE_META_SCHEMA = "width int, height int, channels int, format string"

_NETPBM_CHANNELS = {b"P2": 1, b"P5": 1, b"P3": 3, b"P6": 3}
_NETPBM_FORMAT = {b"P2": "pgm", b"P5": "pgm", b"P3": "ppm", b"P6": "ppm"}


def _parse_netpbm(data: bytes):
    """Parse a netpbm (PGM/PPM, ascii + binary) header and validate
    the raster — pure stdlib.  Returns (w, h, maxval, channels,
    format, magic, raster_start) or None.  Validates the raster
    length, not just the header, so truncated files fail."""
    magic = data[:2]
    if magic not in _NETPBM_CHANNELS:
        return None
    # header = magic + 3 ints (w, h, maxval), '#' comments allowed
    tokens: list[int] = []
    i = 2
    try:
        while len(tokens) < 3:
            while i < len(data) and data[i : i + 1].isspace():
                i += 1
            if data[i : i + 1] == b"#":
                while i < len(data) and data[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tokens.append(int(data[i:j]))
            i = j
        i += 1  # single whitespace after maxval
    except (ValueError, IndexError):
        return None
    w, h, maxval = tokens
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        return None
    ch = _NETPBM_CHANNELS[magic]
    raster = data[i:]
    if magic in (b"P5", b"P6"):
        per = 1 if maxval < 256 else 2
        if len(raster) < w * h * ch * per:
            return None
    else:
        if len(raster.split()) < w * h * ch:
            return None
    return (w, h, maxval, ch, _NETPBM_FORMAT[magic], magic, i)


def _decode_netpbm(data: bytes):
    """(width, height, channels, format) or None — see _parse_netpbm."""
    parsed = _parse_netpbm(data)
    if parsed is None:
        return None
    w, h, _maxval, ch, fmt, _magic, _start = parsed
    return (w, h, ch, fmt)


def _netpbm_pixels(data: bytes):
    """Full netpbm raster decode → (H, W, C) numpy array, or None."""
    import numpy as np

    parsed = _parse_netpbm(data)
    if parsed is None:
        return None
    w, h, maxval, ch, _fmt, magic, start = parsed
    n = w * h * ch
    if magic in (b"P5", b"P6"):
        if maxval < 256:
            arr = np.frombuffer(data, np.uint8, count=n, offset=start)
        else:
            arr = np.frombuffer(data, ">u2", count=n, offset=start).astype(np.int32)
    else:
        arr = np.array(data[start:].split()[:n], dtype=np.int32)
    return arr.reshape(h, w, ch)


def decode_image(
    df: DataFrame, media_col: str = "media", fake: bool = False
) -> DataFrame:
    """Decode images → (width, height, channels, format) columns via
    Arrow-batched mapInPandas.

    Real, stdlib-only decode paths (ops/codecs.py):
      - netpbm (PGM/PPM): header + raster-length validation;
      - PNG: IHDR parse + full zlib raster-length validation;
      - JPEG: SOFn frame-header dimensions (ITU T.81 marker walk).
    If Pillow is installed it upgrades everything else (WEBP, GIF,
    full JPEG pixel validation) — probed per batch, never required.
    Remaining undecodable bytes: with ``fake=True`` they get a
    clearly-marked deterministic placeholder (dims from the content
    hash) so the Spark-side plumbing stays exercised; with
    ``fake=False`` (default) they raise NotImplementedError naming
    the missing dependency.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("format", T.StringType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def dims(m):
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                real = (
                    _decode_netpbm(data)
                    or codecs.png_dims(data)
                    or codecs.jpeg_dims(data)
                    or codecs.try_pillow_decode(data)
                )
                if real is not None:
                    return real
                if not fake:
                    raise NotImplementedError(
                        "netpbm/PNG/JPEG-header decode stdlib-side; other "
                        "formats need Pillow, which this environment "
                        "lacks; pass fake=True for the deterministic "
                        "plumbing stub on other formats"
                    )
                # DETERMINISTIC FAKE: dims from md5 — not a decoder
                h = hashlib.md5(data).digest()
                return (64 + h[0] % 192, 64 + h[1] % 192, 3, "fake")

            decoded = pdf[media_col].apply(dims)
            pdf = pdf.assign(
                width=[d[0] for d in decoded],
                height=[d[1] for d in decoded],
                channels=[d[2] for d in decoded],
                format=[d[3] for d in decoded],
            )
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def image_pixel_stats(
    df: DataFrame, media_col: str = "media"
) -> DataFrame:
    """REAL pixel-level feature extraction — decodes the full raster
    (netpbm via stdlib, PNG via ops/codecs.py zlib+unfilter, baseline
    JPEG via ops/codecs.py Huffman+IDCT) and appends per-image
    statistics: width/height/channels + pixel mean/min/max.  The
    first rung of an image-quality ladder for a multimodal training
    pipeline (dark/blank/clipped-image filters build directly on
    these columns).

    Arrow-batched mapInPandas: each worker decodes its batch of
    images with numpy; no Pillow required for netpbm/PNG.  Images
    that don't decode yield NULL stats (filter on them downstream) —
    decode failures are data, not exceptions, at 100 TB.
    """
    import numpy as np

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("px_mean", T.DoubleType()),
            T.StructField("px_min", T.IntegerType()),
            T.StructField("px_max", T.IntegerType()),
        ]
    )
    NULLS = (None, None, None, None, None, None)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(m):
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                arr = _netpbm_pixels(data)
                if arr is None and data[:8] == b"\x89PNG\r\n\x1a\n":
                    try:
                        arr = codecs.decode_png(data)
                    except Exception:
                        arr = None
                if arr is None and data[:2] == b"\xff\xd8":
                    try:
                        arr = codecs.decode_jpeg(data)
                    except Exception:
                        arr = None
                if arr is None:
                    return NULLS
                h, w, ch = arr.shape
                return (
                    w, h, ch,
                    float(np.mean(arr)), int(np.min(arr)), int(np.max(arr)),
                )

            decoded = pdf[media_col].apply(stats)
            yield pdf.assign(
                width=[d[0] for d in decoded],
                height=[d[1] for d in decoded],
                channels=[d[2] for d in decoded],
                px_mean=[d[3] for d in decoded],
                px_min=[d[4] for d in decoded],
                px_max=[d[5] for d in decoded],
            )

    return df.mapInPandas(_stats, schema=out_schema)


AUDIO_META_SCHEMA = (
    "sample_rate int, channels int, bits_per_sample int, "
    "duration_s double, format string"
)


def _decode_wav(data: bytes):
    """REAL RIFF/WAVE decoder — pure stdlib chunk walk.  Returns
    (sample_rate, channels, bits_per_sample, duration_s, format) or
    None for non-WAV bytes.  Handles extra chunks (LIST, fact) and
    validates the fmt chunk before trusting the data size."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt " and size >= 16 and body + 16 <= len(data):
            _, ch, rate, _, _, bps = struct.unpack_from("<HHIIHH", data, body)
            fmt = (ch, rate, bps)
        elif cid == b"data":
            data_size = min(size, len(data) - body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    ch, rate, bps = fmt
    if ch <= 0 or rate <= 0 or bps <= 0:
        return None
    duration = data_size / (rate * ch * (bps // 8 or 1))
    return (rate, ch, bps, round(duration, 6), "wav")


def make_wav(
    sample_rate: int,
    channels: int,
    n_samples: int,
    bits_per_sample: int = 16,
    fill=None,
) -> bytes:
    """Minimal valid PCM WAV — the synthesis twin of ``_decode_wav``
    for tests and oracle queries.  ``fill(i)`` supplies the int16
    value of flat sample i (frame-major, channel-minor); default
    silence.  16-bit only when ``fill`` is given."""
    import struct

    bps = bits_per_sample
    block = channels * bps // 8
    data_size = n_samples * block
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_size, b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block, block, bps,
        b"data", data_size,
    )
    if fill is None:
        return hdr + b"\0" * data_size
    if bps != 16:
        raise ValueError("fill synthesis supports 16-bit PCM only")
    body = b"".join(
        struct.pack("<h", int(fill(i)))
        for i in range(n_samples * channels)
    )
    return hdr + body


def _wav_samples(data: bytes):
    """Full PCM decode: (sample_rate, channels, samples) where samples
    is a flat numpy int array (frame-major), or None.  8-bit PCM is
    unsigned per the WAV spec and recenters to signed; 16-bit reads
    little-endian int16.  Other widths return None (a real pipeline
    would add 24/32-bit here)."""
    import struct

    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, body_off, body_size = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt " and size >= 16 and body + 16 <= len(data):
            _, ch, rate, _, _, bps = struct.unpack_from("<HHIIHH", data, body)
            fmt = (ch, rate, bps)
        elif cid == b"data":
            body_off, body_size = body, min(size, len(data) - body)
        pos = body + size + (size & 1)
    if fmt is None or body_off is None:
        return None
    ch, rate, bps = fmt
    if ch <= 0 or rate <= 0:
        return None
    if bps == 16:
        n = body_size // 2
        samples = np.frombuffer(data, "<i2", count=n, offset=body_off).astype(
            np.int32
        )
    elif bps == 8:
        samples = (
            np.frombuffer(data, np.uint8, count=body_size, offset=body_off).astype(
                np.int32
            )
            - 128
        )
    else:
        return None
    return (rate, ch, samples)


def audio_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL PCM feature extraction — decodes the WAV sample stream
    (pure stdlib+numpy) and appends the first-rung audio-quality
    features a multimodal training pipeline filters on: silence
    (rms/peak ≈ 0), clipping (peak at full scale), and activity
    (zero-crossing count).  Appends sample_rate, channels,
    n_samples (flat), rms (6dp), peak, zero_crossings; NULLs when the
    bytes aren't decodable PCM — decode failures are data, not
    exceptions, at 100 TB.  Arrow-batched mapInPandas, map-only."""
    import numpy as np

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("zero_crossings", T.LongType()),
        ]
    )
    NULLS = (None, None, None, None, None, None)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(m):
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                dec = _wav_samples(data)
                if dec is None:
                    return NULLS
                rate, ch, s = dec
                if len(s) == 0:
                    return (rate, ch, 0, 0.0, 0, 0)
                rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
                neg = s < 0
                zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
                return (
                    rate, ch, int(len(s)), round(rms, 6),
                    int(np.max(np.abs(s))), zc,
                )

            decoded = pdf[media_col].apply(stats)
            yield pdf.assign(
                sample_rate=[d[0] for d in decoded],
                channels=[d[1] for d in decoded],
                n_samples=[d[2] for d in decoded],
                rms=[d[3] for d in decoded],
                peak=[d[4] for d in decoded],
                zero_crossings=[d[5] for d in decoded],
            )

    return df.mapInPandas(_stats, schema=out_schema)


def decode_audio(
    df: DataFrame, media_col: str = "media", fake: bool = False
) -> DataFrame:
    """Decode audio → (sample_rate, channels, bits_per_sample,
    duration_s, format) via Arrow-batched mapInPandas.

    PCM WAV decodes FOR REAL (pure stdlib RIFF chunk walk — header +
    data-size validation).  Compressed formats (mp3/flac/ogg) need
    codec libraries absent from this container: gated behind
    ``fake=True`` exactly like decode_image."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("bits_per_sample", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("format", T.StringType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def meta(m):
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                real = _decode_wav(data)
                if real is not None:
                    return real
                if not fake:
                    raise NotImplementedError(
                        "only PCM WAV decodes without codec libraries; "
                        "pass fake=True for the plumbing stub on "
                        "compressed formats"
                    )
                h = hashlib.md5(data).digest()
                return (8000 + h[0] * 100, 1 + h[1] % 2, 16, 1.0, "fake")

            decoded = pdf[media_col].apply(meta)
            pdf = pdf.assign(
                sample_rate=[d[0] for d in decoded],
                channels=[d[1] for d in decoded],
                bits_per_sample=[d[2] for d in decoded],
                duration_s=[d[3] for d in decoded],
                format=[d[4] for d in decoded],
            )
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


_Y4M_CHROMA_DIV = {
    # chroma tag -> (x_div, y_div); frame bytes = Y + 2 * (w/xd * h/yd)
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
}


def _decode_y4m(data: bytes):
    """Parse an uncompressed YUV4MPEG2 stream: returns (width, height,
    chroma, [frame_bytes...]).  Pure stdlib — Y4M is the one video
    container that needs no codec (raw planar YUV with text headers),
    which makes the REAL many-rows-out decode path testable here."""
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    chroma = "420"
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C":
            chroma = tok[1:4] if tok[1:4] in _Y4M_CHROMA_DIV else ("mono" if tok[1:].startswith("mono") else tok[1:4])
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if chroma == "mono":
        frame_size = w * h
    else:
        xd, yd = _Y4M_CHROMA_DIV[chroma]
        frame_size = w * h + 2 * ((w // xd) * (h // yd))
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        start = fnl + 1
        frames.append(data[start : start + frame_size])
        pos = start + frame_size
    return w, h, chroma, frames


def make_y4m(
    width: int, height: int, n_frames: int, fill: Callable[[int], int] = None
) -> bytes:
    """Synthesize a C420 YUV4MPEG2 stream; frame i's planes are filled
    with ``fill(i)`` (default i % 256).  Test/oracle generator twin of
    _decode_y4m."""
    fill = fill or (lambda i: i % 256)
    frame_size = width * height + 2 * ((width // 2) * (height // 2))
    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()]
    for i in range(n_frames):
        out.append(b"FRAME\n")
        out.append(bytes([fill(i) % 256]) * frame_size)
    return b"".join(out)


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    every_n: int = 10,
    max_frames: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Sample frames from video media → one output row per frame
    (id columns preserved, plus frame_index + frame struct whose data
    is the raw planar frame and whose meta carries width/height/
    chroma).

    REAL decode path for uncompressed YUV4MPEG2 (``video/x-yuv4mpeg``
    or a stream starting with the YUV4MPEG2 magic) — parsed by the
    pure-stdlib chunk walker above inside Arrow-batched mapInPandas;
    the one-row-in/many-rows-out fan-out is native to mapInPandas.
    Compressed codecs (mp4/h264/vp9) need libraries absent in this
    environment → ``fake=True`` keeps the deterministic plumbing stub
    for those.
    """
    if fake:
        return _frame_sample_fake(df, media_col, every_n, max_frames)

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", MEDIA_STRUCT),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                m = row[media_col]
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                if not data.startswith(b"YUV4MPEG2"):
                    raise NotImplementedError(
                        "only uncompressed YUV4MPEG2 video is decodable "
                        "without codec libraries; pass fake=True to stub"
                    )
                w, h, chroma, frames = _decode_y4m(data)
                picked = frames[::every_n][:max_frames]
                for k, frame in enumerate(picked):
                    r = row.to_dict()
                    r["frame_index"] = k * every_n
                    r["frame"] = {
                        "uri": None,
                        "mime": "image/x-raw-yuv",
                        "data": frame,
                        "meta": {
                            "width": str(w),
                            "height": str(h),
                            "chroma": chroma,
                        },
                    }
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(_frames, schema=out_schema)


def _frame_sample_fake(
    df: DataFrame,
    media_col: str = "media",
    every_n: int = 10,
    max_frames: int = 8,
) -> DataFrame:
    """Deterministic pseudo-frame stub for compressed codecs (absent
    here): emits hash-derived frames so the fan-out shape is
    exercised for real."""

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", MEDIA_STRUCT),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                m = row[media_col]
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                n = min(max_frames, max(1, len(data) // max(every_n, 1)))
                for i in range(n):
                    r = row.to_dict()
                    r["frame_index"] = i * every_n
                    r["frame"] = {
                        "uri": None,
                        "mime": "image/fake-frame",
                        "data": hashlib.md5(data + i.to_bytes(4, "little")).digest(),
                        "meta": {"frame": str(i * every_n)},
                    }
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(_frames, schema=out_schema)


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Byte-size stats per mime type — pure Column ops over the
    struct (no decode): (mime, n_items, total_bytes, avg_bytes)."""
    m = F.col(media_col)
    return (
        df.select(
            m["mime"].alias("mime"), F.length(m["data"]).alias("__n")
        )
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("__n").cast("long").alias("total_bytes"),
            F.round(F.avg("__n"), 6).alias("avg_bytes"),
        )
    )
