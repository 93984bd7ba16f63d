"""Perceptual media fingerprints + near-duplicate detection for
every non-text modality (SURVEY.md §2.14 extension).

Media-level dedup for a multimodal training pipeline: exact byte
dedup misses re-encoded / brightness-shifted / gain-normalized
copies, so each modality gets a 64-bit perceptual signature whose
hamming distance tracks perceptual similarity (the role
MinHash/SimHash play for text in `ops/dedup.py`):

- images: DCT pHash / gradient dHash (below), plus `image_features`
  grid-mean vectors that feed the embedding ANN/dedup family;
- video: `video_fingerprint` — summed-luma pHash over sampled
  YUV4MPEG2 frames;
- audio: `audio_fingerprint` — gain-invariant windowed-energy bits
  over decoded PCM.

All pair joins share `dedup.hamming_pairs` (banded pigeonhole
equi-join, per-bucket skew cap).

Two classic hashes, both pure numpy (no Pillow / scipy needed):

- **pHash** (DCT): grayscale → area-resize 32×32 → orthonormal 2-D
  DCT-II → top-left 8×8 low-frequency block, DC zeroed → bit = coef >
  median.  Zeroing DC before the median makes the hash exactly
  invariant to global brightness offsets (adding a constant to every
  pixel changes only the DC coefficient), which `tests/test_imagehash`
  pins as a property.
- **dHash** (gradient): grayscale → area-resize 8×9 → bit = left <
  right neighbor.  Also brightness-offset invariant (differences are).

Decode reuses the stdlib raster decoders (netpbm / PNG / baseline
JPEG) from `ops/multimodal.py` / `ops/codecs.py`; undecodable bytes
hash to NULL — decode failures are data, not exceptions, at 100 TB.

Scale design: hashing is an Arrow-batched `mapInPandas` map-only pass
(no shuffle); the pair join is the generic banded
`dedup.hamming_pairs` — only (id, band, bucket, sig) rows shuffle,
with the per-bucket skew cap shared with SimHash.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bubbles_spark.ops import codecs, dedup
from bubbles_spark.ops.multimodal import _netpbm_pixels


def _gray(arr):
    """(H, W, C) uint/int array → float64 (H, W) luma (channel mean),
    shifted so min = 0.  The shift is mathematically a no-op for every
    AC DCT coefficient and every dhash difference (constants cancel),
    but doing it FIRST makes brightness invariance *bitwise exact* for
    integer rasters: an image and its +c twin become the identical
    float array before any resize/DCT rounding can leak ε-sized noise
    into near-zero coefficients and flip sign bits."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    return a - a.min()


def _axis_resize(a, target: int, axis: int):
    """Deterministic 1-D resize along ``axis``: area-mean when
    downscaling (each target bucket averages its source slice, via
    reduceat on searchsorted boundaries), nearest-index replication
    when upscaling.  No float index math that could differ across
    platforms — boundaries are integer arithmetic."""
    import numpy as np

    n = a.shape[axis]
    if n == target:
        return a
    if n >= target:
        buckets = (np.arange(n) * target) // n
        bounds = np.searchsorted(buckets, np.arange(target))
        seg = np.add.reduceat(a, bounds, axis=axis)
        cnt = np.diff(np.append(bounds, n)).astype(np.float64)
        shape = [1] * a.ndim
        shape[axis] = target
        return seg / cnt.reshape(shape)
    idx = (np.arange(target) * n) // target
    return np.take(a, idx, axis=axis)


def _resize(a, th: int, tw: int):
    return _axis_resize(_axis_resize(a, th, 0), tw, 1)


_DCT_CACHE: dict[int, object] = {}


def _dct_mat(n: int):
    """Orthonormal DCT-II matrix (scipy.fft.dct(norm='ortho') twin):
    M[k, i] = c_k · cos(π(2i+1)k / 2n);  dct2(X) = M @ X @ M.T."""
    import numpy as np

    m = _DCT_CACHE.get(n)
    if m is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] *= np.sqrt(0.5)
        _DCT_CACHE[n] = m
    return m


def _to_signed64(bits: int) -> int:
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def phash64(arr) -> int:
    """64-bit DCT perceptual hash of a raster array.  Bit (8u+v) set
    iff DCT coefficient (u, v) of the 32×32 area-resized grayscale
    exceeds the median of the 8×8 low-frequency block (DC zeroed)."""
    import numpy as np

    g = _resize(_gray(arr), 32, 32)
    m = _dct_mat(32)
    d = (m @ g @ m.T)[:8, :8].copy()
    d[0, 0] = 0.0
    med = float(np.median(d))
    h = 0
    flat = d.ravel()
    for b in range(64):
        if flat[b] > med:
            h |= 1 << b
    return _to_signed64(h)


def dhash64(arr) -> int:
    """64-bit gradient (difference) hash: bit (8r+c) set iff
    pixel (r, c) < pixel (r, c+1) on the 8×9 area-resized grayscale."""
    g = _resize(_gray(arr), 8, 9)
    bits = (g[:, :-1] < g[:, 1:]).ravel()
    h = 0
    for b in range(64):
        if bits[b]:
            h |= 1 << b
    return _to_signed64(h)


_METHODS = {"phash": phash64, "dhash": dhash64}


def _decode_raster(data: bytes):
    """bytes → raster array via the stdlib decoders, or None."""
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
    return arr


def image_hash(
    df: DataFrame,
    media_col: str = "media",
    method: str = "phash",
    out: str = "img_hash",
) -> DataFrame:
    """Append a 64-bit perceptual hash column (``long``; NULL when the
    bytes don't decode) computed per image inside Arrow-batched
    ``mapInPandas`` — a map-only pass, no shuffle."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {sorted(_METHODS)}, got {method!r}")
    fn = _METHODS[method]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.LongType())]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(m):
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                arr = _decode_raster(data)
                return None if arr is None else fn(arr)

            yield pdf.assign(**{out: pdf[media_col].apply(one).astype("object")})

    return df.mapInPandas(_hash, schema=out_schema)


def _bands_for(max_hamming: int) -> int:
    """Smallest divisor-of-64 band count whose pigeonhole guarantee
    covers ``max_hamming`` (hamming ≤ bands-1 ⇒ some band matches)."""
    for b in (1, 2, 4, 8, 16, 32, 64):
        if b > max_hamming:
            return b
    return 64


def image_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_hamming: int = 4,
    method: str = "phash",
    bands: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate image pairs: perceptual-hash each image (map
    only), then the banded hamming join from `dedup.hamming_pairs`.
    ``bands`` defaults to the smallest divisor of 64 that makes the
    pigeonhole recall guarantee exact for ``max_hamming``.
    Returns (id_a, id_b, hamming)."""
    hashed = image_hash(df, media_col, method).select(id_col, "img_hash")
    return dedup.hamming_pairs(
        hashed,
        id_col,
        "img_hash",
        max_hamming=max_hamming,
        bands=bands if bands is not None else _bands_for(max_hamming),
        max_bucket=max_bucket,
    )


def image_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_hamming: int = 4,
    method: str = "phash",
    **kw,
) -> DataFrame:
    """Drop visually-duplicate images: every image whose hash matches
    a lower-id image within ``max_hamming`` bits loses (single-link
    one-step, same contract as `dedup.minhash_dedup`; run the pair
    output through `dedup.connected_components` for full clusters)."""
    pairs = image_dup_pairs(
        df, id_col, media_col, max_hamming=max_hamming, method=method, **kw
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def image_features(
    df: DataFrame,
    media_col: str = "media",
    grid: tuple[int, int] = (8, 8),
    out: str = "img_vec",
) -> DataFrame:
    """Append a grid-mean feature vector (``array<double>``, length
    grid[0]·grid[1]; NULL when the bytes don't decode) — the bridge
    from multimodal columns into the vector-search family: the output
    column feeds `vector.cosine_topk*`, `dedup.embedding_dup_pairs`,
    or `dedup.semantic_dup_pairs` unchanged, giving image semantic
    dedup / similarity search without any image-specific join code.

    The raster is min-shifted (`_gray`) before the area resize, so —
    exactly as for the hashes — an integer raster and its brightness
    twin produce the IDENTICAL vector (cosine 1.0), which keeps the
    planted-pair oracle exact.  Map-only Arrow-batched pass."""
    gh, gw = grid
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out, T.ArrayType(T.DoubleType()))]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(m):
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                arr = _decode_raster(data)
                if arr is None:
                    return None
                return [float(v) for v in _resize(_gray(arr), gh, gw).ravel()]

            yield pdf.assign(**{out: pdf[media_col].apply(one)})

    return df.mapInPandas(_feat, schema=out_schema)


def video_fingerprint(
    df: DataFrame,
    media_col: str = "media",
    every_n: int = 2,
    max_frames: int = 8,
    out: str = "vid_hash",
) -> DataFrame:
    """Append a 64-bit perceptual fingerprint per VIDEO (``long``;
    NULL when the bytes aren't decodable YUV4MPEG2): sample every
    ``every_n``-th frame (≤ ``max_frames``), SUM their luma planes as
    integers, and pHash the summed raster.

    Why the integer sum: (a) pHash bits are invariant under positive
    scaling (DCT is linear and the median threshold scales with it),
    so the sum is equivalent to the mean without a float division;
    (b) integer summation keeps the brightness-twin property
    bitwise-exact (a +c luma offset on every frame shifts the summed
    raster by exactly c·n_frames — a constant, which `_gray`'s
    min-shift removes).  Same Arrow-batched map-only shape as
    `image_hash`; the per-frame Y-plane slice reuses the stdlib Y4M
    walker from `ops/multimodal.py`."""
    import numpy as np

    from bubbles_spark.ops.multimodal import _decode_y4m

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.LongType())]
    )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(m):
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                if not data.startswith(b"YUV4MPEG2"):
                    return None
                try:
                    w, h, _chroma, frames = _decode_y4m(data)
                except Exception:
                    return None
                picked = frames[::every_n][:max_frames]
                if not picked:
                    return None
                acc = np.zeros((h, w), dtype=np.int64)
                for fr in picked:
                    if len(fr) < w * h:
                        return None
                    acc += np.frombuffer(fr, np.uint8, count=w * h).reshape(h, w)
                return phash64(acc)

            yield pdf.assign(**{out: pdf[media_col].apply(one).astype("object")})

    return df.mapInPandas(_fp, schema=out_schema)


def video_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_hamming: int = 4,
    every_n: int = 2,
    max_frames: int = 8,
    bands: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate video pairs: fingerprint each video (map only),
    then the shared banded `dedup.hamming_pairs` join.  Returns
    (id_a, id_b, hamming)."""
    fps = video_fingerprint(df, media_col, every_n, max_frames).select(
        id_col, "vid_hash"
    )
    return dedup.hamming_pairs(
        fps,
        id_col,
        "vid_hash",
        max_hamming=max_hamming,
        bands=bands if bands is not None else _bands_for(max_hamming),
        max_bucket=max_bucket,
    )


def audio_fingerprint(
    df: DataFrame,
    media_col: str = "media",
    out: str = "audio_hash",
) -> DataFrame:
    """Append a 64-bit audio fingerprint per PCM WAV (``long``; NULL
    when not decodable PCM): split the sample stream into 64 equal
    windows, bit i = window-i energy > median window energy.

    Exactly invariant to a positive GAIN (every energy scales by g²,
    and so does the median — comparisons are scale-free), the audio
    analogue of the brightness-invariant image hashes; robust to
    codec-level amplitude normalization, the common cause of
    byte-level dedup misses on audio.  Map-only Arrow-batched pass;
    pairs go through the shared `dedup.hamming_pairs` banded join."""
    import numpy as np

    from bubbles_spark.ops.multimodal import _wav_samples

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.LongType())]
    )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(m):
                data = bytes((m["data"] if isinstance(m, dict) else m.data) or b"")
                dec = _wav_samples(data)
                if dec is None:
                    return None
                _rate, _ch, s = dec
                if len(s) < 64:
                    return None
                # integer window energies: exact, so a gain-g twin has
                # energies g²·e_i and the SAME comparison outcomes
                bounds = (np.arange(65) * len(s)) // 64
                sq = s.astype(np.int64) ** 2
                cum = np.concatenate(([0], np.cumsum(sq)))
                e = cum[bounds[1:]] - cum[bounds[:-1]]
                med = float(np.median(e))
                h = 0
                for b in range(64):
                    if e[b] > med:
                        h |= 1 << b
                return _to_signed64(h)

            yield pdf.assign(**{out: pdf[media_col].apply(one).astype("object")})

    return df.mapInPandas(_fp, schema=out_schema)


def audio_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_hamming: int = 4,
    bands: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate audio pairs: fingerprint each clip (map only),
    then the shared banded hamming join.  Returns
    (id_a, id_b, hamming)."""
    fps = audio_fingerprint(df, media_col).select(id_col, "audio_hash")
    return dedup.hamming_pairs(
        fps,
        id_col,
        "audio_hash",
        max_hamming=max_hamming,
        bands=bands if bands is not None else _bands_for(max_hamming),
        max_bucket=max_bucket,
    )
