"""Pure-stdlib image codecs for the multimodal operators.

The container has no Pillow/libjpeg, but two of the three common web
image formats are decodable from public specs with stdlib only:

- PNG (W3C PNG / RFC 2083): zlib-compressed filtered scanlines.
  ``decode_png`` fully decodes to an (H, W, C) uint8 numpy array;
  ``png_dims`` parses IHDR + validates the decompressed raster length
  (cheap metadata path for decode_image).
- JPEG (ITU T.81): ``jpeg_dims`` walks the marker stream for the
  SOFn frame header (a *real* metadata decode, not a guess), and
  ``decode_jpeg`` fully decodes sequential-baseline streams — Huffman
  entropy decode with restarts, dequant, de-zigzag, 8×8 IDCT,
  chroma upsample, YCbCr→RGB.  Progressive/12-bit/arithmetic/CMYK
  stay gated behind Pillow (``try_pillow_decode``).

These run inside Arrow-batched mapInPandas workers (multimodal.py) —
per-image Python cost is fine there; the batch transfer is the part
that must stay vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(data: bytes):
    pos = 8
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        yield typ, data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IEND":
            return


def png_dims(data: bytes):
    """(width, height, channels, "png") for a valid 8-bit PNG, else
    None.  Validates the full decompressed raster length — a truncated
    IDAT stream fails — without paying for unfiltering."""
    if data[:8] != _PNG_SIG:
        return None
    w = h = depth = ctype = interlace = None
    idat = []
    try:
        for typ, body in _png_chunks(data):
            if typ == b"IHDR":
                w, h, depth, ctype, _c, _f, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
            elif typ == b"IDAT":
                idat.append(body)
        if w is None or depth != 8 or interlace or ctype not in _PNG_CHANNELS:
            return None
        raw = zlib.decompress(b"".join(idat))
    except Exception:
        return None
    # palette images index 3-channel PLTE entries → report 3 channels
    ch = _PNG_CHANNELS[ctype]
    if len(raw) != h * (w * ch + 1):
        return None
    return (w, h, 3 if ctype == 3 else ch, "png")


def decode_png(data: bytes) -> np.ndarray:
    """Full PNG decode → (H, W, C) uint8 array.  8-bit depth, color
    types 0/2/3/4/6, no interlace; scanline filters 0-4 undone (the
    spec's recurrence is serial down rows; each row vectorizes for
    filters 0/2, falls back to a per-byte loop for Sub/Avg/Paeth)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    w = h = depth = ctype = interlace = None
    idat, plte = [], None
    for typ, body in _png_chunks(data):
        if typ == b"IHDR":
            w, h, depth, ctype, _c, _f, interlace = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if interlace:
        raise NotImplementedError("interlaced PNG unsupported")
    if ctype not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster length mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, rows = arr[:, 0], arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f, line = filters[y], rows[y].copy()
        if f == 0:
            pass
        elif f == 2:  # Up — fully vectorized
            line = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-pixel serial
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    line[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line
        prev = out[y]
    img = out.astype(np.uint8).reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img


_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def jpeg_dims(data: bytes):
    """(width, height, components, "jpeg") parsed from the SOFn frame
    header, else None.  A real metadata decode per ITU T.81 — walks
    the marker stream (skipping entropy-coded segments is unnecessary
    before SOF)."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    try:
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad
            # the space before a marker code
            while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
                pos += 1
            marker = data[pos + 1]
            # standalone markers (no length segment): SOI, RSTn, TEM
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            if marker in _JPEG_SOF:
                _prec, h, w, ncomp = struct.unpack(
                    ">BHHB", data[pos + 4 : pos + 10]
                )
                return (w, h, ncomp, "jpeg")
            if marker in (0xD9, 0xDA):  # EOI / start-of-scan: no SOF seen
                return None
            pos += 2 + seglen
    except (struct.error, IndexError):
        return None
    return None


# ---------------------------------------------------------------------
# Baseline JPEG pixel decode (ITU T.81) — stdlib + numpy only
# ---------------------------------------------------------------------

# stream position k holds the coefficient at raster index _ZIGZAG[k]
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: spatial = A.T @ coef @ A
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _huff_table(counts: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: {(length, code): value}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over one (unstuffed) entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted mid-block")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            val = table.get((length, code))
            if val is not None:
                return val
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to its signed value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _decode_block(
    bits: _BitReader,
    dc: dict[tuple[int, int], int],
    ac: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    coef = np.zeros(64, dtype=np.float64)
    t = bits.decode(dc)
    pred += _extend(bits.receive(t), t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = bits.decode(ac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        coef[k] = _extend(bits.receive(s), s)
        k += 1
    return coef, pred


def decode_jpeg(data: bytes) -> np.ndarray:
    """Full baseline-DCT JPEG decode → (H, W, C) uint8, C ∈ {1, 3};
    stdlib + numpy, no libjpeg.  ITU T.81 sequential baseline:
    Huffman entropy decode (per-segment restart handling, 0xFF00
    unstuffing), dequantize, de-zigzag, orthonormal 8×8 IDCT via two
    matmuls, sampling-factor upsample (4:2:0 / 4:2:2), BT.601
    YCbCr→RGB.  Progressive (SOF2), 12-bit, arithmetic-coded, and
    CMYK streams raise NotImplementedError — this is the verify-path
    twin of jpeg_dims, not a libjpeg replacement; Pillow upgrades
    those when installed (try_pillow_decode).

    Pure-Python block loop: ~ms per 64×64 image — fine inside the
    Arrow-batched multimodal workers where images are small and
    correctness (real pixels for quality stats) is the point.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    h = w = 0
    restart = 0
    scan_comps: list[tuple[int, int, int]] = []  # (comp index, td, ta)
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq:
                    vals = np.frombuffer(seg[o : o + 128], ">u2").astype(np.float64)
                    o += 128
                else:
                    vals = np.frombuffer(seg[o : o + 64], np.uint8).astype(np.float64)
                    o += 64
                q = np.zeros(64)
                q[_ZIGZAG] = vals
                qtabs[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                counts = list(seg[o + 1 : o + 17])
                n = sum(counts)
                tbl = _huff_table(counts, seg[o + 17 : o + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = tbl
                o += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (8 only)")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"JPEG with {ncomp} components")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in _JPEG_SOF:
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != len(comps):
                raise NotImplementedError("non-interleaved JPEG scans unsupported")
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(i for i, cm in enumerate(comps) if cm[0] == cs)
                scan_comps.append((ci, tt >> 4, tt & 0x0F))
            pos += 2 + seglen
            break
        pos += 2 + seglen
    if not comps or not scan_comps:
        raise ValueError("JPEG without SOF/SOS frame")

    # --- split entropy data at restart markers, unstuffing 0xFF00 ----
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif nxt == 0xFF:
            i += 1
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any other marker ends the scan
            break
    segments.append(bytes(cur))

    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    rasters = [
        np.zeros((mcus_y * 8 * c[2], mcus_x * 8 * c[1]), np.float64) for c in comps
    ]
    preds = [0] * len(comps)
    seg_idx = 0
    bits = _BitReader(segments[0])
    for m in range(mcus_x * mcus_y):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            bits = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, td, ta in scan_comps:
            _cid, ch, cv, tq = comps[ci]
            for by in range(cv):
                for bx in range(ch):
                    coef, preds[ci] = _decode_block(
                        bits, dc_tabs[td], ac_tabs[ta], preds[ci]
                    )
                    deq = np.zeros(64)
                    deq[_ZIGZAG] = coef
                    blk = deq.reshape(8, 8) * qtabs[tq]
                    spatial = _DCT_A.T @ blk @ _DCT_A + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    rasters[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial

    # --- upsample to full resolution, crop, color-convert ------------
    planes = []
    for (cid, ch, cv, _tq), r in zip(comps, rasters):
        if ch != max_h or cv != max_v:
            r = np.repeat(np.repeat(r, max_v // cv, axis=0), max_h // ch, axis=1)
        planes.append(r[:h, :w])
    if len(planes) == 1:
        out = planes[0][:, :, None]
    else:
        y, cb, cr = planes
        out = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=2,
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit, filter 0 scanlines) — the
    synthesis twin of decode_png for tests and oracle queries.
    Accepts (H, W) or (H, W, C) uint8 with C in {1, 2, 3, 4}."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(
        b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def try_pillow_decode(data: bytes):
    """Full decode via Pillow when (and only when) it is installed —
    (width, height, channels, format) or None if Pillow is absent or
    the bytes don't decode.  The deterministic stdlib paths above stay
    the CI story; this upgrades JPEG/WEBP/... for real deployments."""
    try:
        import io as _io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        return None
    try:
        with Image.open(_io.BytesIO(data)) as im:
            return (im.width, im.height, len(im.getbands()), im.format.lower())
    except Exception:
        return None
