"""Baseline JPEG decoder: round-trips against an independent minimal
encoder written here from ITU T.81 (forward DCT via the textbook
cosine sum, fixed-length canonical Huffman tables, restart markers,
byte stuffing) — plus an exact hand-computed solid-gray case and the
non-baseline rejection paths."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from bubbles_spark.ops import codecs

# ---------------------------------------------------------------------
# minimal baseline encoder (test-only)
# ---------------------------------------------------------------------

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def fdct(block: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT straight from the T.81 A.3.3 sum (no shared
    code with the decoder's matmul IDCT)."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


# fixed-length canonical tables: DC categories 0-11 at 4 bits, all AC
# run/size symbols at 8 bits (incomplete codes are legal per Annex C)
DC_VALS = list(range(12))
AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
DC_COUNTS = [0, 0, 0, 12] + [0] * 12
AC_COUNTS = [0] * 7 + [len(AC_VALS)] + [0] * 8


def canon_codes(counts, vals):
    code, vi, out = 0, 0, {}
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[vals[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return out


DC_CODE = canon_codes(DC_COUNTS, DC_VALS)
AC_CODE = canon_codes(AC_COUNTS, AC_VALS)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def put_coef(bw: BitWriter, v: int, s: int):
    bw.put(v if v >= 0 else v + (1 << s) - 1, s)


def encode_block(bw: BitWriter, qcoef: list[int], pred: int) -> int:
    diff = qcoef[0] - pred
    s = category(diff)
    bw.put(*DC_CODE[s])
    if s:
        put_coef(bw, diff, s)
    run = 0
    last = max((k for k in range(1, 64) if qcoef[k]), default=0)
    for k in range(1, last + 1):
        if qcoef[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*AC_CODE[0xF0])
            run -= 16
        s = category(qcoef[k])
        bw.put(*AC_CODE[(run << 4) | s])
        put_coef(bw, qcoef[k], s)
        run = 0
    if last < 63:
        bw.put(*AC_CODE[0x00])
    return qcoef[0]


def _pad(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane, ((0, bh - h), (0, bw_ - w)), mode="edge"
    ) if (bh > h or bw_ > w) else plane


def seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray, quant: int = 1, subsample: bool = False, restart: int = 0
) -> bytes:
    """Baseline JFIF bytes for (H, W) grayscale or (H, W, 3) RGB."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full((8, 8), float(quant))
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if subsample:
            # 2x2 mean; odd edges replicate first
            cb2 = cb[: h - h % 2 or h, : w - w % 2 or w]
            cb = cb[::2, ::2] if h % 2 or w % 2 else (
                (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2]) / 4
            )
            cr = cr[::2, ::2] if h % 2 or w % 2 else (
                (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2]) / 4
            )
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    max_h = max(s[0] for s in samps)
    max_v = max(s[1] for s in samps)
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    padded = [
        _pad(p, mcuy * 8 * sv, mcux * 8 * sh) for p, (sh, sv) in zip(planes, samps)
    ]

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(q.reshape(64)[ZZ[k]]) for k in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i, (sh, sv) in enumerate(samps):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_VALS))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    bw = BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bw.align()
            out += bw.out
            bw = BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, ((sh, sv), plane) in enumerate(zip(samps, padded)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    blk = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coefs = fdct(blk) / q
                    qz = [int(round(coefs.reshape(64)[ZZ[k]])) for k in range(64)]
                    preds[ci] = encode_block(bw, qz, preds[ci])
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------


def test_solid_gray_exact():
    # DC = 8*(130-128)/q00 with q00=16 -> exactly 1; zero AC -> the
    # decoded block must be exactly 130 everywhere (hand-checkable)
    img = np.full((8, 8), 130, np.uint8)
    data = encode_jpeg(img, quant=16)
    out = codecs.decode_jpeg(data)
    assert out.shape == (8, 8, 1)
    assert (out == 130).all()


def test_gray_roundtrip_close():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 16), np.uint8)
    out = codecs.decode_jpeg(encode_jpeg(img, quant=1))[:, :, 0]
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_gray_non_multiple_of_8():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (13, 11), np.uint8)
    out = codecs.decode_jpeg(encode_jpeg(img, quant=1))[:, :, 0]
    assert out.shape == (13, 11)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_color_444_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    out = codecs.decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_color_420_solid():
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :] = (200, 60, 120)
    out = codecs.decode_jpeg(encode_jpeg(img, quant=1, subsample=True))
    assert out.shape == (32, 32, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_color_420_blocks():
    # 16x16 color tiles align with the chroma grid: nearest upsample
    # reconstructs them; verify per-tile mean color
    img = np.zeros((32, 48, 3), np.uint8)
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (0, 255, 255), (128, 128, 128)]
    k = 0
    for ty in range(2):
        for tx in range(3):
            img[ty * 16 : ty * 16 + 16, tx * 16 : tx * 16 + 16] = colors[k]
            k += 1
    out = codecs.decode_jpeg(encode_jpeg(img, quant=1, subsample=True))
    for ty in range(2):
        for tx in range(3):
            tile = out[ty * 16 + 4 : ty * 16 + 12, tx * 16 + 4 : tx * 16 + 12]
            want = img[ty * 16 + 4, tx * 16 + 4].astype(float)
            assert np.abs(tile.mean(axis=(0, 1)) - want).max() < 3


def test_restart_markers():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (8, 40), np.uint8)  # 5 MCUs
    data = encode_jpeg(img, quant=1, restart=2)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    out = codecs.decode_jpeg(data)[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_progressive_rejected():
    img = np.full((8, 8), 99, np.uint8)
    data = bytearray(encode_jpeg(img, quant=1))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError, match="SOF2"):
        codecs.decode_jpeg(bytes(data))


def test_truncated_raises():
    img = np.full((8, 8), 99, np.uint8)
    data = encode_jpeg(img, quant=1)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(data[:40])


def test_dims_agree_with_decode():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 16), np.uint8)
    data = encode_jpeg(img, quant=1)
    assert codecs.jpeg_dims(data) == (16, 24, 1, "jpeg")
