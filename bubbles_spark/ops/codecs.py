"""Pure-stdlib image codecs for the multimodal operators.

The container has no Pillow/libjpeg, but two of the three common web
image formats are decodable from public specs with stdlib only:

- PNG (W3C PNG / RFC 2083): zlib-compressed filtered scanlines.
  ``decode_png`` fully decodes to an (H, W, C) uint8 numpy array;
  ``png_dims`` parses IHDR + validates the decompressed raster length
  (cheap metadata path for decode_image).
- JPEG (ITU T.81): full entropy decode is out of scope, but the frame
  header (SOFn marker) carries exact dimensions + component count —
  ``jpeg_dims`` walks the marker stream, which is a *real* metadata
  decode, not a guess.  Full pixel decode stays gated behind Pillow
  (``try_pillow_decode``).

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
