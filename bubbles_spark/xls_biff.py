"""Legacy binary .xls (BIFF8) reader on the stdlib — no xlrd.

Closes the S6 gap (SURVEY.md §2.1: bubbles/backends/xls reads .xls
via xlrd; this environment has no xlrd, so the format is parsed
directly from its two public specifications:

- [MS-CFB]  Compound File Binary — the OLE2 container (512-byte
  sectors, FAT/DIFAT chains, a 64-byte mini-sector stream for
  payloads under 4096 bytes, a directory of UTF-16 entries).
- [MS-XLS]  Excel Binary File Format — BIFF8 records inside the
  ``Workbook`` stream: a globals substream (SST shared strings,
  BOUNDSHEET offsets, FORMAT/XF for date detection) followed by one
  substream per sheet (LABELSST / NUMBER / RK / MULRK / BOOLERR /
  LABEL / FORMULA+STRING cell records).

Scope: cell VALUES only (the reference reads values too — xlrd's
formatting_info defaults off).  Formulas yield their cached results.
Charts/macros/encryption are out of scope; encrypted workbooks
(FILEPASS record) raise.  Like the xlsx twin, this is a driver-side
reader — Excel caps at 65 536 rows in BIFF8, so distributing the
parse would be theater; the DataFrame it feeds is distributed.
"""

from __future__ import annotations

import datetime as dt
import struct
from typing import Any

# ---------------------------------------------------------------------
# [MS-CFB] compound file container
# ---------------------------------------------------------------------

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


class _Cfb:
    """Minimal CFB reader: enough to pull one named stream."""

    def __init__(self, data: bytes):
        if data[:8] != _CFB_MAGIC:
            raise ValueError("not an OLE2/CFB file (bad magic) — not a .xls?")
        (major,) = struct.unpack_from("<H", data, 26)
        self.ssz = 4096 if major == 4 else 512
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (n_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (difat_start,) = struct.unpack_from("<I", data, 68)
        (n_difat,) = struct.unpack_from("<I", data, 72)
        self.data = data

        # FAT sector list: 109 entries in the header, rest in DIFAT chain
        fat_sectors = [
            s
            for (s,) in struct.iter_unpack("<I", data[76 : 76 + 436])
            if s not in (_FREESECT, _ENDOFCHAIN)
        ]
        sec = difat_start
        for _ in range(n_difat):
            if sec in (_ENDOFCHAIN, _FREESECT):
                break
            raw = self._sector(sec)
            entries = list(struct.unpack(f"<{self.ssz // 4}I", raw))
            fat_sectors.extend(
                s for s in entries[:-1] if s not in (_FREESECT, _ENDOFCHAIN)
            )
            sec = entries[-1]
        self.fat: list[int] = []
        for s in fat_sectors[:n_fat] if n_fat else fat_sectors:
            self.fat.extend(struct.unpack(f"<{self.ssz // 4}I", self._sector(s)))

        # directory entries (128 bytes each)
        dirdata = self._chain(self.dir_start)
        self.entries = []
        for off in range(0, len(dirdata), 128):
            ent = dirdata[off : off + 128]
            if len(ent) < 128:
                break
            (nlen,) = struct.unpack_from("<H", ent, 64)
            if nlen < 2:
                continue
            name = ent[: nlen - 2].decode("utf-16-le", errors="replace")
            etype = ent[66]
            (start,) = struct.unpack_from("<I", ent, 116)
            (size,) = struct.unpack_from("<Q", ent, 120)
            self.entries.append((name, etype, start, size))

        root = next(e for e in self.entries if e[1] == 5)
        self._mini_stream = self._chain(root[2])[: root[3]] if root[3] else b""
        self.minifat: list[int] = []
        if self.minifat_start not in (_ENDOFCHAIN, _FREESECT):
            mf = self._chain(self.minifat_start)
            self.minifat = list(struct.unpack(f"<{len(mf) // 4}I", mf))

    def _sector(self, n: int) -> bytes:
        off = (n + 1) * self.ssz
        return self.data[off : off + self.ssz]

    def _chain(self, start: int) -> bytes:
        out, sec, seen = [], start, set()
        while sec not in (_ENDOFCHAIN, _FREESECT):
            if sec in seen:
                raise ValueError("cyclic FAT chain — corrupt CFB")
            seen.add(sec)
            out.append(self._sector(sec))
            sec = self.fat[sec]
        return b"".join(out)

    def stream(self, *names: str) -> bytes:
        for name, etype, start, size in self.entries:
            if etype == 2 and name in names:
                if size < self.mini_cutoff:
                    # mini-FAT chain of 64-byte sectors in the mini stream
                    out, sec, seen = [], start, set()
                    while sec not in (_ENDOFCHAIN, _FREESECT):
                        if sec in seen:
                            raise ValueError("cyclic miniFAT chain")
                        seen.add(sec)
                        out.append(self._mini_stream[sec * 64 : sec * 64 + 64])
                        sec = self.minifat[sec]
                    return b"".join(out)[:size]
                return self._chain(start)[:size]
        raise ValueError(f"stream not found: {names}")


# ---------------------------------------------------------------------
# BIFF8 record stream
# ---------------------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_LABEL = 0x0204
_FORMULA = 0x0006
_STRING = 0x0207
_FORMAT = 0x041E
_XF = 0x00E0
_FILEPASS = 0x002F

# builtin number-format ids Excel renders as dates/times ([MS-XLS]
# §2.4.126; same set xlrd uses)
_DATE_FMT_IDS = set(range(14, 23)) | set(range(27, 37)) | {45, 46, 47} | set(
    range(50, 59)
)
_EPOCH_1900 = dt.datetime(1899, 12, 30)


def _records(stream: bytes, start: int = 0):
    """Yield (record_id, offset, payload) from ``start`` until the
    stream ends.  CONTINUE records are NOT merged here — string
    parsing needs the chunk boundaries (a fresh grbit byte opens each
    continuation of character data)."""
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, pos)
        yield rid, pos, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


class _Chunks:
    """Cursor over a record's payload plus its CONTINUE payloads,
    honoring the BIFF8 rule that character data crossing into a
    CONTINUE re-declares its compression with a fresh grbit byte."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.off = 0

    def _advance(self) -> bool:
        while self.ci < len(self.chunks) and self.off >= len(self.chunks[self.ci]):
            self.ci += 1
            self.off = 0
        return self.ci < len(self.chunks)

    def eof(self) -> bool:
        return not self._advance()

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            if not self._advance():
                raise ValueError("truncated BIFF record data")
            chunk = self.chunks[self.ci]
            take = min(n, len(chunk) - self.off)
            out += chunk[self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, compressed: bool) -> str:
        """Read ``cch`` characters, re-reading a grbit byte whenever
        the character run crosses a chunk boundary."""
        parts: list[str] = []
        while cch > 0:
            if not self._advance():
                raise ValueError("truncated string data")
            chunk = self.chunks[self.ci]
            avail = len(chunk) - self.off
            if compressed:
                take = min(cch, avail)
                parts.append(
                    chunk[self.off : self.off + take].decode("latin-1")
                )
            else:
                take = min(cch, avail // 2)
                if take == 0:
                    raise ValueError("odd utf-16 split in BIFF string")
                parts.append(
                    chunk[self.off : self.off + 2 * take].decode("utf-16-le")
                )
            self.off += take if compressed else 2 * take
            cch -= take
            if cch > 0:
                # crossing into the next CONTINUE: fresh grbit
                self.ci += 1
                self.off = 0
                if not self._advance():
                    raise ValueError("truncated continued string")
                grbit = self.chunks[self.ci][self.off]
                self.off += 1
                compressed = not (grbit & 0x01)
        return "".join(parts)

    def read_unicode_string(self) -> str:
        """XLUnicodeRichExtendedString ([MS-XLS] §2.5.293)."""
        cch = struct.unpack("<H", self.read(2))[0]
        grbit = self.read(1)[0]
        rich_cnt = struct.unpack("<H", self.read(2))[0] if grbit & 0x08 else 0
        phon_sz = struct.unpack("<I", self.read(4))[0] if grbit & 0x04 else 0
        s = self.read_chars(cch, compressed=not (grbit & 0x01))
        if rich_cnt:
            self.read(4 * rich_cnt)
        if phon_sz:
            self.read(phon_sz)
        return s


def _short_unicode_string(data: bytes, off: int) -> tuple[str, int]:
    """ShortXLUnicodeString (8-bit length — sheet names)."""
    cch = data[off]
    grbit = data[off + 1]
    off += 2
    if grbit & 0x01:
        return data[off : off + 2 * cch].decode("utf-16-le"), off + 2 * cch
    return data[off : off + cch].decode("latin-1"), off + cch


def _decode_rk(rk: int) -> float | int:
    """RkNumber: bit0 = ÷100, bit1 = 30-bit int vs truncated double."""
    div100 = rk & 0x01
    if rk & 0x02:
        val: float | int = rk >> 2
        if rk & 0x80000000:
            val -= 1 << 30  # sign-extend the 30-bit int
    else:
        (val,) = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))
    if div100:
        return val / 100
    return val


def _gather_continued(recs: list[tuple[int, int, bytes]], i: int) -> tuple[list[bytes], int]:
    chunks = [recs[i][2]]
    j = i + 1
    while j < len(recs) and recs[j][0] == _CONTINUE:
        chunks.append(recs[j][2])
        j += 1
    return chunks, j


def read_workbook(
    path: str, dates: bool = True
) -> dict[str, list[list[Any]]]:
    """Parse every worksheet → {sheet_name: rows}, each row a dense
    list (None-padded to the sheet's max seen column).  Numeric cells
    whose XF carries a date format become ``datetime`` when ``dates``
    (serial 0 ≙ 1899-12-30, the 1900 date system; the sub-61 leap-bug
    region inherits the same epoch, matching xlrd's behavior for
    post-Feb-1900 dates)."""
    with open(path, "rb") as f:
        data = f.read()
    stream = _Cfb(data).stream("Workbook", "Book")

    recs = list(_records(stream))
    # --- globals substream -------------------------------------------
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    formats: dict[int, str] = {}
    xf_fmt: list[int] = []
    i = 0
    while i < len(recs):
        rid, off, payload = recs[i]
        if rid == _FILEPASS:
            raise NotImplementedError("encrypted .xls workbooks are unsupported")
        if rid == _SST:
            chunks, j = _gather_continued(recs, i)
            cur = _Chunks(chunks)
            cur.read(4)  # total refs
            (unique,) = struct.unpack("<I", cur.read(4))
            for _ in range(unique):
                sst.append(cur.read_unicode_string())
            i = j
            continue
        if rid == _BOUNDSHEET:
            (pos,) = struct.unpack_from("<I", payload, 0)
            sheet_type = payload[5]
            name, _ = _short_unicode_string(payload, 6)
            if sheet_type == 0x00:  # worksheet (not chart/VB module)
                sheets.append((name, pos))
        elif rid == _FORMAT:
            (fmt_id,) = struct.unpack_from("<H", payload, 0)
            cur = _Chunks([payload[2:]])
            formats[fmt_id] = cur.read_unicode_string()
        elif rid == _XF:
            xf_fmt.append(struct.unpack_from("<H", payload, 2)[0])
        elif rid == _EOF:
            i += 1
            break
        i += 1

    def _is_date_fmt(fmt_id: int) -> bool:
        if fmt_id in _DATE_FMT_IDS:
            return True
        fmt = formats.get(fmt_id)
        if not fmt:
            return False
        # strip quoted literals / color tags, then look for date codes
        out, q = [], False
        k = 0
        while k < len(fmt):
            ch = fmt[k]
            if ch == '"':
                q = not q
            elif ch == "\\":
                k += 1
            elif ch == "[":
                end = fmt.find("]", k)
                k = end if end >= 0 else len(fmt)
            elif not q:
                out.append(ch.lower())
            k += 1
        return any(c in out for c in "ymdhs")

    date_xf = {
        k for k, fmt_id in enumerate(xf_fmt) if dates and _is_date_fmt(fmt_id)
    }

    def _maybe_date(val: Any, xf: int) -> Any:
        if xf in date_xf and isinstance(val, (int, float)):
            return _EPOCH_1900 + dt.timedelta(days=float(val))
        return val

    # --- per-sheet cell substreams -----------------------------------
    book: dict[str, list[list[Any]]] = {}
    for name, pos in sheets:
        cells: dict[tuple[int, int], Any] = {}
        srecs = list(_records(stream, pos))
        k = 0
        while k < len(srecs):
            rid, off, p = srecs[k]
            if rid == _EOF:
                break
            if rid == _LABELSST:
                row, col, _xf, isst = struct.unpack_from("<HHHI", p, 0)
                cells[(row, col)] = sst[isst]
            elif rid == _NUMBER:
                row, col, xf = struct.unpack_from("<HHH", p, 0)
                (val,) = struct.unpack_from("<d", p, 6)
                cells[(row, col)] = _maybe_date(val, xf)
            elif rid == _RK:
                row, col, xf = struct.unpack_from("<HHH", p, 0)
                (rk,) = struct.unpack_from("<I", p, 6)
                cells[(row, col)] = _maybe_date(_decode_rk(rk), xf)
            elif rid == _MULRK:
                row, col0 = struct.unpack_from("<HH", p, 0)
                n_cells = (len(p) - 6) // 6
                for c in range(n_cells):
                    xf, rk = struct.unpack_from("<HI", p, 4 + 6 * c)
                    cells[(row, col0 + c)] = _maybe_date(_decode_rk(rk), xf)
            elif rid == _BOOLERR:
                row, col, _xf = struct.unpack_from("<HHH", p, 0)
                val, is_err = p[6], p[7]
                cells[(row, col)] = None if is_err else bool(val)
            elif rid == _LABEL:
                row, col, _xf = struct.unpack_from("<HHH", p, 0)
                cur = _Chunks([p[6:]])
                cells[(row, col)] = cur.read_unicode_string()
            elif rid == _FORMULA:
                row, col, xf = struct.unpack_from("<HHH", p, 0)
                result = p[6:14]
                if result[6:8] == b"\xff\xff":
                    kind = result[0]
                    if kind == 0:  # cached string in the next STRING record
                        j = k + 1
                        while j < len(srecs) and srecs[j][0] not in (
                            _STRING,
                            _EOF,
                        ):
                            j += 1
                        if j < len(srecs) and srecs[j][0] == _STRING:
                            chunks, _ = _gather_continued(srecs, j)
                            cur = _Chunks(chunks)
                            (cch,) = struct.unpack("<H", cur.read(2))
                            grbit = cur.read(1)[0]
                            cells[(row, col)] = cur.read_chars(
                                cch, compressed=not (grbit & 0x01)
                            )
                    elif kind == 1:
                        cells[(row, col)] = bool(result[2])
                    elif kind == 3:
                        cells[(row, col)] = ""
                    else:  # kind == 2: cached error
                        cells[(row, col)] = None
                else:
                    (val,) = struct.unpack("<d", result)
                    cells[(row, col)] = _maybe_date(val, xf)
            k += 1
        if cells:
            max_row = max(r for r, _ in cells)
            max_col = max(c for _, c in cells)
            book[name] = [
                [cells.get((r, c)) for c in range(max_col + 1)]
                for r in range(max_row + 1)
            ]
        else:
            book[name] = []
    return book


def read_rows(path: str, sheet: str | int = 0, dates: bool = True) -> list[list[Any]]:
    """Rows of one sheet (by index or name) — the xlsx.read_rows twin."""
    book = read_workbook(path, dates=dates)
    if isinstance(sheet, int):
        names = list(book)
        if sheet >= len(names):
            raise IndexError(f"sheet index {sheet} out of range ({len(names)} sheets)")
        return book[names[sheet]]
    if sheet not in book:
        raise KeyError(f"no sheet named {sheet!r}; have {list(book)}")
    return book[sheet]
