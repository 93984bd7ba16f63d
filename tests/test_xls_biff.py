"""Legacy .xls (BIFF8) reader: round-trips against a hand-built
OLE2/CFB + BIFF8 writer that follows [MS-CFB]/[MS-XLS] directly —
both the regular-FAT and mini-FAT container paths, SST continuation
with a grbit flip, every cell record family, and date XF detection."""

from __future__ import annotations

import datetime as dt
import struct

import pytest

from bubbles_spark import xls_biff

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
NOSTREAM = 0xFFFFFFFF


# ---------------------------------------------------------------------
# minimal CFB writer (512-byte sectors, v3)
# ---------------------------------------------------------------------


def _dir_entry(name: str, etype: int, start: int, size: int, child: int = NOSTREAM) -> bytes:
    raw_name = name.encode("utf-16-le") + b"\x00\x00"
    ent = bytearray(128)
    ent[: len(raw_name)] = raw_name
    struct.pack_into("<H", ent, 64, len(raw_name))
    ent[66] = etype
    ent[67] = 1  # black
    struct.pack_into("<III", ent, 68, NOSTREAM, NOSTREAM, child)
    struct.pack_into("<I", ent, 116, start)
    struct.pack_into("<Q", ent, 120, size)
    return bytes(ent)


def make_cfb(streams: dict[str, bytes]) -> bytes:
    """Build a v3 compound file.  Streams < 4096 bytes go through the
    mini stream + mini FAT; larger ones through the regular FAT."""
    sectors: list[bytes] = []
    fat: list[int] = []

    def alloc(data: bytes) -> int:
        start = len(sectors)
        n = max(1, (len(data) + 511) // 512)
        for i in range(n):
            sectors.append(data[i * 512 : (i + 1) * 512].ljust(512, b"\x00"))
            fat.append(start + i + 1)
        fat[-1] = ENDOFCHAIN
        return start

    mini = [(n, d) for n, d in streams.items() if len(d) < 4096]
    big = [(n, d) for n, d in streams.items() if len(d) >= 4096]

    entries: dict[str, tuple[int, int]] = {}

    for name, data in big:
        entries[name] = (alloc(data), len(data))

    # mini stream: 64-byte sectors, chained in the mini FAT
    mini_data = bytearray()
    minifat: list[int] = []
    for name, data in mini:
        start = len(minifat)
        n = max(1, (len(data) + 63) // 64)
        for i in range(n):
            mini_data += data[i * 64 : (i + 1) * 64].ljust(64, b"\x00")
            minifat.append(start + i + 1)
        minifat[-1] = ENDOFCHAIN
        entries[name] = (start, len(data))

    mini_start = alloc(bytes(mini_data)) if mini_data else ENDOFCHAIN
    if minifat:
        mf = b"".join(struct.pack("<I", v) for v in minifat)
        minifat_start = alloc(mf)
        n_minifat = max(1, (len(mf) + 511) // 512)
    else:
        minifat_start, n_minifat = ENDOFCHAIN, 0

    dirents = [_dir_entry("Root Entry", 5, mini_start, len(mini_data), child=1)]
    for name in streams:
        start, size = entries[name]
        dirents.append(_dir_entry(name, 2, start, size))
    dir_start = alloc(b"".join(dirents))

    # FAT sectors (self-describing): grow until stable
    n_fat = 1
    while True:
        total = len(sectors) + n_fat
        need = max(1, (total * 4 + 511) // 512)
        if need == n_fat:
            break
        n_fat = need
    fat_start = len(sectors)
    full_fat = fat + [FATSECT] * n_fat
    fat_bytes = b"".join(struct.pack("<I", v) for v in full_fat)
    for i in range(n_fat):
        sectors.append(fat_bytes[i * 512 : (i + 1) * 512].ljust(512, b"\xff"))

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major = 3 (512B)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini shift
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [FREESECT] * 109
    for i in range(n_fat):
        difat[i] = fat_start + i
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)


# ---------------------------------------------------------------------
# minimal BIFF8 writer
# ---------------------------------------------------------------------


def rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def unistr(s: str, compressed: bool | None = None) -> bytes:
    """XLUnicodeRichExtendedString, no rich/phonetic blocks."""
    if compressed is None:
        compressed = all(ord(c) < 256 for c in s)
    grbit = 0x00 if compressed else 0x01
    chars = (
        s.encode("latin-1") if compressed else s.encode("utf-16-le")
    )
    return struct.pack("<HB", len(s), grbit) + chars


def bof(substream: int) -> bytes:
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, substream, 0x0DBB, 0x07CC, 0, 0))


def cell_head(row: int, col: int, xf: int) -> bytes:
    return struct.pack("<HHH", row, col, xf)


def _rk_from_int(v: int, div100: bool = False) -> int:
    rk = ((v & 0x3FFFFFFF) << 2) | 0x02 | (0x01 if div100 else 0x00)
    return rk & 0xFFFFFFFF


def _rk_from_double(v: float, div100: bool = False) -> int:
    (bits,) = struct.unpack("<Q", struct.pack("<d", v))
    return ((bits >> 32) & 0xFFFFFFFC) | (0x01 if div100 else 0x00)


def build_workbook(pad_to_4096: bool = False) -> bytes:
    """Two sheets exercising every supported record family.

    SST layout is deliberately adversarial: string 1 is split across a
    CONTINUE *mid-characters* with a compression flip (compressed in
    the SST record, uncompressed in the continuation)."""
    # --- SST: 3 strings, continuation inside string 1 ----------------
    s0 = "hello"
    s1 = "split–string"  # non-latin1 dash forces utf-16 in part 2
    s2 = "tail"
    part1 = "split"
    part2 = "–string"
    sst_payload = struct.pack("<II", 4, 3)
    sst_payload += unistr(s0)
    # string 1 header claims full length; chars run out at the record
    # end after 'split' (compressed), continuing uncompressed
    sst_payload += struct.pack("<HB", len(s1), 0x00) + part1.encode("latin-1")
    cont_payload = b"\x01" + part2.encode("utf-16-le") + unistr(s2)

    # --- globals -----------------------------------------------------
    glb = bof(0x0005)
    glb += rec(0x041E, struct.pack("<H", 164) + unistr("yyyy-mm-dd"))  # FORMAT
    # XF 0: general, XF 1: builtin date 14, XF 2: custom 164, XF 3: text
    for fmt in (0, 14, 164, 49):
        glb += rec(0x00E0, struct.pack("<HHH", 0, fmt, 0) + b"\x00" * 14)
    glb += rec(0x00FC, sst_payload) + rec(0x003C, cont_payload)
    # BOUNDSHEET offsets patched below
    bs1 = rec(0x0085, struct.pack("<IBB", 0, 0, 0) + b"\x06\x00Sheet1")
    bs2 = rec(0x0085, struct.pack("<IBB", 0, 0, 0) + b"\x06\x00Sheet2")
    glb += bs1 + bs2 + rec(0x000A, b"")

    # --- sheet 1 -----------------------------------------------------
    sh1 = bof(0x0010)
    sh1 += rec(0x00FD, cell_head(0, 0, 0) + struct.pack("<I", 0))  # hello
    sh1 += rec(0x00FD, cell_head(0, 1, 0) + struct.pack("<I", 1))  # split–string
    sh1 += rec(0x00FD, cell_head(0, 2, 0) + struct.pack("<I", 2))  # tail
    sh1 += rec(0x0203, cell_head(1, 0, 0) + struct.pack("<d", 3.25))  # NUMBER
    sh1 += rec(0x027E, cell_head(1, 1, 0) + struct.pack("<I", _rk_from_int(42)))
    sh1 += rec(0x027E, cell_head(1, 2, 0) + struct.pack("<I", _rk_from_int(-7)))
    sh1 += rec(
        0x027E, cell_head(1, 3, 0) + struct.pack("<I", _rk_from_int(1234, div100=True))
    )
    sh1 += rec(
        0x027E, cell_head(1, 4, 0) + struct.pack("<I", _rk_from_double(2.5))
    )
    # MULRK row 2, cols 0-2
    sh1 += rec(
        0x00BD,
        struct.pack("<HH", 2, 0)
        + struct.pack("<HI", 0, _rk_from_int(1))
        + struct.pack("<HI", 0, _rk_from_int(2))
        + struct.pack("<HI", 0, _rk_from_double(0.5))
        + struct.pack("<H", 2),
    )
    sh1 += rec(0x0205, cell_head(3, 0, 0) + b"\x01\x00")  # TRUE
    sh1 += rec(0x0205, cell_head(3, 1, 0) + b"\x00\x00")  # FALSE
    sh1 += rec(0x0205, cell_head(3, 2, 0) + b"\x07\x01")  # #DIV/0! -> None
    # LABEL (inline string, no SST)
    sh1 += rec(0x0204, cell_head(4, 0, 0) + unistr("inline"))
    # FORMULA cached number / cached string + STRING / cached bool
    sh1 += rec(
        0x0006,
        cell_head(5, 0, 0) + struct.pack("<d", 99.5) + struct.pack("<HI", 0, 0),
    )
    sh1 += rec(
        0x0006,
        cell_head(5, 1, 0)
        + b"\x00\x00\x00\x00\x00\x00\xff\xff"
        + struct.pack("<HI", 0, 0),
    )
    sh1 += rec(0x0207, unistr("fstr"))
    sh1 += rec(
        0x0006,
        cell_head(5, 2, 0)
        + b"\x01\x00\x01\x00\x00\x00\xff\xff"
        + struct.pack("<HI", 0, 0),
    )
    # dates: builtin XF 1 and custom XF 2 (2020-05-17 == serial 43968)
    sh1 += rec(0x027E, cell_head(6, 0, 1) + struct.pack("<I", _rk_from_int(43968)))
    sh1 += rec(0x0203, cell_head(6, 1, 2) + struct.pack("<d", 43968.5))
    # same serial under a TEXT xf stays numeric
    sh1 += rec(0x027E, cell_head(6, 2, 3) + struct.pack("<I", _rk_from_int(43968)))
    sh1 += rec(0x000A, b"")

    # --- sheet 2 -----------------------------------------------------
    sh2 = bof(0x0010)
    sh2 += rec(0x0203, cell_head(0, 0, 0) + struct.pack("<d", 7.0))
    sh2 += rec(0x000A, b"")

    # patch BOUNDSHEET stream positions
    off1 = len(glb)
    off2 = len(glb) + len(sh1)
    glb = glb.replace(bs1, rec(0x0085, struct.pack("<IBB", off1, 0, 0) + b"\x06\x00Sheet1"))
    glb = glb.replace(bs2, rec(0x0085, struct.pack("<IBB", off2, 0, 0) + b"\x06\x00Sheet2"))
    stream = glb + sh1 + sh2
    if pad_to_4096 and len(stream) < 4200:
        stream += rec(0x005C, b"\x00" * 112) * ((4200 - len(stream)) // 116 + 1)
    return stream


EXPECT_SHEET1 = [
    ["hello", "split–string", "tail", None, None],
    [3.25, 42, -7, 12.34, 2.5],
    [1, 2, 0.5, None, None],
    [True, False, None, None, None],
    ["inline", None, None, None, None],
    [99.5, "fstr", True, None, None],
    [
        dt.datetime(2020, 5, 17),
        dt.datetime(2020, 5, 17, 12, 0),
        43968,
        None,
        None,
    ],
]


@pytest.fixture(scope="module", params=[False, True], ids=["minifat", "fat"])
def xls_path(request, tmp_path_factory):
    data = make_cfb({"Workbook": build_workbook(pad_to_4096=request.param)})
    p = tmp_path_factory.mktemp("xls") / f"fixture_{request.param}.xls"
    p.write_bytes(data)
    return str(p)


def test_read_all_cell_kinds(xls_path):
    book = xls_biff.read_workbook(xls_path)
    assert list(book) == ["Sheet1", "Sheet2"]
    assert book["Sheet1"] == EXPECT_SHEET1
    assert book["Sheet2"] == [[7.0]]


def test_sheet_selection(xls_path):
    assert xls_biff.read_rows(xls_path, 1) == [[7.0]]
    assert xls_biff.read_rows(xls_path, "Sheet2") == [[7.0]]
    with pytest.raises(IndexError):
        xls_biff.read_rows(xls_path, 5)
    with pytest.raises(KeyError):
        xls_biff.read_rows(xls_path, "Nope")


def test_dates_off(xls_path):
    rows = xls_biff.read_rows(xls_path, 0, dates=False)
    assert rows[6][0] == 43968
    assert rows[6][1] == 43968.5


def test_not_cfb(tmp_path):
    p = tmp_path / "bad.xls"
    p.write_bytes(b"not an ole2 file at all")
    with pytest.raises(ValueError, match="magic"):
        xls_biff.read_rows(str(p))


def test_encrypted_raises(tmp_path):
    stream = bof(0x0005) + rec(0x002F, b"\x01\x00") + rec(0x000A, b"")
    p = tmp_path / "enc.xls"
    p.write_bytes(make_cfb({"Workbook": stream}))
    with pytest.raises(NotImplementedError, match="encrypted"):
        xls_biff.read_workbook(str(p))


def test_xls_store_integration(spark, tmp_path):
    """XLSStore reads legacy .xls end-to-end without xlrd."""
    glb = bof(0x0005)
    for fmt in (0,):
        glb += rec(0x00E0, struct.pack("<HHH", 0, fmt, 0) + b"\x00" * 14)
    sst = struct.pack("<II", 3, 3) + unistr("name") + unistr("n") + unistr("ada")
    glb += rec(0x00FC, sst)
    bs = rec(0x0085, struct.pack("<IBB", 0, 0, 0) + b"\x05\x00Data!")
    glb += bs + rec(0x000A, b"")
    sh = bof(0x0010)
    sh += rec(0x00FD, cell_head(0, 0, 0) + struct.pack("<I", 0))
    sh += rec(0x00FD, cell_head(0, 1, 0) + struct.pack("<I", 1))
    sh += rec(0x00FD, cell_head(1, 0, 0) + struct.pack("<I", 2))
    sh += rec(0x027E, cell_head(1, 1, 0) + struct.pack("<I", _rk_from_int(36)))
    sh += rec(0x000A, b"")
    glb = glb.replace(
        bs, rec(0x0085, struct.pack("<IBB", len(glb), 0, 0) + b"\x05\x00Data!")
    )
    (tmp_path / "people.xls").write_bytes(make_cfb({"Workbook": glb + sh}))

    from bubbles_spark.io import XLSStore

    df = XLSStore(spark, str(tmp_path)).get_object("people")
    rows = df.collect()
    assert df.columns == ["name", "n"]
    assert [(r[0], r[1]) for r in rows] == [("ada", 36)]
