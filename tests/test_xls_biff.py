"""Tests for the native BIFF8 .xls decoder (extract/xls_biff.py).

A minimal BIFF8 *writer* lives here (test-only): it emits a real OLE2
compound file + Workbook record stream, so the reader is exercised on
genuine container bytes — both the regular-FAT layout (stream >= 4096)
and the mini-stream layout (stream < 4096), the SST CONTINUE spill,
and every cell record kind the reader supports.
"""

from __future__ import annotations

import struct

from etl_energy_tracker_spark.extract.i90_source import (
    detect_header_row,
    read_excel_grid,
    sheet_to_raw,
)
from etl_energy_tracker_spark.extract.xls_biff import (
    _parse_sst,
    _rk_value,
    read_xls_grid,
)

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0))


def _sst_string(s: str) -> bytes:
    try:
        raw = s.encode("latin-1")
        return struct.pack("<HB", len(s), 0) + raw
    except UnicodeEncodeError:
        return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def build_workbook_stream(
    sheets: list[tuple[str, dict[tuple[int, int], object]]],
    split_sst: bool = False,
) -> bytes:
    """Assemble globals (BOF + BOUNDSHEETs + SST + EOF) followed by one
    substream per sheet; BOUNDSHEET stream offsets patched in a second
    pass. String cells are interned into the SST."""
    strings: list[str] = []
    interned: dict[str, int] = {}

    def isst(s: str) -> int:
        if s not in interned:
            interned[s] = len(strings)
            strings.append(s)
        return interned[s]

    sheet_bodies: list[bytes] = []
    for _name, cells in sheets:
        body = b""
        for (r, c), v in sorted(cells.items()):
            if isinstance(v, str):
                body += _rec(
                    0x00FD, struct.pack("<HHHI", r, c, 0, isst(v))
                )
            elif isinstance(v, bool):
                body += _rec(0x0205, struct.pack("<HHHBB", r, c, 0, int(v), 0))
            elif isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
                rk = ((v & 0x3FFFFFFF) << 2) | 0x02
                body += _rec(0x027E, struct.pack("<HHHI", r, c, 0, rk))
            else:
                body += _rec(
                    0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", v)
                )
        sheet_bodies.append(_bof(0x0010) + body + _rec(0x000A, b""))

    sst_payload = struct.pack("<II", len(strings), len(strings)) + b"".join(
        _sst_string(s) for s in strings
    )
    if split_sst and len(sst_payload) > 12:
        cut = len(sst_payload) // 2
        # split at a byte boundary that is NOT inside character data of
        # a compressed string only if it lands between strings; for the
        # general mid-string case, re-emit the flag byte. To keep the
        # writer simple, split between whole string entries:
        pos = 8
        while pos < cut:
            cch = struct.unpack_from("<H", sst_payload, pos)[0]
            high = sst_payload[pos + 2] & 1
            pos += 3 + cch * (2 if high else 1)
        sst_recs = _rec(0x00FC, sst_payload[:pos]) + _rec(
            0x003C, sst_payload[pos:]
        )
    else:
        sst_recs = _rec(0x00FC, sst_payload)

    def boundsheet(name: str, pos: int) -> bytes:
        raw = name.encode("latin-1")
        return _rec(
            0x0085,
            struct.pack("<IBB", pos, 0, 0)
            + bytes([len(raw), 0])
            + raw,
        )

    # two-pass offset computation
    offsets = [0] * len(sheets)
    for _ in range(2):
        globals_part = (
            _bof(0x0005)
            + b"".join(
                boundsheet(name, offsets[i])
                for i, (name, _) in enumerate(sheets)
            )
            + sst_recs
            + _rec(0x000A, b"")
        )
        pos = len(globals_part)
        for i, body in enumerate(sheet_bodies):
            offsets[i] = pos
            pos += len(body)
    return globals_part + b"".join(sheet_bodies)


def _dir_entry(name: str, obj_type: int, start: int, size: int) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    assert len(raw) <= 64
    return (
        raw.ljust(64, b"\x00")
        + struct.pack("<H", len(raw))
        + bytes([obj_type, 1])
        + b"\x00" * 48
        + struct.pack("<IQ", start, size)
    )


def build_cfb(stream: bytes, force_mini: bool = False) -> bytes:
    """Wrap a Workbook stream in a minimal OLE2 container. Streams
    >= 4096 bytes (or not force_mini) go through the regular FAT;
    force_mini stores the stream in 64-byte mini sectors chained via
    the mini-FAT (requires len(stream) < 4096)."""
    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector size 512
    struct.pack_into("<H", header, 32, 6)  # mini sector size 64
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 68, FREESECT)  # first DIFAT
    struct.pack_into("<I", header, 72, 0)  # n DIFAT
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i, FREESECT)

    def pad(b: bytes) -> bytes:
        n = (len(b) + 511) // 512 * 512
        return b.ljust(n, b"\x00")

    if force_mini:
        assert len(stream) < 4096
        mini = stream.ljust((len(stream) + 63) // 64 * 64, b"\x00")
        n_mini = len(mini) // 64
        container = pad(mini)
        n_cont = len(container) // 512
        # sectors: 0=FAT, 1=dir, 2=miniFAT, 3..=ministream container
        fat = [FATSECT, ENDOFCHAIN, ENDOFCHAIN]
        fat += [3 + i + 1 for i in range(n_cont)]
        fat[-1] = ENDOFCHAIN
        fat += [FREESECT] * (128 - len(fat))
        minifat = [i + 1 for i in range(n_mini)]
        minifat[-1] = ENDOFCHAIN
        minifat += [FREESECT] * (128 - len(minifat))
        struct.pack_into("<I", header, 44, 1)  # n FAT sectors
        struct.pack_into("<I", header, 48, 1)  # first dir sector
        struct.pack_into("<I", header, 60, 2)  # first miniFAT sector
        struct.pack_into("<I", header, 64, 1)  # n miniFAT sectors
        struct.pack_into("<I", header, 76, 0)  # DIFAT[0] -> FAT at s0
        directory = pad(
            _dir_entry("Root Entry", 5, 3, len(mini))
            + _dir_entry("Workbook", 2, 0, len(stream))
        )
        body = (
            bytes(header)
            + b"".join(struct.pack("<I", s) for s in fat)
            + directory
            + b"".join(struct.pack("<I", s) for s in minifat)
            + container
        )
        return body

    padded = pad(stream)
    n_sect = len(padded) // 512
    # sectors: 0=FAT, 1=dir, 2..=stream
    fat = [FATSECT, ENDOFCHAIN] + [2 + i + 1 for i in range(n_sect)]
    fat[-1] = ENDOFCHAIN
    assert len(fat) <= 128, "test container supports <= 126 stream sectors"
    fat += [FREESECT] * (128 - len(fat))
    struct.pack_into("<I", header, 44, 1)
    struct.pack_into("<I", header, 48, 1)
    struct.pack_into("<I", header, 60, ENDOFCHAIN)
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 76, 0)
    directory = pad(
        _dir_entry("Root Entry", 5, ENDOFCHAIN, 0)
        + _dir_entry("Workbook", 2, 2, len(stream))
    )
    return (
        bytes(header)
        + b"".join(struct.pack("<I", s) for s in fat)
        + directory
        + padded
    )


def build_xls(
    sheets: list[tuple[str, dict[tuple[int, int], object]]],
    force_mini: bool = False,
    split_sst: bool = False,
) -> bytes:
    stream = build_workbook_stream(sheets, split_sst=split_sst)
    if not force_mini and len(stream) < 4096:
        stream = stream + b"\x00" * (4096 - len(stream))
    return build_cfb(stream, force_mini=force_mini)


I90_CELLS = {
    (0, 0): "Informe I90",
    (2, 0): "Unidad de Programación",
    (2, 1): "Sentido",
    (2, 2): "1",
    (2, 3): "2",
    (2, 4): "Total",
    (3, 0): "ABA1",
    (3, 1): "Subir",
    (3, 2): 10,
    (3, 3): 12.5,
    (3, 4): 22.5,
    (4, 0): "ACE3",
    (4, 1): "Bajar",
    (4, 2): -5,
    (4, 3): 0,
    (4, 4): -5,
}


def test_read_xls_grid_regular_fat():
    blob = build_xls([("Sheet1", I90_CELLS), ("Otra", {(0, 0): "x"})])
    grid = read_xls_grid(blob, "Sheet1")
    assert grid[0][0] == "Informe I90"
    assert grid[2][4] == "Total"
    assert grid[3][2] == 10 and grid[3][3] == 12.5 and grid[3][4] == 22.5
    assert grid[4][2] == -5 and grid[4][3] == 0
    assert grid[1][0] is None  # absent row padded
    assert read_xls_grid(blob, "Otra") == [["x"]]


def test_read_xls_grid_ministream():
    blob = build_xls([("S", {(0, 0): "mini", (0, 1): 7})], force_mini=True)
    assert read_xls_grid(blob, "S") == [["mini", 7]]


def test_sst_continue_and_unicode():
    cells = {(0, i): f"célula número {i}" for i in range(40)}
    blob = build_xls([("S", cells)], split_sst=True)
    grid = read_xls_grid(blob, "S")
    assert grid[0] == [f"célula número {i}" for i in range(40)]


def test_sst_mid_string_continue_respects_new_flag():
    # hand-built chunks: "ab" + "cdé" where the second string's chars
    # spill into a CONTINUE chunk that switches to utf-16
    first = struct.pack("<II", 2, 2)
    first += struct.pack("<HB", 2, 0) + b"ab"
    first += struct.pack("<HB", 3, 0) + b"cd"  # 1 char still owed
    second = b"\x01" + "é".encode("utf-16-le")  # new grbit: high bytes
    assert _parse_sst([first, second]) == ["ab", "cdé"]


def test_rk_encodings():
    assert _rk_value(((314 & 0x3FFFFFFF) << 2) | 0x02 | 0x01) == 3.14
    assert _rk_value(((-7 & 0x3FFFFFFF) << 2) | 0x02) == -7
    bits = struct.unpack("<Q", struct.pack("<d", 1.5))[0]
    assert _rk_value((bits >> 32) & ~0x3) == 1.5


def test_read_excel_grid_dispatches_on_magic():
    blob = build_xls([("Hoja", I90_CELLS)])
    grid = read_excel_grid(blob, "Hoja")
    assert detect_header_row(grid) == 2


def test_xls_to_raw_end_to_end(spark):
    """Full I90 path on a binary .xls: container -> grid -> header
    detect -> unpivot melt, matching the reference pipeline shape."""
    blob = build_xls([("I90DIA01", I90_CELLS)])
    grid = read_excel_grid(blob, "I90DIA01")
    df = sheet_to_raw(spark, grid, fecha="2024-03-01", sheet_id="01")
    rows = {
        (r["Unidad de Programación"], r.hora): r.volumenes
        for r in df.collect()
    }
    # zero/NA melt-dropped: ACE3 hour 2 (0) is absent
    assert rows == {
        ("ABA1", "1"): 10.0,
        ("ABA1", "2"): 12.5,
        ("ACE3", "1"): -5.0,
    }
    first = df.first()
    assert first.granularity == "Hora"
    assert first.fecha == "2024-03-01"


def test_xls_roundtrip_property():
    """Hypothesis round-trip: arbitrary grids of strings/ints/floats
    survive builder -> reader bit-exactly, across both container
    layouts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cell = st.one_of(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
            min_size=0,
            max_size=12,
        ),
        st.integers(min_value=-(1 << 29), max_value=(1 << 29) - 1),
        st.floats(
            allow_nan=False, allow_infinity=False, width=64,
            min_value=-1e12, max_value=1e12,
        ),
        st.booleans(),
    )

    @settings(max_examples=15, deadline=None)
    @given(
        st.dictionaries(
            st.tuples(
                st.integers(min_value=0, max_value=20),
                st.integers(min_value=0, max_value=8),
            ),
            cell,
            min_size=1,
            max_size=25,
        ),
        st.booleans(),
    )
    def run(cells, mini):
        blob = build_xls([("S", cells)], force_mini=mini)
        grid = read_xls_grid(blob, "S")
        for (r, c), v in cells.items():
            got = grid[r][c]
            if isinstance(v, bool):
                assert got is v
            elif isinstance(v, float) and v.is_integer():
                # NUMBER cells collapse integral doubles to int (same
                # convention as the xlsx reader's raw text numbers)
                assert got == int(v)
            else:
                assert got == v
        n_cols = max(c for _, c in cells) + 1
        assert all(len(row) == n_cols for row in grid)

    run()


def build_cfb_v4(stream: bytes) -> bytes:
    """Version-4 compound file: 4096-byte sectors, 512-byte header
    padded to one full sector of zeros. Per MS-CFB, sector n starts at
    (n + 1) * 4096 — the regression target for the offset fix (the old
    512 + n*sect_size put every v4 sector 3584 bytes early)."""
    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)
    struct.pack_into("<H", header, 26, 0x0004)  # major version 4
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 12)  # sector size 4096
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into("<I", header, 68, FREESECT)
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i, FREESECT)

    def pad4k(b: bytes) -> bytes:
        n = (len(b) + 4095) // 4096 * 4096
        return b.ljust(n, b"\x00")

    padded = pad4k(stream)
    n_sect = len(padded) // 4096
    fat = [FATSECT, ENDOFCHAIN] + [2 + i + 1 for i in range(n_sect)]
    fat[-1] = ENDOFCHAIN
    fat += [FREESECT] * (1024 - len(fat))
    struct.pack_into("<I", header, 44, 1)  # n FAT sectors
    struct.pack_into("<I", header, 48, 1)  # first dir sector
    struct.pack_into("<I", header, 60, ENDOFCHAIN)
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] -> FAT at s0
    directory = pad4k(
        _dir_entry("Root Entry", 5, ENDOFCHAIN, 0)
        + _dir_entry("Workbook", 2, 2, len(stream))
    )
    return (
        bytes(header).ljust(4096, b"\x00")  # header sector padded to 4 KiB
        + b"".join(struct.pack("<I", s) for s in fat)
        + directory
        + padded
    )


def test_read_xls_grid_v4_container():
    stream = build_workbook_stream([("Hoja", I90_CELLS)])
    if len(stream) < 4096:  # stay above the mini-stream cutoff
        stream = stream + b"\x00" * (4096 - len(stream))
    blob = build_cfb_v4(stream)
    grid = read_xls_grid(blob, "Hoja")
    assert grid[0][0] == "Informe I90"
    assert grid[2][4] == "Total"
    assert grid[3][3] == 12.5


def _biff5_rec_label(op: int, r: int, c: int, s: str, codec: str) -> bytes:
    raw = s.encode(codec)
    # BIFF5 cch is a CHARACTER count: equals byte count for single-byte
    # codepages, half the byte count under CODEPAGE 1200 (utf-16-le)
    cch = len(s) if codec == "utf-16-le" else len(raw)
    return _rec(op, struct.pack("<HHHH", r, c, 0, cch) + raw)


def build_biff5_stream(
    sheets: list[tuple[str, dict[tuple[int, int], object]]],
    codepage: int = 1252,
    codec: str = "cp1252",
) -> bytes:
    """BIFF5 (Excel 5/95) workbook stream: byte-string BOUNDSHEET
    names (u8 length, no grbit flag), inline LABEL cells (no SST),
    CODEPAGE-governed encodings."""
    sheet_bodies: list[bytes] = []
    for _name, cells in sheets:
        body = b""
        for (r, c), v in sorted(cells.items()):
            if isinstance(v, str):
                body += _biff5_rec_label(0x0204, r, c, v, codec)
            elif isinstance(v, bool):
                body += _rec(0x0205, struct.pack("<HHHBB", r, c, 0, int(v), 0))
            elif isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
                rk = ((v & 0x3FFFFFFF) << 2) | 0x02
                body += _rec(0x027E, struct.pack("<HHHI", r, c, 0, rk))
            else:
                body += _rec(
                    0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", v)
                )
        sheet_bodies.append(
            _rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0010, 0, 0))
            + body
            + _rec(0x000A, b"")
        )

    def boundsheet(name: str, pos: int) -> bytes:
        raw = name.encode(codec)
        cch = len(name) if codec == "utf-16-le" else len(raw)
        return _rec(
            0x0085,
            struct.pack("<IBB", pos, 0, 0) + bytes([cch]) + raw,
        )

    offsets = [0] * len(sheets)
    for _ in range(2):
        globals_part = (
            _rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
            + _rec(0x0042, struct.pack("<H", codepage))
            + b"".join(
                boundsheet(name, offsets[i])
                for i, (name, _) in enumerate(sheets)
            )
            + _rec(0x000A, b"")
        )
        pos = len(globals_part)
        for i, body in enumerate(sheet_bodies):
            offsets[i] = pos
            pos += len(body)
    return globals_part + b"".join(sheet_bodies)


def test_biff5_decodes_natively():
    """A BIFF5 workbook (BOF vers 0x0500, byte-string records, no
    SST) decodes natively — closing the last ingestion gap vs the
    reference's pandas/xlrd path (_descargador_i90.py:197-304)."""
    cells = dict(I90_CELLS)
    cells[(5, 0)] = "Año"  # non-ASCII through the cp1252 codepath
    stream = build_biff5_stream([("Hoja", cells), ("Otra", {(0, 0): "x"})])
    blob = build_cfb(stream + b"\x00" * 4096)
    grid = read_xls_grid(blob, "Hoja")
    assert grid[0][0] == "Informe I90"
    assert grid[2][0] == "Unidad de Programación"
    assert grid[2][4] == "Total"
    assert grid[3][2] == 10
    assert grid[3][3] == 12.5
    assert grid[4][2] == -5
    assert grid[5][0] == "Año"
    assert read_xls_grid(blob, "Otra")[0][0] == "x"
    # read_excel_grid routes OLE2 containers through the same decoder
    assert read_excel_grid(blob, "Hoja")[3][4] == 22.5


def test_biff5_codepage_1200_utf16_strings():
    """CODEPAGE 1200 makes BIFF5 byte strings utf-16-le; cch counts
    CHARACTERS at 2 bytes each, so the decoder must slice 2*cch bytes
    (a cch-byte slice halves and garbles every string)."""
    cells = {
        (0, 0): "Informe I90 — año 2024",
        (1, 0): "Total",
        (1, 1): 12.5,
    }
    stream = build_biff5_stream(
        [("Hoja añeja", cells)], codepage=1200, codec="utf-16-le"
    )
    blob = build_cfb(stream + b"\x00" * 4096)
    grid = read_xls_grid(blob, "Hoja añeja")
    assert grid[0][0] == "Informe I90 — año 2024"
    assert grid[1][0] == "Total"
    assert grid[1][1] == 12.5


def test_biff5_formula_string_and_rstring():
    """BIFF5 FORMULA string results (STRING record, byte-string) and
    RSTRING rich-text labels (trailing format runs outside cch)."""
    formula = _rec(
        0x0006,
        struct.pack("<HHH", 0, 0, 0)
        + b"\x00" + b"\x00" * 5 + b"\xff\xff"  # kind 0: string follows
        + b"\x00" * 8,
    )
    string_rec = _rec(0x0207, struct.pack("<H", 4) + b"hola")
    rstring = _rec(
        0x00D6,
        struct.pack("<HHHH", 1, 0, 0, 3) + b"abc" + b"\x00\x00\x00\x00",
    )
    body = (
        _rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0010, 0, 0))
        + formula + string_rec + rstring
        + _rec(0x000A, b"")
    )
    bs = _rec(0x0085, struct.pack("<IBB", 0, 0, 0) + bytes([1]) + b"S")
    globals_part = (
        _rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
        + bs
        + _rec(0x000A, b"")
    )
    # patch BOUNDSHEET offset now that globals length is known
    bs = _rec(
        0x0085,
        struct.pack("<IBB", len(globals_part), 0, 0) + bytes([1]) + b"S",
    )
    globals_part = (
        _rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
        + bs
        + _rec(0x000A, b"")
    )
    blob = build_cfb(globals_part + body + b"\x00" * 4096)
    grid = read_xls_grid(blob, "S")
    assert grid[0][0] == "hola"
    assert grid[1][0] == "abc"


def test_pre_biff5_raises_unsupported_and_falls_back():
    """A pre-Excel-5 workbook (BOF vers 0x0400) must raise the
    distinct UnsupportedBiffError — not misparse — and
    read_excel_grid must route it to the pandas fallback
    (NotImplementedError when openpyxl/xlrd are absent, never
    garbage rows)."""
    import pytest

    from etl_energy_tracker_spark.extract.xls_biff import (
        UnsupportedBiffError,
    )

    biff4_stream = (
        _rec(0x0809, struct.pack("<HHHH", 0x0400, 0x0005, 0, 0))
        + _rec(0x000A, b"")
    )
    blob = build_cfb(biff4_stream + b"\x00" * 4096)
    with pytest.raises(UnsupportedBiffError):
        read_xls_grid(blob, "Hoja")
    try:
        import openpyxl  # noqa: F401

        have_fallback = True
    except ImportError:
        have_fallback = False
    if not have_fallback:
        with pytest.raises(NotImplementedError):
            read_excel_grid(blob, "Hoja")


# ------------------------------------------------ property round-trips

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:
    # cp1252-safe printable text (shared by BIFF5 byte strings and the
    # BIFF8 writer's latin-1 SST arm); BIFF8 additionally exercises
    # the utf-16 arm via non-latin codepoints
    _cp1252_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=20,
    )
    _uni_text = st.text(
        alphabet=st.characters(
            min_codepoint=32, max_codepoint=0x2FFF, exclude_categories=("Cs",)
        ),
        min_size=0,
        max_size=20,
    )

    def _cell_values(text_strategy):
        return st.one_of(
            text_strategy,
            st.booleans(),
            st.integers(min_value=-(1 << 40), max_value=1 << 40),
            st.floats(
                allow_nan=False, allow_infinity=False, width=64,
                min_value=-1e12, max_value=1e12,
            ),
        )

    def _grids(text_strategy):
        return st.dictionaries(
            st.tuples(
                st.integers(min_value=0, max_value=40),
                st.integers(min_value=0, max_value=12),
            ),
            _cell_values(text_strategy),
            min_size=1,
            max_size=30,
        )

    def _expected(cells: dict) -> list[list]:
        n_rows = max(r for r, _ in cells) + 1
        n_cols = max(c for _, c in cells) + 1
        out = [[None] * n_cols for _ in range(n_rows)]
        for (r, c), v in cells.items():
            if isinstance(v, float) and v.is_integer():
                # NUMBER/RK records carry no int/float distinction; the
                # reader canonicalizes integral doubles to int (matching
                # read_xlsx_grid)
                v = int(v)
            out[r][c] = v
        return out

    @settings(max_examples=40, deadline=None)
    @given(cells=_grids(_uni_text))
    def test_biff8_roundtrip_property(cells):
        blob = build_xls([("Hoja", cells)])
        assert read_xls_grid(blob, "Hoja") == _expected(cells)

    @settings(max_examples=40, deadline=None)
    @given(cells=_grids(_cp1252_text))
    def test_biff5_roundtrip_property(cells):
        stream = build_biff5_stream([("Hoja", cells)])
        blob = build_cfb(stream + b"\x00" * 4096)
        assert read_xls_grid(blob, "Hoja") == _expected(cells)
