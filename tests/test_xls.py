"""Legacy .xls (BIFF8) reader tests.

The fixture writer below emits spec-conformant MS-CFB + BIFF8 bytes
(header/FAT/directory/miniFAT laid out per MS-CFB 2.2-2.6; records per
MS-XLS) — small workbooks land in the root entry's ministream exactly
as the spec requires (< 4096 bytes), large ones chain through the FAT,
so both container paths of riko_spark/functions/xls.py are exercised.
The reference reads .xls via meza/xlrd (riko/modules/fetchtable.py:
102-138) but ships no .xls fixture, hence the generated one.
"""

import struct

import pytest

from riko_spark.functions.xls import read_xls, _parse_sst

FREE, END, FATSECT = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD


# ------------------------------------------------------------ BIFF writer

def _rec(op, payload):
    return struct.pack("<HH", op, len(payload)) + payload


def _unistr(s):
    try:
        return struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    except UnicodeEncodeError:
        return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def make_workbook(rows, sst_pad=0):
    """BIFF8 workbook stream: globals (BOF, SST, BOUNDSHEET, EOF) +
    one worksheet (LABELSST / NUMBER / RK / BOOLERR cells)."""
    strings, index, cells = [], {}, []

    def sid(s):
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    rk_done = False
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                cells.append(_rec(0x0205, struct.pack("<HHHBB", r, c, 0, int(v), 0)))
            elif isinstance(v, int) and not rk_done and -(2**29) <= v < 2**29:
                # exercise the RK integer encoding on the first int cell
                cells.append(_rec(0x027E, struct.pack("<HHHI", r, c, 0,
                                                      ((v << 2) & 0xFFFFFFFF) | 0x02)))
                rk_done = True
            elif isinstance(v, (int, float)):
                cells.append(_rec(0x0203, struct.pack("<HHHd", r, c, 0, float(v))))
            else:
                cells.append(_rec(0x00FD, struct.pack("<HHHI", r, c, 0, sid(str(v)))))
    for i in range(sst_pad):
        sid(f"pad_{i:06d}")

    sst = struct.pack("<II", len(strings), len(strings)) + b"".join(
        _unistr(s) for s in strings
    )
    bof_g = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0))
    bof_s = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))
    eof = _rec(0x000A, b"")
    name = b"Sheet1"

    def globals_bytes(off):
        bs = _rec(0x0085, struct.pack("<IHBB", off, 0, len(name), 0) + name)
        return bof_g + bs + _rec(0x00FC, sst) + eof

    g = globals_bytes(0)
    g = globals_bytes(len(g))  # BOUNDSHEET.lbPlyPos = sheet BOF offset
    return g + bof_s + b"".join(cells) + eof


def _dirent(name, typ, start, size, child=FREE):
    nm = name.encode("utf-16-le") + b"\x00\x00"
    return (nm + b"\x00" * (64 - len(nm))
            + struct.pack("<HBB", len(nm), typ, 1)
            + struct.pack("<III", FREE, FREE, child)
            + b"\x00" * 36
            + struct.pack("<IQ", start, size))


def _pad(b, size):
    return b + b"\x00" * (-len(b) % size)


def _fat_sector(entries):
    return struct.pack(f"<{len(entries)}I", *entries) + struct.pack(
        "<I", FREE) * (128 - len(entries))


def _fat_sector_sized(entries, size):
    per = size // 4
    return struct.pack(f"<{len(entries)}I", *entries) + struct.pack(
        "<I", FREE) * (per - len(entries))


def make_cfb(stream, version=3):
    """Wrap a workbook stream into a compound file.  Streams under the
    4096-byte cutoff go through the ministream + miniFAT (as the spec
    mandates); larger ones chain directly through the FAT.  version=4
    emits 4096-byte sectors (sector shift 0x000C) with the mandatory
    zero padding after the 512-byte header."""
    shift = 9 if version == 3 else 12
    size = 1 << shift
    small = len(stream) < 4096
    if small:
        mini = _pad(stream, 64)
        ms_sectors = _pad(mini, size)
        n_ms = len(ms_sectors) // size
        # sector map: 0=FAT, 1=directory, 2=miniFAT, 3..=ministream
        fat = [FATSECT, END, END] + [3 + i + 1 for i in range(n_ms - 1)] + [END]
        n_minisec = len(mini) // 64
        minifat = list(range(1, n_minisec)) + [END]
        root = _dirent("Root Entry", 5, 3, len(mini), child=1)
        wb = _dirent("Workbook", 2, 0, len(stream))
        body = (_fat_sector_sized(fat, size) + _pad(root + wb, size)
                + _fat_sector_sized(minifat, size) + ms_sectors)
        first_mini, n_mini = 2, 1
    else:
        data = _pad(stream, size)
        n_s = len(data) // size
        assert n_s <= size // 4 - 3, "fixture writer: one FAT sector only"
        fat = [FATSECT, END] + [2 + i + 1 for i in range(n_s - 1)] + [END]
        root = _dirent("Root Entry", 5, END, 0, child=1)
        wb = _dirent("Workbook", 2, 2, len(stream))
        body = _fat_sector_sized(fat, size) + _pad(root + wb, size) + data
        first_mini, n_mini = END, 0
    header = (
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
        + struct.pack("<HHHHH", 0x003E, 3 if version == 3 else 4,
                      0xFFFE, shift, 6)
        + b"\x00" * 6
        + struct.pack("<IIIIIIII", 0, 1, 1, 0, 4096, first_mini, n_mini, END)
        + struct.pack("<I", 0)
        + struct.pack("<I", 0) + struct.pack("<I", FREE) * 108
    )
    # DIFAT[0] = FAT sector 0; fix the first DIFAT slot
    header = header[:76] + struct.pack("<I", 0) + header[80:]
    assert len(header) == 512
    if version == 4:
        header = header + b"\x00" * (4096 - 512)  # sector 0 at offset 4096
    return header + body


ROWS = [
    ["name", "qty", "price", "ok"],
    ["widget", 3, 9.75, True],
    ["naïve-ünïcode", 1200000, 42.0, False],
]


# ---------------------------------------------------------------- tests

def _write(tmp_path, rows, sst_pad=0):
    p = tmp_path / "t.xls"
    p.write_bytes(make_cfb(make_workbook(rows, sst_pad=sst_pad)))
    return str(p)


def test_read_xls_ministream(tmp_path):
    got = read_xls(_write(tmp_path, ROWS))
    assert got == [
        {"name": "widget", "qty": "3", "price": "9.75", "ok": "true"},
        {"name": "naïve-ünïcode", "qty": "1200000", "price": "42", "ok": "false"},
    ]


def test_read_xls_v4_container(tmp_path):
    """4096-byte-sector (version 4) compound files parse via the
    header's sector-shift field."""
    p = tmp_path / "v4.xls"
    p.write_bytes(make_cfb(make_workbook(ROWS), version=4))
    got = read_xls(str(p))
    assert got[0]["name"] == "widget" and got[1]["ok"] == "false"


def test_read_xls_fat_path(tmp_path):
    # ~6.5 KB of SST padding pushes the stream past the 4096 cutoff
    path = _write(tmp_path, ROWS, sst_pad=500)
    got = read_xls(path)
    assert got[0]["name"] == "widget" and got[1]["qty"] == "1200000"


def test_read_xls_no_header(tmp_path):
    got = read_xls(_write(tmp_path, ROWS), header=False)
    assert got[0] == {"col0": "name", "col1": "qty", "col2": "price", "col3": "ok"}
    assert len(got) == 3


def test_read_xls_bad_magic(tmp_path):
    p = tmp_path / "bad.xls"
    p.write_bytes(b"not an ole file" * 40)
    with pytest.raises(ValueError, match="magic"):
        read_xls(str(p))


def test_sst_continue_split():
    """A shared string split across a CONTINUE restarts with a fresh
    grbit byte (MS-XLS 2.5.293) — including a compressed→utf16 flip."""
    s1, s2 = "alpha" * 4, "βravo"  # second forces utf-16 in part 2
    first = struct.pack("<II", 2, 2) + struct.pack("<HB", len(s1), 0) + s1[:8].encode()
    cont = (b"\x00" + s1[8:].encode()
            + struct.pack("<HB", len(s2), 1) + s2.encode("utf-16-le"))
    assert _parse_sst(first, [cont]) == [s1, s2]


def test_sst_header_straddles_continue():
    """cch/flags header split across the CONTINUE boundary: the unread
    tail byte must be carried into the next part (no grbit restart for
    mid-header splits), not dropped — dropping it desynchronises every
    following shared string."""
    s1, s2, s3 = "first", "second", "third"
    body1 = struct.pack("<HB", len(s1), 0) + s1.encode()
    hdr2 = struct.pack("<HB", len(s2), 0)
    # part 1 ends after ONE byte of s2's 3-byte header
    first = struct.pack("<II", 3, 3) + body1 + hdr2[:1]
    cont = (hdr2[1:] + s2.encode()
            + struct.pack("<HB", len(s3), 0) + s3.encode())
    assert _parse_sst(first, [cont]) == [s1, s2, s3]

    # split after TWO header bytes (cch complete, flags missing)
    first2 = struct.pack("<II", 3, 3) + body1 + hdr2[:2]
    cont2 = (hdr2[2:] + s2.encode()
             + struct.pack("<HB", len(s3), 0) + s3.encode())
    assert _parse_sst(first2, [cont2]) == [s1, s2, s3]


def test_sst_truncated_header_raises():
    """A header cut off with no following CONTINUE is a clear error,
    not silent garbage."""
    s1 = "ok"
    first = (struct.pack("<II", 2, 2)
             + struct.pack("<HB", len(s1), 0) + s1.encode()
             + b"\x05")  # orphan first byte of the next header
    with pytest.raises(ValueError, match="truncated"):
        _parse_sst(first, [])


def test_fetchtable_reads_xls(spark, tmp_path):
    from riko_spark.operators.webtext import fetchtable_op

    path = _write(tmp_path, ROWS)
    df = fetchtable_op(None, {"url": path}, spark=spark)
    rows = [r.asDict() for r in df.orderBy("name").collect()]
    assert rows == [
        {"name": "naïve-ünïcode", "qty": "1200000", "price": "42", "ok": "false"},
        {"name": "widget", "qty": "3", "price": "9.75", "ok": "true"},
    ]
