"""Minimal dependency-free legacy ``.xls`` (BIFF8) reader, stdlib only.

riko's ``fetchtable`` reads spreadsheets via meza/xlrd
(riko/modules/fetchtable.py:102-138); no excel library ships in this
container, so the subset riko's table semantics need — one sheet,
header row, shared/inline strings, numbers — is implemented directly,
mirroring :mod:`riko_spark.functions.xlsx` for the modern format.

Two layers, both tiny because the scope is bounded:

* **CFB container** (MS-CFB): the compound-file directory is walked to
  the ``Workbook``/``Book`` stream; streams under the 4096-byte cutoff
  live in the root entry's ministream (64-byte minisectors chained
  through the miniFAT), larger ones chain through the FAT directly.
* **BIFF8 records** (MS-XLS): globals substream → SST (shared strings,
  with CONTINUE re-splits) + BOUNDSHEET (sheet name/offset); worksheet
  substream → LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR cells.

Values stay strings (riko/meza style); integral floats render without
the trailing ``.0`` so ``42`` round-trips like the csv/xlsx paths.
"""

from __future__ import annotations

import struct

_FREE = 0xFFFFFFFF
_END = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


# ------------------------------------------------------------- container

def _sector(data: bytes, n: int, size: int = 512) -> bytes:
    # sector 0 starts after the 512-byte header regardless of sector
    # size (MS-CFB 2.2: v4 files with 4096-byte sectors still have a
    # 512-byte header; the rest of sector "-1" is unused padding)
    base = max(512, size)
    return data[base + n * size: base + (n + 1) * size]


def _chain(fat: list[int], start: int) -> list[int]:
    out, s = [], start
    while s not in (_END, _FREE) and s < len(fat):
        out.append(s)
        s = fat[s]
        if len(out) > len(fat):  # defensive: cyclic chain in a bad file
            raise ValueError("xls: cyclic sector chain")
    return out


def _u32s(raw: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(raw) // 4}I", raw))


def workbook_stream(data: bytes) -> bytes:
    """The Workbook/Book stream bytes out of a CFB compound file.
    Honors the header's sector-shift fields, so both v3 (512-byte
    sectors) and v4 (4096-byte) containers parse."""
    if data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise ValueError("not an OLE2/CFB file (bad magic)")
    sec_shift, mini_shift = struct.unpack("<HH", data[30:34])
    size = 1 << sec_shift  # 512 (v3) or 4096 (v4)
    mini_size = 1 << mini_shift  # 64
    (n_fat, first_dir, _, cutoff, first_mini, n_mini, first_difat,
     n_difat) = struct.unpack("<IIIIIIII", data[44:76])
    # FAT sector list: 109 refs in the header, then chained DIFAT sectors
    difat = _u32s(data[76:512])
    s = first_difat
    for _ in range(n_difat):
        raw = _sector(data, s, size)
        difat.extend(_u32s(raw[:-4]))
        s = struct.unpack("<I", raw[-4:])[0]
    fat: list[int] = []
    for ref in [r for r in difat if r != _FREE][:n_fat]:
        fat.extend(_u32s(_sector(data, ref, size)))

    entries = []
    for ds in _chain(fat, first_dir):
        raw = _sector(data, ds, size)
        for off in range(0, size, 128):
            e = raw[off: off + 128]
            name_len = struct.unpack("<H", e[64:66])[0]
            if not name_len:
                continue
            name = e[: max(0, name_len - 2)].decode("utf-16-le", "replace")
            e_start, e_size = struct.unpack("<IQ", e[116:128])
            entries.append((name, e[66], e_start, e_size))

    root = next(e for e in entries if e[1] == 5)
    wb = next((e for e in entries if e[0] in ("Workbook", "Book")), None)
    if wb is None:
        raise ValueError("xls: no Workbook/Book stream in container")
    _, _, start, wb_size = wb
    if wb_size < cutoff:
        mini = b"".join(_sector(data, s, size) for s in _chain(fat, root[2]))
        minifat: list[int] = []
        for ms in _chain(fat, first_mini)[:n_mini]:
            minifat.extend(_u32s(_sector(data, ms, size)))
        out = b"".join(
            mini[m * mini_size: (m + 1) * mini_size]
            for m in _chain(minifat, start)
        )
    else:
        out = b"".join(_sector(data, s, size) for s in _chain(fat, start))
    return out[:wb_size]


# --------------------------------------------------------------- records

def _records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield pos, op, stream[pos + 4: pos + 4 + ln]
        pos += 4 + ln


def _read_unistr(buf: bytes, pos: int, cch: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString at ``pos`` (cch already consumed):
    returns (text, next_pos).  Handles rich-run/ext-rst skips; the
    caller handles CONTINUE boundaries (SST only, below)."""
    flags = buf[pos]
    pos += 1
    runs = ext = 0
    if flags & 0x08:
        runs = struct.unpack_from("<H", buf, pos)[0]
        pos += 2
    if flags & 0x04:
        ext = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
    if flags & 0x01:
        text = buf[pos: pos + 2 * cch].decode("utf-16-le", "replace")
        pos += 2 * cch
    else:
        text = buf[pos: pos + cch].decode("latin-1")
        pos += cch
    return text, pos + runs * 4 + ext


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """SST record + its CONTINUE payloads → shared-string list.  A
    string split across a CONTINUE restarts with a fresh grbit byte
    (MS-XLS 2.5.293) — handled by re-entering char decode per part."""
    cst_unique = struct.unpack_from("<I", payload, 4)[0]
    parts = [payload[8:]] + continues
    strings: list[str] = []
    ip, pos = 0, 0
    need = 0  # chars still to read for the string in flight
    high = False
    cur = ""
    trail = 0  # rich/ext bytes to skip after chars
    while len(strings) < cst_unique or need:
        if ip >= len(parts):
            break
        buf = parts[ip]
        if pos >= len(buf):
            ip += 1
            pos = 0
            continue
        if need == 0 and trail == 0:
            # The fixed header is cch(2)+flags(1) plus optional
            # runs(2)/ext(4) fields.  When it straddles a CONTINUE
            # boundary the unread tail bytes must be CARRIED into the
            # next part (a mid-header split has no grbit restart byte —
            # that only applies to character-array splits), never
            # dropped: dropping them desynchronises every following
            # shared string.
            hdr = None
            if pos + 3 <= len(buf):
                fpeek = buf[pos + 2]
                hdr = (3 + (2 if fpeek & 0x08 else 0)
                       + (4 if fpeek & 0x04 else 0))
            if hdr is None or pos + hdr > len(buf):
                if ip + 1 < len(parts):
                    parts[ip + 1] = buf[pos:] + parts[ip + 1]
                    ip += 1
                    pos = 0
                    continue
                raise ValueError(
                    "xls SST truncated inside a shared-string header "
                    f"(string {len(strings)} of {cst_unique})"
                )
            cch = struct.unpack_from("<H", buf, pos)[0]
            flags = buf[pos + 2]
            pos += 3
            runs = ext = 0
            if flags & 0x08:
                runs = struct.unpack_from("<H", buf, pos)[0]
                pos += 2
            if flags & 0x04:
                ext = struct.unpack_from("<I", buf, pos)[0]
                pos += 4
            need, high, cur, trail = cch, bool(flags & 0x01), "", runs * 4 + ext
        elif need == 0 and trail:
            take = min(trail, len(buf) - pos)
            pos += take
            trail -= take
            if trail == 0:
                strings.append(cur)
            continue
        avail = (len(buf) - pos) // (2 if high else 1)
        take = min(need, avail)
        if high:
            cur += buf[pos: pos + 2 * take].decode("utf-16-le", "replace")
            pos += 2 * take
        else:
            cur += buf[pos: pos + take].decode("latin-1")
            pos += take
        need -= take
        if need == 0 and trail == 0:
            strings.append(cur)
        elif need:
            # continue boundary: next part restarts with a grbit byte
            ip += 1
            pos = 0
            if ip < len(parts):
                high = bool(parts[ip][0] & 0x01)
                parts[ip] = parts[ip][1:]
    return strings


def _rk_value(rk: int) -> float:
    val: float
    if rk & 0x02:  # fInt: signed 30-bit integer
        val = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFC))[0] >> 2)
    else:  # high 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100 if rk & 0x01 else val


def _num_str(v: float) -> str:
    return str(int(v)) if float(v).is_integer() and abs(v) < 1e15 else repr(v)


def read_xls(path: str, sheet: int = 1, header: bool = True) -> list[dict]:
    """Read sheet N of a BIFF8 .xls into a list of dicts (header row as
    keys; everything stays a string, riko/meza style) — the same
    contract as :func:`riko_spark.functions.xlsx.read_xlsx`."""
    with open(path, "rb") as fh:
        stream = workbook_stream(fh.read())

    sst: list[str] = []
    sheets: list[int] = []  # BOF offsets per BOUNDSHEET order
    recs = _records(stream)
    for pos, op, payload in recs:
        if op == 0x00FC:  # SST — gather its CONTINUEs
            continues = []
            nxt = pos + 4 + len(payload)
            for _, op2, pay2 in _records(stream, nxt):
                if op2 != 0x003C:
                    break
                continues.append(pay2)
            sst = _parse_sst(payload, continues)
        elif op == 0x0085:  # BOUNDSHEET
            sheets.append(struct.unpack_from("<I", payload, 0)[0])
        elif op == 0x000A:  # EOF of the globals substream
            break
    if not 1 <= sheet <= len(sheets):
        raise ValueError(f"xls: sheet {sheet} of {len(sheets)}")

    cells: dict[tuple[int, int], str | None] = {}
    started = False
    for _, op, payload in _records(stream, sheets[sheet - 1]):
        if op == 0x0809:
            if started:
                break
            started = True
        elif op == 0x000A and started:
            break
        elif op == 0x00FD:  # LABELSST
            rw, col, _, isst = struct.unpack_from("<HHHI", payload)
            cells[rw, col] = sst[isst] if isst < len(sst) else None
        elif op == 0x0204:  # LABEL (inline string)
            rw, col, _, cch = struct.unpack_from("<HHHH", payload)
            cells[rw, col] = _read_unistr(payload, 8, cch)[0]
        elif op == 0x0203:  # NUMBER
            rw, col, _ = struct.unpack_from("<HHH", payload)
            cells[rw, col] = _num_str(struct.unpack_from("<d", payload, 6)[0])
        elif op == 0x027E:  # RK
            rw, col, _, rk = struct.unpack_from("<HHHI", payload)
            cells[rw, col] = _num_str(_rk_value(rk))
        elif op == 0x00BD:  # MULRK
            rw, col0 = struct.unpack_from("<HH", payload)
            for i in range((len(payload) - 6) // 6):
                rk = struct.unpack_from("<I", payload, 6 + i * 6)[0]
                cells[rw, col0 + i] = _num_str(_rk_value(rk))
        elif op == 0x0205:  # BOOLERR
            rw, col, _, val, is_err = struct.unpack_from("<HHHBB", payload)
            cells[rw, col] = None if is_err else ("true" if val else "false")

    if not cells:
        return []
    rows = sorted({r for r, _ in cells})
    cols = range(min(c for _, c in cells), max(c for _, c in cells) + 1)
    grid = [[cells.get((r, c)) for c in cols] for r in rows]
    if header:
        keys = [k if k is not None else f"col{i}" for i, k in enumerate(grid[0])]
        return [dict(zip(keys, row)) for row in grid[1:]]
    return [{f"col{i}": v for i, v in enumerate(row)} for row in grid]
