"""Minimal dependency-free .xlsx reader (stdlib zipfile + ElementTree).

riko's ``fetchtable`` reads spreadsheets via meza/xlrd
(riko/modules/fetchtable.py:102-138); no excel library ships in this
container, and xlsx is just a zip of SpreadsheetML parts — so the
subset riko's table semantics need (one sheet, header row, shared /
inline strings, numbers) is implemented directly.  Legacy binary .xls
(BIFF) is NOT covered — that format genuinely needs a real reader.
"""

from __future__ import annotations

import zipfile
import xml.etree.ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, ..., 'AA'→26 (cell ref like 'B12' accepted)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _cell_value(cell, shared: list[str]):
    kind = cell.get("t", "n")
    if kind == "inlineStr":
        node = cell.find(f"{_NS}is")
        return "".join(t.text or "" for t in node.iter(f"{_NS}t")) if node is not None else None
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if kind == "s":
        return shared[int(v.text)]
    if kind == "b":
        return "true" if v.text.strip() == "1" else "false"
    return v.text


def read_xlsx(path: str, sheet: int = 1, header: bool = True) -> list[dict]:
    """Read sheet N of an .xlsx into a list of dicts (header row as
    keys; everything stays a string, riko/meza style)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        try:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_NS}t"))
                for si in root.iter(f"{_NS}si")
            ]
        except KeyError:
            pass
        sheet_xml = z.read(f"xl/worksheets/sheet{sheet}.xml")

    grid: list[dict[int, object]] = []
    for row in ET.fromstring(sheet_xml).iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for pos, cell in enumerate(row.findall(f"{_NS}c")):
            ref = cell.get("r")
            idx = _col_index(ref) if ref else pos
            cells[idx] = _cell_value(cell, shared)
        grid.append(cells)
    if not grid:
        return []

    width = max(max(r) + 1 for r in grid if r)
    dense = [[r.get(i) for i in range(width)] for r in grid]
    if header:
        head = [str(h) if h is not None else f"col{i}" for i, h in enumerate(dense[0])]
        body = dense[1:]
    else:
        head = [f"col{i}" for i in range(width)]
        body = dense
    return [dict(zip(head, row)) for row in body]
