"""Minimal xlsx writer for test fixtures (stdlib only).

Produces the subset of OOXML the engine's reader consumes: one
worksheet, numeric cells and t="str" string cells. Mirrors the shape
of the reference's real terminal/blacklist files (including the
ability to emit fully-empty rows, which those files contain)."""

from __future__ import annotations

import zipfile


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def write_xlsx(path: str, rows: list[list[object]]) -> None:
    cells_xml = []
    for r, row in enumerate(rows, start=1):
        cs = []
        for c, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_letter(c)}{r}"
            if isinstance(v, (int, float)):
                cs.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                cs.append(f'<c r="{ref}" t="str"><v>{v}</v></c>')
        cells_xml.append(f'<row r="{r}">{"".join(cs)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(cells_xml)}</sheetData></worksheet>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
