"""Minimal XLSX reader/writer — pure ``zipfile`` + XML (the OOXML
SpreadsheetML format is a public ECMA-376 standard), no openpyxl
dependency.

The reference's default report sink is xlsx (``pd_save_dataframe``,
``_gui.py:350-352``) and its Excel loader selects sheets with a
``path!sheet`` suffix (``_gui.py:141-148, 937-952``); this module makes
both work in containers without Excel libraries.  Supported subset:
single-table sheets, inline/shared strings, numbers, bools — no styles,
formulas, or dates (report tables need none of those).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_to_idx(ref: str) -> int:
    """'A'->0, 'AB'->27 (cell reference column part)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _idx_to_col(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def read_xlsx(path: str, sheet: "str | int | None" = None):
    """XLSX -> list-of-rows (first row = header candidates); values are
    str/float/bool/None.  ``sheet`` may be a name, 0-based index, or
    None (first sheet)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        # resolve each sheet's worksheet part through the RELATIONSHIP id
        # (r:id -> xl/_rels/workbook.xml.rels Target): sheetN.xml
        # numbering does NOT track workbook order once sheets have been
        # deleted or reordered, so positional mapping reads the wrong
        # part or a missing one
        rid_attr = (
            "{http://schemas.openxmlformats.org/officeDocument/2006/"
            "relationships}id"
        )
        rels = {}
        rels_part = "xl/_rels/workbook.xml.rels"
        if rels_part in z.namelist():
            for rel in ET.fromstring(z.read(rels_part)):
                t = rel.get("Target", "")
                if t.startswith("/"):
                    # absolute part path (permitted by OPC): zip names
                    # have no leading slash
                    t = t[1:]
                elif not t.startswith("xl/"):
                    t = f"xl/{t}"
                rels[rel.get("Id")] = t
        sheets = []
        for i, s in enumerate(wb.iter(f"{_NS}sheet")):
            part = rels.get(s.get(rid_attr), f"xl/worksheets/sheet{i + 1}.xml")
            sheets.append((s.get("name"), part))
        if sheet is None:
            target = sheets[0]
        elif isinstance(sheet, int):
            target = sheets[sheet]
        else:
            target = next(s for s in sheets if s[0] == str(sheet))
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        data = ET.fromstring(z.read(target[1]))
    rows: list[list] = []
    for row in data.iter(f"{_NS}row"):
        out: list = []
        for c in row.iter(f"{_NS}c"):
            idx = _col_to_idx(re.sub(r"\d", "", c.get("r", "")))
            while len(out) < idx:
                out.append(None)
            t = c.get("t", "n")
            v = c.find(f"{_NS}v")
            is_el = c.find(f"{_NS}is")
            if t == "s" and v is not None:
                out.append(shared[int(v.text)])
            elif t == "inlineStr" and is_el is not None:
                out.append("".join(x.text or "" for x in is_el.iter(f"{_NS}t")))
            elif t == "b" and v is not None:
                out.append(v.text == "1")
            elif t == "str" and v is not None:
                out.append(v.text or "")  # formula's cached STRING result
            elif t == "e":
                out.append(None)  # error value (#DIV/0! etc.)
            elif v is not None:
                out.append(float(v.text))
            else:
                out.append(None)
        rows.append(out)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def read_xlsx_pdf(path: str, sheet=None):
    """XLSX -> pandas DataFrame (first row as header)."""
    import pandas as pd

    rows = read_xlsx(path, sheet)
    if not rows:
        return pd.DataFrame()
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    return pd.DataFrame(rows[1:], columns=header)


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        if v != v:  # NaN
            return ""
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'


def write_xlsx(tables, path: str) -> None:
    """Write tables to an xlsx file.  ``tables`` is ``{sheet_name:
    pandas-like-DataFrame}`` (anything with ``.columns`` and
    ``.itertuples``) — the multi-sheet counterpart of the reference's
    ``pd_save_excel_tables`` (``_gui.py:954-988``)."""
    sheet_xml = {}
    for si, (name, pdf) in enumerate(tables.items(), start=1):
        rows_xml = []
        header = "".join(
            _cell_xml(f"{_idx_to_col(ci)}1", str(c))
            for ci, c in enumerate(pdf.columns)
        )
        rows_xml.append(f'<row r="1">{header}</row>')
        for ri, row in enumerate(pdf.itertuples(index=False), start=2):
            cells = "".join(
                _cell_xml(f"{_idx_to_col(ci)}{ri}", v) for ci, v in enumerate(row)
            )
            rows_xml.append(f'<row r="{ri}">{cells}</row>')
        sheet_xml[si] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(rows_xml)
            + "</sheetData></worksheet>"
        )

    names = list(tables)
    sheets_decl = "".join(
        f'<sheet name="{escape(n, {chr(34): "&quot;"})}" '
        f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        f'relationships"><sheets>{sheets_decl}</sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
        'package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for si, xml in sheet_xml.items():
            z.writestr(f"xl/worksheets/sheet{si}.xml", xml)
