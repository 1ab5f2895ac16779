"""Minimal stdlib .xlsx writer (zip of OOXML parts) — no openpyxl.

The reference's ``_save_sheets`` (qa_model.py:388-436) emits per-cell
(label, prediction, exact, f1, prob) pivots via ``DataFrame.to_excel``;
this container ships no openpyxl, so the sheet sink needs its own
SpreadsheetML serializer.  Scope: string + number cells, one or more
worksheets, inline strings (no shared-string table) — exactly what a
pivot report needs.  Output opens in Excel/LibreOffice and is
round-trip-testable with ``zipfile`` + ``ElementTree``.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple
from xml.sax.saxutils import escape
from zipfile import ZIP_DEFLATED, ZipFile

import numpy as np

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_CT_NS = "http://schemas.openxmlformats.org/package/2006/content-types"


def col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters (0->A, 26->AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, (bool, np.bool_)):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float, np.integer, np.floating)):
        # numpy scalars are NOT int/float subclasses — without the
        # np checks an np.int64 lands in the inlineStr branch as text
        value = value.item() if isinstance(value, np.generic) else value
        # NaN/inf have no numeric cell representation -> blank
        if isinstance(value, float) and (value != value or value in (
            float("inf"), float("-inf")
        )):
            return f'<c r="{ref}"/>'
        return f'<c r="{ref}" t="n"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _sheet_xml(header: Sequence, rows: Iterable[Sequence]) -> str:
    parts: List[str] = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS}"><sheetData>',
    ]
    for r_idx, row in enumerate([list(header), *map(list, rows)], start=1):
        cells = "".join(
            _cell_xml(f"{col_letter(c)}{r_idx}", v) for c, v in enumerate(row)
        )
        parts.append(f'<row r="{r_idx}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(
    path: str,
    sheets: Dict[str, Tuple[Sequence, Iterable[Sequence]]],
) -> str:
    """Write ``{sheet_name: (header, rows)}`` to ``path`` as .xlsx.

    Rows may be any iterable of sequences; values may be str, int,
    float, bool or None.  Sheet order follows dict order (the
    reference's one-sheet-per-document-class layout).
    """
    if not sheets:
        raise ValueError("write_xlsx needs at least one sheet")
    names = list(sheets)
    with ZipFile(path, "w", ZIP_DEFLATED) as z:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            f'ContentType="application/vnd.openxmlformats-officedocument'
            f'.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Types xmlns="{_CT_NS}">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
            f'"/>{overrides}</Types>',
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_PKG_REL_NS}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        sheet_tags = "".join(
            f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_NS}" xmlns:r="{_REL_NS}">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_PKG_REL_NS}">{rels}</Relationships>',
        )
        for i, name in enumerate(names):
            header, rows = sheets[name]
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(header, rows))
    return path


def read_xlsx_cells(path: str) -> Dict[str, List[List]]:
    """Parse an .xlsx written by :func:`write_xlsx` back into
    ``{sheet_name: [[row values]]}`` — the test-side round-trip reader
    (inline strings + numeric cells only)."""
    import xml.etree.ElementTree as ET

    out: Dict[str, List[List]] = {}
    with ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [
            s.attrib["name"] for s in wb.iter(f"{{{_NS}}}sheet")
        ]
        for i, name in enumerate(names):
            root = ET.fromstring(z.read(f"xl/worksheets/sheet{i + 1}.xml"))
            rows: List[List] = []
            for row in root.iter(f"{{{_NS}}}row"):
                vals: List = []
                for c in row.iter(f"{{{_NS}}}c"):
                    t = c.attrib.get("t")
                    if t == "inlineStr":
                        node = c.find(f"{{{_NS}}}is/{{{_NS}}}t")
                        vals.append(node.text or "" if node is not None else "")
                    elif t == "b":
                        v = c.find(f"{{{_NS}}}v")
                        vals.append(bool(int(v.text)) if v is not None else None)
                    else:
                        v = c.find(f"{{{_NS}}}v")
                        vals.append(float(v.text) if v is not None else None)
                rows.append(vals)
            out[name] = rows
    return out
