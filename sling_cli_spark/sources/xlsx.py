"""Zero-dependency xlsx reader/writer (stdlib zipfile + xml.etree).

Reference: ``core/dbio/iop/sheet_excel.go`` (~450 LoC over excelize).
Neither openpyxl nor xlsxwriter ships in this environment, but xlsx is
just a zip of XML parts — the subset sling needs (one sheet of typed
scalar cells, shared strings, A1 ranges) is small enough to implement
directly, which activates the Excel reader/writer instead of gating it.

Format notes (ECMA-376 / OOXML, public spec):

- ``xl/worksheets/sheet1.xml``: ``<row r="1"><c r="A1" t="s"><v>0</v>``
  — ``t="s"`` indexes into sharedStrings, no ``t`` means number,
  ``t="b"`` boolean, ``t="inlineStr"`` carries ``<is><t>text``.
- ``xl/sharedStrings.xml``: deduped string table.
- ``[Content_Types].xml`` + ``_rels/*`` wire the parts together.

Sheets are driver-sized by contract (the reference holds the whole
sheet in memory too); the DataFrame conversion is the distributed part.

Range selection supports the reference's ``Sheet1!A1:C100`` syntax
(sheet_excel.go range parsing).
"""

from __future__ import annotations

import os
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def _col_index(letters: str) -> int:
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch.upper()) - 64)
    return i - 1


def write_xlsx(
    rows: list[list], header: list[str], path: str, sheet: str = "Sheet1",
) -> None:
    """Rows+header -> a single-sheet xlsx file."""
    strings: dict[str, int] = {}

    def sref(s: str) -> int:
        return strings.setdefault(s, len(strings))

    def cell_xml(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="s"><v>{sref(str(v))}</v></c>'

    body = []
    for ri, row in enumerate([list(header)] + [list(r) for r in rows], 1):
        cells = "".join(cell_xml(ri, ci, v) for ci, v in enumerate(row))
        body.append(f'<row r="{ri}">{cells}</row>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body) + "</sheetData></worksheet>")
    ss_items = "".join(
        f"<si><t xml:space=\"preserve\">{escape(s)}</t></si>"
        for s, _ in sorted(strings.items(), key=lambda kv: kv[1]))
    ss_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
        f'main" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + ss_items + "</sst>")
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><sheets>'
        f'<sheet name="{escape(sheet)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>")

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", ss_xml)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


_RANGE_RE = re.compile(
    r"^(?:(?P<sheet>[^!]+)!)?(?P<c1>[A-Za-z]+)(?P<r1>\d+)"
    r"(?::(?P<c2>[A-Za-z]+)(?P<r2>\d+))?$")


def parse_range(ref: str | None):
    """``Sheet1!A1:C100`` -> (sheet, r1, c1, r2, c2) 0-based inclusive;
    None components mean unbounded/default."""
    if not ref:
        return None, None, None, None, None
    m = _RANGE_RE.match(ref.strip())
    if not m:
        if "!" not in ref and ":" not in ref:
            return ref, None, None, None, None  # bare sheet name
        raise ValueError(f"bad excel range: {ref!r}")
    sheet = m.group("sheet")
    r1 = int(m.group("r1")) - 1
    c1 = _col_index(m.group("c1"))
    r2 = int(m.group("r2")) - 1 if m.group("r2") else None
    c2 = _col_index(m.group("c2")) if m.group("c2") else None
    return sheet, r1, c1, r2, c2


def read_xlsx(path: str, range_ref: str | None = None):
    """xlsx -> (header, rows). ``range_ref`` like ``Sheet1!A1:C100``
    limits the window; the first row of the window is the header."""
    _, r1, c1, r2, c2 = parse_range(range_ref)
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        grid: dict[int, dict[int, object]] = {}
        for row in root.iter(f"{_NS}row"):
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r") or ""
                m = re.match(r"([A-Za-z]+)(\d+)", ref)
                if not m:
                    continue
                ci, ri = _col_index(m.group(1)), int(m.group(2)) - 1
                t = c.get("t")
                v_el = c.find(f"{_NS}v")
                if t == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val: object = "".join(
                        x.text or "" for x in is_el.iter(f"{_NS}t")) \
                        if is_el is not None else ""
                elif v_el is None or v_el.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v_el.text)]
                elif t == "b":
                    val = v_el.text == "1"
                elif t == "str":
                    val = v_el.text
                else:
                    txt = v_el.text
                    val = int(txt) if re.fullmatch(r"-?\d+", txt) \
                        else float(txt)
                grid.setdefault(ri, {})[ci] = val
    if not grid:
        return [], []
    rows_present = sorted(grid)
    lo_r = r1 if r1 is not None else rows_present[0]
    hi_r = r2 if r2 is not None else rows_present[-1]
    cols_present = sorted({c for r in grid.values() for c in r})
    lo_c = c1 if c1 is not None else (cols_present[0] if cols_present else 0)
    hi_c = c2 if c2 is not None else (cols_present[-1] if cols_present else 0)
    window = [
        [grid.get(ri, {}).get(ci) for ci in range(lo_c, hi_c + 1)]
        for ri in range(lo_r, hi_r + 1)
    ]
    header = [str(h) if h is not None else f"_c{i}"
              for i, h in enumerate(window[0])]
    return header, window[1:]
