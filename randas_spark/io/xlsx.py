"""Dependency-free XLSX codec — the spreadsheet twin of operators/png.py
and operators/wav.py: real bytes in/out with only the stdlib (zipfile +
xml.etree), no openpyxl.

XLSX is a zip of XML parts. The writer emits the minimal canonical
package ([Content_Types].xml, _rels, workbook, one worksheet) with
inline strings — readable by Excel, pandas/openpyxl, and this module's
own reader. The reader handles the parts any real-world writer produces:
shared strings, inline strings, numbers, booleans, and A1-style cell
references with gaps (blank cells read as None).

Covers the reference's Excel surface (read.rs:18-67 first-sheet +
header-row reads; write.rs:10-69 single-sheet writes). Formulas, styles,
and multi-sheet selection beyond by-name are out of scope — the
reference writes values only.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from xml.sax.saxutils import escape, quoteattr

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")
_INT_RE = re.compile(r"^[+-]?\d+$")

# OOXML _xHHHH_ escaping (ECMA-376 §22.9.2.19 ST_Xstring): characters
# invalid in XML 1.0 (control chars, U+FFFE/FFFF, surrogates) are encoded
# as _xHHHH_ in cell strings; a literal "_xHHHH_" in the data escapes its
# leading underscore as _x005F_ so decode is unambiguous. \r is included
# even though it is valid XML: XML 1.0 line-ending normalization rewrites
# a literal \r (and \r\n) to \n on read, so a raw CR cannot round-trip —
# real Excel writers emit _x000D_ for exactly this reason. \t and \n are
# NOT escaped: element content (unlike attribute values) preserves them.
_XML_INVALID = re.compile(
    "[\x00-\x08\x0b-\x1f\ud800-\udfff￾￿]|_(?=x[0-9A-Fa-f]{4}_)"
)
_X_ESC = re.compile("_x([0-9A-Fa-f]{4})_")


def _xstring_encode(s: str) -> str:
    return _XML_INVALID.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def _xstring_decode(s: str) -> str:
    return _X_ESC.sub(lambda m: chr(int(m.group(1), 16)), s)


def col_letters(idx: int) -> str:
    """0-based column index → A1-style letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _letters_to_idx(letters: str) -> int:
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(path: str, columns: list[str], rows: list[tuple], sheet: str = "Sheet1") -> None:
    """Write one worksheet: row 1 = header, values below. Numbers (non-
    bool int/float) become numeric cells; everything else inline strings;
    None/"" cells are omitted (blank)."""
    body: list[str] = []
    all_rows = [tuple(columns)] + [tuple(r) for r in rows]
    for rix, row in enumerate(all_rows, start=1):
        cells = []
        for cix, v in enumerate(row):
            if v is None or (isinstance(v, str) and v == ""):
                continue
            ref = f"{col_letters(cix)}{rix}"
            if isinstance(v, bool):  # header/row strings dominate; bools
                cells.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(_xstring_encode(str(v)))}</t></is></c>"
                )
        body.append(f'<row r="{rix}">' + "".join(cells) + "</row>")

    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets><sheet name={quoteattr(sheet)} sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def read_xlsx(path: str, sheet: str | None = None) -> tuple[list[str], list[list]]:
    """(header, data rows) from the named (default: first) worksheet.
    Numeric cells → int when integral else float; t="b" → bool;
    shared/inline/str strings → str; absent cells → None."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        targets = {r.get("Id"): r.get("Target") for r in rels.findall(f"{rel_ns}Relationship")}
        rid_attr = (
            "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
        )
        sheet_path = None
        for s in wb.find(f"{_NS}sheets").findall(f"{_NS}sheet"):
            if sheet is None or s.get("name") == sheet:
                sheet_path = targets[s.get(rid_attr)]
                break
        if sheet_path is None:
            raise KeyError(f"sheet {sheet!r} not found in {path}")
        if sheet_path.startswith("/"):  # absolute part name → zip path
            sheet_path = sheet_path.lstrip("/")
        else:
            sheet_path = "xl/" + sheet_path.removeprefix("xl/")

        shared: list[str] = []
        try:
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                # direct <t> plus rich-text <r>/<t> ONLY — si.iter would
                # also pick up phonetic <rPh> runs (East-Asian Excel
                # furigana), corrupting the string vs openpyxl/pandas
                parts = [t.text or "" for t in si.findall(f"{_NS}t")]
                for r in si.findall(f"{_NS}r"):
                    parts.extend(t.text or "" for t in r.findall(f"{_NS}t"))
                shared.append(_xstring_decode("".join(parts)))
        except KeyError:
            pass

        ws = ET.fromstring(z.read(sheet_path))
        grid: dict[int, dict[int, object]] = {}
        max_col = -1
        next_rix = 0  # implied row when <row> lacks r (optional in OOXML)
        for row in ws.iter(f"{_NS}row"):
            # register the row even if every cell is blank (all-null rows
            # must survive the round trip with their position)
            r_attr = row.get("r")
            rrix = int(r_attr) - 1 if r_attr is not None else next_rix
            next_rix = rrix + 1
            grid.setdefault(rrix, {})
            next_cix = 0  # implied column: one past the previous cell
            for c in row.findall(f"{_NS}c"):
                m = _CELL_REF.match(c.get("r", ""))
                if m:
                    cix, rix = _letters_to_idx(m.group(1)), int(m.group(2)) - 1
                else:
                    # the r attribute is optional; streaming writers omit
                    # it — infer position instead of silently dropping
                    cix, rix = next_cix, rrix
                next_cix = cix + 1
                t = c.get("t", "n")
                if t == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val: object = _xstring_decode(
                        "".join(el.text or "" for el in is_el.iter(f"{_NS}t"))
                    ) if is_el is not None else None
                else:
                    v_el = c.find(f"{_NS}v")
                    if v_el is None or v_el.text is None:
                        continue
                    raw = v_el.text
                    if t == "s":
                        val = shared[int(raw)]
                    elif t == "b":
                        val = raw.strip() in ("1", "true", "TRUE")
                    elif t == "str":
                        val = _xstring_decode(raw)
                    elif t in ("e", "d"):
                        # cached formula errors / ISO-date cells: carry the
                        # raw text through rather than crashing the whole
                        # read on float('#DIV/0!')
                        val = raw
                    else:
                        if _INT_RE.match(raw):
                            # int(raw) keeps full precision: float() would
                            # silently round integers >= 2^53 that the
                            # writer emits exactly
                            val = int(raw)
                        else:
                            f = float(raw)
                            val = (
                                int(f)
                                if f.is_integer()
                                and "e" not in raw.lower()
                                and "." not in raw
                                else f
                            )
                grid.setdefault(rix, {})[cix] = val
                max_col = max(max_col, cix)

    if not grid:
        return [], []
    n_cols = max_col + 1
    first = min(grid)
    header_cells = grid[first]
    header = [str(header_cells.get(i, f"col{i}")) for i in range(n_cols)]
    data = []
    for rix in sorted(grid):
        if rix == first:
            continue
        cells = grid[rix]
        data.append([cells.get(i) for i in range(n_cols)])
    return header, data
