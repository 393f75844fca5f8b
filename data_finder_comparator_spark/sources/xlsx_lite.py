"""Minimal pure-stdlib xlsx reader/writer (vendored — no xlsx engine
ships in this container).

xlsx is a zip archive of SpreadsheetML (ECMA-376) XML parts; the subset
the reference exercises (/root/reference/main.py:19-21 single-sheet
read, :521-553 append sink) needs only: the workbook sheet list with
its relationship targets, shared/inline strings, numbers, and booleans.
zipfile + ElementTree cover all of it — no third-party dependency, and
the writer emits standard-compliant files that openpyxl/pandas can read
where those are installed.

Scale note: a workbook is not a splittable format — reads/writes are
driver-side by design and belong only to the small curated-table edge
of the pipeline (the reference's own regime). Bulk data stays parquet.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

# OOXML _xHHHH_ escaping: C0 controls other than tab/newline cannot
# survive XML 1.0 (most are invalid even entity-escaped; \r is valid
# but parsers normalize it to \n per the spec) — SpreadsheetML stores
# them as _xHHHH_ and requires literal "_xHHHH_" sequences to be
# protected as _x005F_xHHHH_.
_CTRL_RE = re.compile(r"[\x00-\x08\x0b-\x1f]")
_XESC_RE = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _ooxml_encode(s: str) -> str:
    s = _XESC_RE.sub(lambda m: f"_x005F_x{m.group(1)}_", s)
    return _CTRL_RE.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def _ooxml_decode(s: str) -> str:
    return _XESC_RE.sub(lambda m: chr(int(m.group(1), 16)), s)

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_ATTR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'BC12' -> 54 (0-based column)."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _col_letters(idx: int) -> str:
    """0-based column -> 'A', 'B', ..., 'AA', ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    # each <si> may hold one <t> or multiple rich-text <r><t> runs
    return [
        _ooxml_decode("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        for si in root
    ]


def _sheet_path(zf: zipfile.ZipFile, sheet: int | str) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{_PKG_REL}Relationship")
    }
    sheets = list(wb.iter(f"{_NS}sheet"))
    if isinstance(sheet, str):
        chosen = [s for s in sheets if s.get("name") == sheet]
        if not chosen:
            raise KeyError(f"no sheet named {sheet!r}")
        el = chosen[0]
    else:
        el = sheets[sheet]
    target = targets[el.get(_RID_ATTR)]
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return _ooxml_decode("".join(tn.text or "" for tn in c.iter(f"{_NS}t")))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":  # cached formula result
        return _ooxml_decode(v.text)
    if t == "e":  # formula error cell (#DIV/0!, #N/A, ...) -> missing
        return None
    txt = v.text
    # pure-integer text parses EXACTLY: float() would silently round
    # longs at/above 2^53 (IDs corrupt by one — r12 review); column-
    # level long-vs-double typing stays the caller's concern
    body = txt[1:] if txt[:1] in "+-" else txt
    if body.isdigit():
        return int(txt)
    return float(txt)


def read_grid(path: str, sheet: int | str = 0) -> list[list]:
    """Read one worksheet into a dense row-major grid (None for gaps).
    Numbers come back as floats (column-level int inference is the
    caller's concern), strings as str, booleans as bool."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(_sheet_path(zf, sheet)))
        rows: list[dict[int, object]] = []
        for row in root.iter(f"{_NS}row"):
            cells: dict[int, object] = {}
            next_col = 0
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                col = _col_index(ref) if ref else next_col
                next_col = col + 1
                val = _cell_value(c, shared)
                if val is not None:
                    cells[col] = val
            rows.append(cells)
    width = max((max(r) + 1 for r in rows if r), default=0)
    return [[r.get(j) for j in range(width)] for r in rows]


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _cell_xml(ref: str, val) -> str:
    import datetime
    import decimal
    import math

    if isinstance(val, bool):
        return f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>'
    if isinstance(val, float) and not math.isfinite(val):
        # SpreadsheetML has no NaN/Infinity numeric cell; writing the
        # repr would produce workbooks external tools reject, and an
        # empty cell would silently drop data — refuse loudly
        raise ValueError(
            f"xlsx cannot represent non-finite float {val!r} (cell "
            f"{ref}); filter or null the value before exporting"
        )
    if isinstance(val, (int, float)):
        return f'<c r="{ref}"><v>{val!r}</v></c>'
    if isinstance(val, (datetime.datetime, datetime.date)):
        # serial-date numbers need style records this lite codec does
        # not carry; ISO-8601 inline strings are unambiguous, lossless
        # and round-trip as strings (documented contract)
        val = val.isoformat(sep=" ") if isinstance(val, datetime.datetime) else val.isoformat()
    elif isinstance(val, decimal.Decimal):
        val = str(val)  # exact digits; floats would round
    if isinstance(val, str):
        text = escape(_ooxml_encode(val))
        return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'
    raise TypeError(
        f"unsupported xlsx cell type {type(val).__name__} (cell {ref}) — "
        "the lite codec writes bool/int/float/str, dates as ISO strings "
        "and Decimal as exact digit strings; binary belongs in parquet"
    )


def write_grid(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Write a row-major grid (None cells skipped) as a single-sheet
    xlsx. Strings are inline (no sharedStrings part needed); floats
    round-trip exactly via repr."""
    body = []
    for i, row in enumerate(rows, 1):
        cells = "".join(
            _cell_xml(f"{_col_letters(j)}{i}", v)
            for j, v in enumerate(row)
            if v is not None
        )
        body.append(f'<row r="{i}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK.format(name=escape(sheet_name)))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
