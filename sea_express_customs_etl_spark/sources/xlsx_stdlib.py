"""Pure-stdlib ``.xlsx`` reader + writer (OP-SRC-XLSX, OP-SRC-CELL).

The reference ingests shipper manifests with ``pd.read_excel``
(``src/process_excel_order.py:200,218``), which needs openpyxl — absent
in this container. An ``.xlsx`` file is just a ZIP of SpreadsheetML
parts, so this module parses it with ``zipfile`` + ``ElementTree``:

* ``read_xlsx_grid(content)`` — first worksheet → row-major grid of
  typed cells (None / str / int / float / bool). Handles sharedStrings,
  inline strings, formula-string and numeric cells, skipped rows/cells
  (placed by their ``r=`` references, gaps left as None).
* ``grid_to_frame(grid, header)`` — mimics
  ``pd.read_excel(header=N, dtype=object)``: header row becomes column
  labels (missing → ``Unnamed: i``, duplicates mangled ``.1``/``.2``),
  data rows padded to sheet width, everything object-dtype.
* ``probe_a1(content)`` — cell A1 only, without materializing the sheet
  (OP-SRC-CELL; reference ``get_mawb_no`` reads only A1, ``:48-56``).
* ``write_xlsx(rows)`` — minimal writer used to build genuine .xlsx
  fixture bytes in tests/benchmarks (sharedStrings by default, inline
  strings optionally) — no third-party writer exists in this
  environment either.

Not handled (documented limits): date serial→datetime conversion (the
manifests carry no date columns; serials surface as numbers), multiple
sheets (the reference reads only the active/first sheet), and legacy
BIFF ``.xls``.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_PKG_REL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")
_INT = re.compile(r"^-?\d+$")


def _col_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 ..."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _si_text(si: ET.Element) -> str:
    # a shared-string item is either one <t> or rich-text runs <r><t>
    return "".join(t.text or "" for t in si.iter(f"{_NS}t"))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    return [_si_text(si) for si in root.iter(f"{_NS}si")]


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the first sheet in workbook order via the rels part."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheet = next(iter(wb.iter(f"{_NS}sheet")))
        rid = sheet.get(_PKG_REL)
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.iter(
            "{http://schemas.openxmlformats.org/package/2006/relationships}"
            "Relationship"
        ):
            if rel.get("Id") == rid:
                target = rel.get("Target", "")
                if target.startswith("/"):
                    return target.lstrip("/")
                return "xl/" + target
    except (KeyError, StopIteration, ET.ParseError):
        pass
    return "xl/worksheets/sheet1.xml"


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return _si_text(is_el) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    text = v.text
    if t == "s":
        return shared[int(text)]
    if t == "str":
        return text
    if t == "b":
        return bool(int(text))
    if t == "e":
        return None
    # numeric: ints stay ints (matches openpyxl, so str() later gives
    # '3' not '3.0' — load-bearing for downstream raw-string parity)
    return int(text) if _INT.match(text) else float(text)


def read_xlsx_grid(content: bytes) -> list[list]:
    """First worksheet of an xlsx byte-stream → row-major ragged grid."""
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        shared = _shared_strings(zf)
        sheet_xml = zf.read(_first_sheet_path(zf))

    grid: list[list] = []
    # iterparse keeps memory bounded by one <row> at a time
    for _event, row in ET.iterparse(io.BytesIO(sheet_xml)):
        if row.tag != f"{_NS}row":
            continue
        r_attr = row.get("r")
        row_idx = int(r_attr) - 1 if r_attr else len(grid)
        while len(grid) <= row_idx:
            grid.append([])
        cells = grid[row_idx]
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r")
            m = _CELL_REF.match(ref) if ref else None
            col = _col_index(m.group(1)) if m else len(cells)
            while len(cells) <= col:
                cells.append(None)
            cells[col] = _cell_value(c, shared)
        row.clear()
    return grid


def probe_a1(content: bytes):
    """Typed value of cell A1 (None when empty/absent) — OP-SRC-CELL."""
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        sheet_xml = zf.read(_first_sheet_path(zf))
        shared: list[str] | None = None
        for _event, el in ET.iterparse(io.BytesIO(sheet_xml)):
            if el.tag != f"{_NS}c":
                continue
            ref = el.get("r")
            if ref is not None and ref != "A1":
                if _CELL_REF.match(ref):
                    return None  # first cell isn't A1 → A1 empty
                continue
            if el.get("t") == "s":
                shared = _shared_strings(zf) if shared is None else shared
                return _cell_value(el, shared)
            return _cell_value(el, [])
    return None


# --------------------------------------------------------------------------
# pandas adapter
# --------------------------------------------------------------------------


def grid_to_frame(grid: list[list], header: int):
    """Mimic ``pd.read_excel(header=N, dtype=object)`` over a grid."""
    import pandas as pd

    if len(grid) <= header:
        raise ValueError(f"sheet has {len(grid)} rows, header={header}")
    width = max((len(r) for r in grid), default=0)
    raw_header = grid[header] + [None] * (width - len(grid[header]))
    names: list = []
    seen: dict[str, int] = {}
    for i, h in enumerate(raw_header):
        name = f"Unnamed: {i}" if h is None else h
        key = str(name)
        if key in seen:  # pandas-style duplicate mangling
            seen[key] += 1
            name = f"{name}.{seen[key]}"
        else:
            seen[key] = 0
        names.append(name)
    data = [r + [None] * (width - len(r)) for r in grid[header + 1 :]]
    return pd.DataFrame(data, columns=names, dtype=object)


# --------------------------------------------------------------------------
# writer (fixtures / round-trip tests)
# --------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def _ref(row: int, col: int) -> str:
    letters = ""
    col += 1
    while col:
        col, rem = divmod(col - 1, 26)
        letters = chr(65 + rem) + letters
    return f"{letters}{row + 1}"


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def write_xlsx(rows: list[list], inline: bool = False) -> bytes:
    """Rows (None/str/int/float/bool cells) → minimal xlsx bytes.

    ``inline=False`` (default) encodes strings via sharedStrings.xml —
    the encoding every mainstream writer emits; ``inline=True`` uses
    ``t="inlineStr"`` so tests cover both reader paths.
    """
    shared: dict[str, int] = {}
    body: list[str] = []
    for ri, row in enumerate(rows):
        cells = []
        for ci, val in enumerate(row):
            if val is None:
                continue
            ref = _ref(ri, ci)
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            elif inline:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{_esc(str(val))}</t></is></c>"
                )
            else:
                idx = shared.setdefault(str(val), len(shared))
                cells.append(f'<c r="{ref}" t="s"><v>{idx}</v></c>')
        body.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
        f'main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(
            f'<si><t xml:space="preserve">{_esc(s)}</t></si>' for s in shared
        )
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()
