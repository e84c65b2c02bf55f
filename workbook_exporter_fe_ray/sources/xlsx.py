"""Minimal stdlib XLSX reader — closes the reference's Excel ingest
surface (`pd.read_excel(path, sheet_name='Sheet2', skiprows=range(0,6))`,
``/root/reference/workbook_exporter-fe.py:1711``) without third-party
codecs: an .xlsx file is a ZIP of XML parts, so ``zipfile`` +
``xml.etree`` cover the subset workbook exports use (inline/shared
strings, numbers, booleans; no formulas evaluated — cached values are
read, like pandas does).

Driver-side by design: workbook uploads are small (the reference caps
uploads at 16–100 MB); the parsed table enters Ray as Arrow and the
pipeline is format-agnostic from there.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(ref: str) -> int:
    """'A1' → 0, 'AB7' → 27."""
    idx = 0
    for ch in ref:
        if ch.isdigit():
            break
        idx = idx * 26 + (ord(ch.upper()) - 64)
    return idx - 1


def read_xlsx_rows(
    path: str, sheet_name: str | None = None
) -> list[list[object]]:
    """All rows of one sheet as Python lists (None for empty cells),
    ragged rows padded to the sheet's max width."""
    with zipfile.ZipFile(path) as z:
        # sheet name → target part, via workbook + its relationships
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target") for r in rels.iter(f"{_PKG_REL}Relationship")
        }
        sheets = {}
        first_sheet = None
        for s in wb.iter(f"{_NS}sheet"):
            target = rel_target.get(s.get(_REL_NS), "")
            if not target.startswith("/"):
                target = "xl/" + target
            else:
                target = target.lstrip("/")
            sheets[s.get("name")] = target
            if first_sheet is None:
                first_sheet = s.get("name")
        name = sheet_name or first_sheet
        if name not in sheets:
            raise ValueError(f"sheet {name!r} not in workbook (has {sorted(sheets)})")

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        sheet = ET.fromstring(z.read(sheets[name]))
        rows: list[list[object]] = []
        width = 0
        for row in sheet.iter(f"{_NS}row"):
            cells: list[object] = []
            for c in row.iter(f"{_NS}c"):
                ci = _col_index(c.get("r", ""))
                while len(cells) < ci:
                    cells.append(None)
                t = c.get("t", "n")
                v = c.find(f"{_NS}v")
                if t == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val: object = (
                        "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
                        if is_el is not None
                        else None
                    )
                elif v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = v.text == "1"
                elif t == "str":
                    val = v.text
                else:  # numeric
                    txt = v.text
                    val = float(txt) if re.search(r"[.eE]", txt) else int(txt)
                cells.append(val)
            rows.append(cells)
            width = max(width, len(cells))
        for r in rows:
            r.extend([None] * (width - len(r)))
        return rows


def read_xlsx_table(
    path: str, sheet_name: str | None = None, skip_rows: int = 0
):
    """Rows → pyarrow Table: row ``skip_rows`` is the header (duplicate
    names deduped pandas-style), following rows are data; each column's
    type is inferred by Arrow from the Python values."""
    import pyarrow as pa

    rows = read_xlsx_rows(path, sheet_name)
    if len(rows) <= skip_rows:
        raise ValueError(f"{path!r}: no header row after skipping {skip_rows}")
    header = rows[skip_rows]
    seen: dict[str, int] = {}
    names = []
    for i, h in enumerate(header):
        n = str(h) if h is not None else f"Unnamed: {i}"
        if n in seen:
            seen[n] += 1
            n = f"{n}.{seen[n]}"
        else:
            seen[n] = 0
        names.append(n)
    data = rows[skip_rows + 1 :]
    cols = [[r[i] for r in data] for i in range(len(names))]
    return pa.table({n: pa.array(c) for n, c in zip(names, cols)})
