"""Stdlib XLSX ingest (sources/xlsx.py): reference Excel-surface parity
(`pd.read_excel(sheet_name='Sheet2', skiprows=range(0,6))`,
workbook_exporter-fe.py:1711) without third-party codecs.

The test workbook is handcrafted zip+XML (we cannot use openpyxl here —
that absence is the point), covering shared strings, inline strings,
ints, floats, booleans, empty cells, ragged rows, a second sheet, and
banner rows before the header."""

from __future__ import annotations

import zipfile

import pytest

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
 <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
 <Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
 <Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="Sheet1" sheetId="1" r:id="rId1"/>
  <sheet name="Sheet2" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_SST = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>host</t></si><si><t>port</t></si><si><t>web-01</t></si>
</sst>"""

_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
  <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>8080</v></c></row>
 </sheetData>
</worksheet>"""

# Sheet2: 2 banner rows, then header, then data with mixed types,
# gaps (missing B4) and a ragged final row
_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>BANNER</t></is></c></row>
  <row r="2"/>
  <row r="3">
   <c r="A3" t="inlineStr"><is><t>name</t></is></c>
   <c r="B3" t="inlineStr"><is><t>score</t></is></c>
   <c r="C3" t="inlineStr"><is><t>done</t></is></c>
   <c r="D3" t="inlineStr"><is><t>name</t></is></c>
  </row>
  <row r="4">
   <c r="A4" t="inlineStr"><is><t>alpha</t></is></c>
   <c r="C4" t="b"><v>1</v></c>
   <c r="D4" t="inlineStr"><is><t>x</t></is></c>
  </row>
  <row r="5">
   <c r="A5" t="inlineStr"><is><t>beta</t></is></c>
   <c r="B5"><v>2.5</v></c>
   <c r="C5" t="b"><v>0</v></c>
  </row>
 </sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path) -> str:
    path = str(tmp_path / "book.xlsx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SST)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return path


def test_xlsx_first_sheet_shared_strings(xlsx_path, ray_session):
    from workbook_exporter_fe_ray.sources import read_auto

    df = read_auto(xlsx_path).to_pandas()
    assert list(df.columns) == ["host", "port"]
    assert df["host"].tolist() == ["web-01"]
    assert df["port"].tolist() == [8080]


def test_xlsx_sheet2_skiprows_mixed_types(xlsx_path, ray_session):
    from workbook_exporter_fe_ray.sources import read_auto

    df = read_auto(xlsx_path, sheet_name="Sheet2", skip_rows=2).to_pandas()
    # duplicate header name deduped pandas-style
    assert list(df.columns) == ["name", "score", "done", "name.1"]
    assert df["name"].tolist() == ["alpha", "beta"]
    assert df["score"].isna().tolist() == [True, False]
    assert df["score"].dropna().tolist() == [2.5]
    assert df["done"].tolist() == [True, False]
    # ragged row padded with null
    assert df["name.1"].tolist()[0] == "x"
    assert df["name.1"].isna().tolist() == [False, True]


def test_xlsx_missing_sheet_raises(xlsx_path, ray_session):
    from workbook_exporter_fe_ray.sources.xlsx import read_xlsx_table

    with pytest.raises(ValueError):
        read_xlsx_table(xlsx_path, sheet_name="Nope")
