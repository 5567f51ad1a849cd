"""Pure-Python BIFF8 (.xls) reader vs the reference's OWN fixture and
golden output (test-data/gisaid.xls -> .exp-gisaid.ttl, the exact
check the reference's test-data/Makefile runs with `octofludb prep
gis`)."""

import re

import pytest

XLS = "/root/reference/test-data/gisaid.xls"
GOLDEN = "/root/reference/test-data/.exp-gisaid.ttl"


def parse_ttl(path):
    """Tiny prefixed-Turtle parser (';'/',' continuations) -> set of
    (s, p, o, dt) in the engine's prefix-string convention."""
    txt = re.sub(r"@prefix[^\n]*\n", "", open(path).read())
    triples = set()
    for stmt in re.split(r"\s\.\s*\n", txt):
        stmt = stmt.strip()
        if not stmt:
            continue
        subj, rest = re.match(r"(\S+)\s+(.*)", stmt, re.S).groups()
        for predpart in re.split(r"\s;\s*", rest):
            predpart = predpart.strip()
            if not predpart:
                continue
            pred, objs = re.match(r"(\S+)\s+(.*)", predpart, re.S).groups()
            for obj in re.split(r",\s*", objs):
                obj = obj.strip()
                if obj.startswith('"'):
                    lex, dt = re.match(r'"(.*)"(?:\^\^(\S+))?$', obj, re.S).groups()
                    triples.add((subj, pred, lex, dt or ""))
                else:
                    triples.add((subj, pred, obj, "uri"))
    return triples


def test_read_xls_grid():
    from octoray.sources.xls import read_xls_table

    t = read_xls_table(XLS)
    assert t.num_rows == 4
    assert t.num_columns == 63
    assert t.schema.names[0] == "Isolate_Id"
    ids = t.column("Isolate_Id").to_pylist()
    assert ids[0].startswith("EPI_ISL_")


def test_gisaid_golden_parity(ray_session):
    """Full-path check: .xls -> excel_rows -> prep_gisaid must emit the
    EXACT triple set of the reference golden (its Makefile gate)."""
    import ray.data as rd

    from octoray.pipelines.prep import prep_gisaid
    from octoray.sources.tables import excel_rows

    want = parse_ttl(GOLDEN)
    out = prep_gisaid(excel_rows(XLS))
    got = {(r["subject"], r["predicate"], r["object"], r["object_datatype"])
           for r in out.take_all()}
    assert got == want
    assert len(want) == 224  # pin the fixture size so a parse
    # regression can't silently shrink both sides


# ---------------------------------------------------------------------
# native .xlsx reader (sources/xlsx.py)
# ---------------------------------------------------------------------
_XLSX_CT = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="xml" ContentType="application/xml"/>
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
</Types>"""
_XLSX_ROOT_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""
_XLSX_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="data" sheetId="1" r:id="rId1"/>
  <sheet name="extra" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""
_XLSX_WB_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
_XLSX_SST = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>strain</t></si>
 <si><t>count</t></si>
 <si><r><t>A/swine/</t></r><r><t>Iowa/1/2015</t></r></si>
</sst>"""
_XLSX_SHEET1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>ok</t></is></c></row>
  <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>7</v></c><c r="C2" t="b"><v>1</v></c></row>
  <row r="3"><c r="B3"><v>2.5</v></c></row>
 </sheetData>
</worksheet>"""
_XLSX_SHEET2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>only</t></is></c></row>
  <row r="2"><c r="A2"><v>1</v></c></row>
 </sheetData>
</worksheet>"""


def _write_xlsx(path):
    import zipfile

    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _XLSX_CT)
        z.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        z.writestr("xl/workbook.xml", _XLSX_WB)
        z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        z.writestr("xl/sharedStrings.xml", _XLSX_SST)
        z.writestr("xl/worksheets/sheet1.xml", _XLSX_SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _XLSX_SHEET2)


def test_read_xlsx_table(tmp_path):
    """Shared strings (incl. rich-text runs), inline strings, numbers'
    lexical form, booleans, skipped cells, ragged rows, sheet select."""
    from octoray.sources.xlsx import read_xlsx_table

    p = str(tmp_path / "t.xlsx")
    _write_xlsx(p)
    t = read_xlsx_table(p)
    assert t.schema.names == ["strain", "count", "ok"]
    assert t.column("strain").to_pylist() == ["A/swine/Iowa/1/2015", None]
    assert t.column("count").to_pylist() == ["7", "2.5"]
    assert t.column("ok").to_pylist() == ["TRUE", None]
    t2 = read_xlsx_table(p, sheet=1)
    assert t2.schema.names == ["only"]
    assert t2.column("only").to_pylist() == ["1"]


def test_excel_rows_dispatches_xlsx(ray_session, tmp_path):
    from octoray.sources.tables import excel_rows

    p = str(tmp_path / "t.xlsx")
    _write_xlsx(p)
    rows = excel_rows(p).take_all()
    assert rows[0]["strain"] == "A/swine/Iowa/1/2015"
    assert rows[1]["count"] == "2.5"
