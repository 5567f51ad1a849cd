"""Minimal native ``.xlsx`` reader (S3 closure, VERDICT r2 item 9).

An ``.xlsx`` workbook is a zip of XML parts (ECMA-376 / ISO 29500
SpreadsheetML); the subset a data table needs is tiny and has no
third-party dependency:

  xl/workbook.xml          sheet order + relationship ids
  xl/_rels/workbook.xml.rels  rId -> worksheet part path
  xl/sharedStrings.xml     the shared-string table (<si>, rich-text
                           runs concatenate their <t> children)
  xl/worksheets/sheetN.xml rows of <c r="A1" t="..."><v>...</v></c>

Everything is surfaced as STRINGS, like the BIFF8 ``.xls`` twin
(sources/xls.py): numbers keep their stored lexical form, booleans
become TRUE/FALSE, shared/inline strings are resolved.  Reference
behavior being replaced: ``pd.read_excel`` in octofludb
classes.py:258-268.
"""

from __future__ import annotations

import re
import zipfile
from typing import Dict, List, Optional
from xml.etree import ElementTree as ET

import pyarrow as pa

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_CELL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 (base-26 bijective)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> List[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out: List[str] = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>; concatenate all text
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_path(zf: zipfile.ZipFile, sheet: int) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid: Dict[str, str] = {
        r.get("Id"): r.get("Target")
        for r in rels.iter(f"{_REL_NS}Relationship")
    }
    sheets = list(wb.iter(f"{_NS}sheet"))
    if not sheets:
        raise ValueError("xlsx workbook has no sheets")
    if sheet >= len(sheets):
        raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
    target = target_by_rid[sheets[sheet].get(_RID)]
    if target.startswith("/"):
        return target.lstrip("/")
    return "xl/" + target


def _cell_value(c, sst: List[str]) -> Optional[str]:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return sst[int(v.text)]
    if t == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    return v.text  # n, str (formula cache), e — keep the lexical form


def read_xlsx_rows(path: str, *, sheet: int = 0) -> List[List[Optional[str]]]:
    """All rows of one worksheet as lists of optional strings, gaps
    (skipped cells / missing refs) filled with None, ragged tails kept."""
    with zipfile.ZipFile(path) as zf:
        sst = _shared_strings(zf)
        root = ET.fromstring(zf.read(_sheet_path(zf, sheet)))
    rows: List[List[Optional[str]]] = []
    for row in root.iter(f"{_NS}row"):
        cells: List[Optional[str]] = []
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r")
            if ref is not None:
                m = _CELL_RE.fullmatch(ref)
                idx = _col_index(m.group(1)) if m else len(cells)
            else:
                idx = len(cells)
            while len(cells) < idx:
                cells.append(None)
            val = _cell_value(c, sst)
            if len(cells) == idx:
                cells.append(val)
            else:
                cells[idx] = val
        rows.append(cells)
    return rows


def read_xlsx_table(path: str, *, sheet: int = 0) -> pa.Table:
    """First row = header; every column surfaced as string (same
    contract as xls.read_xls_table)."""
    rows = read_xlsx_rows(path, sheet=sheet)
    if not rows:
        raise ValueError("empty xlsx sheet")
    header = [h if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    ncol = len(header)
    cols: List[List[Optional[str]]] = [[] for _ in range(ncol)]
    for r in rows[1:]:
        for i in range(ncol):
            cols[i].append(r[i] if i < len(r) else None)
    return pa.table({h: pa.array(c, pa.string()) for h, c in zip(header, cols)})
