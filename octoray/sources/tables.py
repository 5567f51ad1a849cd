"""Delimited-table source (reference S2/S3: classes.py:244-290).

The reference reads TSV (tab-split, header row, NaN-folding via
``strOrNone``, util.py:42-50) or Excel into a dict of string columns.
Here: TSV text / files -> Dataset of STRING columns (types are decided
later by the distributed column vote, pipelines/prep.py) — schema-on-
read stays stringly, exactly like the reference, because the
classifier vote IS the type system (SURVEY.md §1.4).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import pyarrow as pa

NA_DEFAULT = ("", "NA", "N/A", "nan", "None")


def parse_tsv(text: str, *, na_str: Sequence[str] = NA_DEFAULT) -> pa.Table:
    """TSV text -> Arrow table of nullable string columns (header row
    required; na_str values fold to null — strOrNone, util.py:42-50)."""
    lines = [l for l in text.splitlines() if l != ""]
    if not lines:
        return pa.table({})
    header = lines[0].split("\t")
    cols: List[List[Optional[str]]] = [[] for _ in header]
    for line in lines[1:]:
        parts = line.split("\t")
        for i in range(len(header)):
            v = parts[i] if i < len(parts) else None
            cols[i].append(None if (v is None or v in na_str) else v)
    return pa.table({h: pa.array(c, pa.string()) for h, c in zip(header, cols)})


def excel_rows(path: str, *, na_str: Sequence[str] = NA_DEFAULT, sheet: int = 0):
    """Excel reader (S3, classes.py:258-268 / recipes.py:158).

    Legacy ``.xls`` (GISAID's export format) is read by the built-in
    pure-Python BIFF8 parser (sources/xls.py — verified byte-identical
    to the reference's golden on test-data/gisaid.xls); ``.xlsx`` by
    the built-in SpreadsheetML parser (sources/xlsx.py) — no
    third-party codec needed for either."""
    import ray.data as rd

    with open(path, "rb") as fh:
        magic = fh.read(8)
    if magic == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":  # CFB -> BIFF .xls
        from octoray.sources.xls import read_xls_table

        t = read_xls_table(path)
        cols = {
            c: [None if (v is None or v in na_str) else v
                for v in t.column(c).to_pylist()]
            for c in t.schema.names
        }
        return rd.from_arrow(
            pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})
        )
    from octoray.sources.xlsx import read_xlsx_table

    t = read_xlsx_table(path, sheet=sheet)
    cols = {
        c: [None if (v is None or v in na_str) else v
            for v in t.column(c).to_pylist()]
        for c in t.schema.names
    }
    return rd.from_arrow(
        pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})
    )


def tsv_rows(src: Union[str, List[str]], *, na_str: Sequence[str] = NA_DEFAULT,
             column_names: Optional[List[str]] = None):
    """TSV -> Dataset of string columns.

    ``src`` is raw TSV text (small, driver-side) or file path(s) —
    files are read with ``ray.data.read_csv`` (distributed, header per
    file) and NA-folded to null inside map_batches.  ``column_names``
    reads HEADERLESS input (BLAST outfmt-6, recipes.py:29-43 — the
    first alignment row must NOT become the header)."""
    import ray.data as rd

    if isinstance(src, str) and "\t" in src:
        return rd.from_arrow(parse_tsv(src, na_str=na_str))

    from pyarrow import csv as pacsv

    ds = rd.read_csv(
        src,
        read_options=pacsv.ReadOptions(column_names=column_names)
        if column_names else None,
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        convert_options=pacsv.ConvertOptions(
            column_types=None, strings_can_be_null=True, null_values=list(na_str)
        ),
    )

    def stringly(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({c: pc.cast(t.column(c), pa.string()) for c in t.schema.names})

    return ds.map_batches(stringly, batch_format="pyarrow")
