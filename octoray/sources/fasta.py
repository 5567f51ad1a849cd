"""FASTA source (reference S1: classes.py:318-349).

The reference parses FASTA with a parsec grammar: ``>``-header split
into fields on ``|``, sequence lines concatenated; each entry becomes
one ragged row ``header_fields + [sequence]``.  Here the grammar is a
simple line scanner (same accepted language for well-formed FASTA) and
the Ray shape is ``read_binary_files -> flat parse per file -> rows
Dataset`` — each file parses independently inside ``map_batches``, so
a directory of shards streams.

Row schema: ``fields: list<string>`` (ragged — Datum-cast downstream,
classes.py:300-316).
"""

from __future__ import annotations

from typing import List, Union

import pyarrow as pa

ROWS_SCHEMA = pa.schema([("fields", pa.list_(pa.string()))])


def parse_fasta(text: str, sep: str = "|") -> List[List[str]]:
    """FASTA text -> rows of ``header fields + [sequence]``.

    Same language as the reference grammar (classes.py:324-349):
    header is everything after '>' to end of line; sequence lines
    (and any internal whitespace) are concatenated until the next
    '>' or EOF; entries with empty sequence yield ''."""
    rows: List[List[str]] = []
    header: str | None = None
    seq_parts: List[str] = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith(">"):
            if header is not None:
                rows.append(header.split(sep) + ["".join(seq_parts)])
            header = line[1:]
            seq_parts = []
        elif line:
            seq_parts.append("".join(line.split()))
    if header is not None:
        rows.append(header.split(sep) + ["".join(seq_parts)])
    return rows


def rows_table(rows: List[List[str]]) -> pa.Table:
    return pa.table({"fields": pa.array(rows, pa.list_(pa.string()))})


def fasta_rows(src: Union[str, List[str]], sep: str = "|"):
    """FASTA -> Dataset[fields: list<string>].

    ``src`` is raw FASTA text (driver-side, small) or a list of file
    paths / a directory (distributed: each file parsed in its own
    read task)."""
    import ray.data as rd

    if isinstance(src, str) and ("\n" in src or src.startswith(">")):
        return rd.from_arrow(rows_table(parse_fasta(src, sep)))

    ds = rd.read_binary_files(src)

    def parse_file(batch: pa.Table) -> pa.Table:
        out: List[List[str]] = []
        for data in batch.column("bytes").to_pylist():
            out.extend(parse_fasta(data.decode("utf-8"), sep))
        return rows_table(out)

    return ds.map_batches(parse_file, batch_format="pyarrow")
