"""Sinks: triple table -> Turtle text; binding tables -> FASTA / TSV.

Reference K1-K3 (SURVEY.md §2.1):
  K1 Turtle   ui.py:20-39 serializes a sorted rdflib graph; here the
              canonical (s,p,o,dt)-ordered Dataset maps 1:1 to
              prefix-abbreviated Turtle-ish lines (model.
              format_turtle_line) — a pure per-batch string concat,
              written distributed via write_text-style parquet/text
              shards or streamed to one file for golden diffs.
  K2 FASTA    formatting.py:10-27 — '>'+'|'-joined fields, LAST column
              is the sequence.
  K3 TSV      formatting.py:29-46 — tab-joined with optional header.

The parquet triple table (stages/canon + write_parquet) remains the
scale sink (K4's idempotent-upload analogue); these are the
text-format surfaces.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa

from octoray.model import PREFIXES, format_turtle_line


def turtle_prefix_header() -> str:
    """@prefix block (nomenclature.py:22-27 namespace bindings)."""
    return "\n".join(
        f"@prefix {k}: <{v}> ." for k, v in sorted(PREFIXES.items())
    ) + "\n"


def turtle_lines(triples_ds):
    """Canonical triple Dataset -> Dataset[line: string] of Turtle-ish
    statements (sorted iff the input is canonical)."""

    def f(t: pa.Table) -> pa.Table:
        lines = [
            format_turtle_line(s, p, o, dt)
            for s, p, o, dt in zip(
                t.column("subject").to_pylist(),
                t.column("predicate").to_pylist(),
                t.column("object").to_pylist(),
                t.column("object_datatype").to_pylist(),
            )
        ]
        return pa.table({"line": pa.array(lines, pa.string())})

    return triples_ds.map_batches(f, batch_format="pyarrow")


def write_turtle(triples_ds, path: str) -> str:
    """Stream the graph to ONE Turtle file (golden-diff surface).
    Blocks stream through the driver one at a time — constant memory;
    at scale prefer ``turtle_lines(ds).write_parquet`` per shard."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(turtle_prefix_header())
        for batch in turtle_lines(triples_ds).iter_batches(batch_format="pyarrow"):
            for line in batch.column("line").to_pylist():
                fh.write(line + "\n")
    return path


def ntriples_lines(triples_ds):
    """Canonical triple Dataset -> strict W3C N-Triples statements
    with FULLY EXPANDED ``<IRI>`` terms — the interop surface for
    external RDF tooling (prefix-form Turtle stays the compact
    golden-diff sink).  Literals carry the N-Triples short escapes
    and ``^^<datatype IRI>`` tags; parsing back rides the Turtle
    source (N-Triples is a subset) whose ``_abbrev`` re-normalizes
    IRIs against ``model.PREFIXES``, so sink -> source is identity.
    Pure per-batch string concat, same streaming shape as
    :func:`turtle_lines`."""
    from octoray.model import DT_PLAIN, DT_URI, expand_uri

    def esc(o: str) -> str:
        return (o.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n").replace("\r", "\\r")
                .replace("\t", "\\t"))

    def f(t: pa.Table) -> pa.Table:
        lines = []
        for s, p, o, dt in zip(
            t.column("subject").to_pylist(),
            t.column("predicate").to_pylist(),
            t.column("object").to_pylist(),
            t.column("object_datatype").to_pylist(),
        ):
            if dt == DT_URI:
                obj = f"<{expand_uri(o)}>"
            elif dt == DT_PLAIN:
                obj = '"' + esc(o) + '"'
            else:
                obj = '"' + esc(o) + f'"^^<{expand_uri(dt)}>'
            lines.append(
                f"<{expand_uri(s)}> <{expand_uri(p)}> {obj} .")
        return pa.table({"line": pa.array(lines, pa.string())})

    return triples_ds.map_batches(f, batch_format="pyarrow")


def write_ntriples(triples_ds, path: str) -> str:
    """Stream the graph to ONE .nt file (interop hand-off).  Constant
    driver memory; at scale prefer ``ntriples_lines(ds).write_parquet``
    (or a text sink) per shard."""
    with open(path, "w", encoding="utf-8") as fh:
        for batch in ntriples_lines(triples_ds).iter_batches(
                batch_format="pyarrow"):
            for line in batch.column("line").to_pylist():
                fh.write(line + "\n")
    return path


def sql_ntriples_lines(src: str) -> str:
    """DuckDB twin of :func:`ntriples_lines` over a dumped triple
    table: prefix expansion as a generated CASE over the canonical
    ``model.PREFIXES`` and the identical escape-replace chain
    (backslash first, then quote and the line controls)."""
    from octoray.model import PREFIXES

    def exp(col: str) -> str:
        whens = " ".join(
            f"WHEN {col} LIKE '{p}:%' THEN "
            f"'{base}' || substr({col}, {len(p) + 2})"
            for p, base in sorted(PREFIXES.items()))
        return f"CASE {whens} ELSE {col} END"

    e = ("replace(replace(replace(replace(replace(object,"
         " chr(92), chr(92) || chr(92)),"
         " '\"', chr(92) || '\"'),"
         " chr(10), chr(92) || 'n'),"
         " chr(13), chr(92) || 'r'),"
         " chr(9), chr(92) || 't')")
    obj = f"""CASE
        WHEN object_datatype = 'uri' THEN '<' || {exp('object')} || '>'
        WHEN object_datatype = '' THEN '"' || {e} || '"'
        ELSE '"' || {e} || '"^^<' || {exp('object_datatype')} || '>'
    END"""
    return f"""
        SELECT '<' || {exp('subject')} || '> <' || {exp('predicate')}
               || '> ' || {obj} || ' .' AS line
        FROM {src}
    """


def fasta_text(ds, columns: Sequence[str]) -> "ray.data.Dataset":  # noqa: F821
    """Binding Dataset -> FASTA lines: header '|'-joins all but the
    last column; the LAST column is the sequence (formatting.py:14-15
    'last SELECT variable is the sequence')."""
    cols = list(columns)

    def f(t: pa.Table) -> pa.Table:
        data = [t.column(c).to_pylist() for c in cols]
        out: List[str] = []
        for row in zip(*data):
            header = "|".join("" if v is None else str(v) for v in row[:-1])
            seq = "" if row[-1] is None else str(row[-1])
            out.append(f">{header}\n{seq}")
        return pa.table({"entry": pa.array(out, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def write_fasta(ds, columns: Sequence[str], path: str) -> str:
    with open(path, "w", encoding="utf-8") as fh:
        for batch in fasta_text(ds, columns).iter_batches(batch_format="pyarrow"):
            for entry in batch.column("entry").to_pylist():
                fh.write(entry + "\n")
    return path


def write_tsv(ds, path: str, *, header: bool = True) -> str:
    """Stream a (small, report-sized) Dataset to one TSV file
    (write_as_table, formatting.py:29-46).  For bulk output use
    ``ds.write_csv`` (sharded) instead."""
    first = True
    with open(path, "w", encoding="utf-8") as fh:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            names = batch.schema.names
            if first and header:
                fh.write("\t".join(names) + "\n")
            first = False
            cols = [batch.column(c).to_pylist() for c in names]
            for row in zip(*cols):
                fh.write("\t".join("" if v is None else str(v) for v in row) + "\n")
    return path
