"""Prep pipelines: delimited inputs -> canonical triple Datasets.

The reference's ``octofludb prep fasta|table|blast|tag`` family
(ui.py:838-929, recipes.py:21-71, ui.py:600-619) re-expressed as Ray
Data pipelines:

  prep_fasta   ragged rows, per-cell Datum cast (classes.py:300-316)
  prep_table   header rows, DISTRIBUTED column-vote typing (A8:
               per-batch partial match counts -> sum aggregate ->
               driver argmax -> broadcast chosen classifiers)
  prep_blast   BLAST outfmt-6, fixed 12-column typed projection (S9)
  tag_ids      id-list tagging (S10)

All emit the 4-column triple table and finish with ``canonicalize``
(dedup + canonical order) unless ``canonical=False``.
Timestamps are injected, never datetime.now() (SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pyarrow as pa

from octoray import emit, recognize as R
from octoray.model import (
    DT_DOUBLE,
    DT_INT,
    DT_PLAIN,
    DT_URI,
    P,
    make_tag_uri,
    make_uri,
    triples_to_table,
)
from octoray.sources.tables import NA_DEFAULT
from octoray.stages.canon import canonicalize


def _finish(ds, canonical: bool):
    return canonicalize(ds) if canonical else ds


def _schema_names(ds) -> List[str]:
    return list(ds.schema(fetch_if_missing=True).names)


# ----------------------------------------------------------------------
# FASTA prep (ragged Datum-cast path, ui.py:903-929)
# ----------------------------------------------------------------------
def prep_fasta(rows_ds, *, tag: Optional[str] = None, timestamp: str = "", levels=None,
               na_str: Sequence[str] = NA_DEFAULT, canonical: bool = True,
               include: Sequence[str] = (), exclude: Sequence[str] = ()):
    """Dataset[fields: list<string>] -> triples.  Each ragged row is
    Datum-cast per cell and connected (Phrase.connect).
    ``include``/``exclude`` amend the classifier registry
    (ui.py:812-818 / recognize.select_classifiers)."""
    taguri = make_tag_uri(tag) if tag else None
    tagset = emit.tag_triples(tag, timestamp) if tag else set()
    inc, exc = tuple(include), tuple(exclude)

    def f(t: pa.Table) -> pa.Table:
        # resolve the registry ON THE WORKER: shipping Classifier
        # objects through the closure would pickle copies and break
        # emit.py's identity checks (c is R.DATE etc.)
        clfs = R.select_classifiers(inc, exc)
        triples = set()
        for fields in t.column("fields").to_pylist():
            mentions = [
                emit.make_mention(
                    R.cast_datum(x, na_str=na_str, classifiers=clfs),
                    x, na_str=na_str)
                for x in fields
            ]
            triples |= emit.connect(mentions, levels=levels, taguri=taguri)
        return triples_to_table(sorted(triples))

    out = rows_ds.map_batches(f, batch_format="pyarrow")
    if tagset:
        import ray.data as rd

        out = out.union(rd.from_arrow(triples_to_table(sorted(tagset))))
    return _finish(out, canonical)


# ----------------------------------------------------------------------
# Unpublished-sequence prep: forced-role first field (§2.11,
# IrregularFasta/IrregularStrain, recipes.py:510-543 + ui.py:931-995)
# ----------------------------------------------------------------------
def prep_unpublished(rows_ds, *, tag: Optional[str] = None, timestamp: str = "",
                     levels=None, na_str: Sequence[str] = NA_DEFAULT,
                     canonical: bool = True,
                     include: Sequence[str] = (), exclude: Sequence[str] = ()):
    """FASTA-shaped ragged rows where field 0 is FORCED to be a strain
    identifier (matches anything — idiosyncratic unpublished ids), the
    remaining fields are Datum-cast normally, and every sequence token
    is additionally tagged 'unpublished' (IrregularFasta.connect,
    recipes.py:535-543).  The forced strain mention is appended AFTER
    the others, matching the reference's token order."""
    taguri = make_tag_uri(tag) if tag else None
    tagset = emit.tag_triples(tag, timestamp) if tag else set()
    inc, exc = tuple(include), tuple(exclude)
    unpub = make_tag_uri("unpublished")

    def f(t: pa.Table) -> pa.Table:
        clfs = R.select_classifiers(inc, exc)  # worker-side, see prep_fasta
        triples = set()
        for fields in t.column("fields").to_pylist():
            if not fields:
                continue
            strain = emit.make_mention(R.IRREGULAR_STRAIN, fields[0],
                                       na_str=na_str)
            mentions = [
                emit.make_mention(
                    R.cast_datum(x, na_str=na_str, classifiers=clfs),
                    x, na_str=na_str)
                for x in fields[1:]
            ] + [strain]
            triples |= emit.connect(mentions, levels=levels, taguri=taguri)
            for m in mentions:
                if m.group == R.G_SEQUENCE and m.clean is not None:
                    uri = m.as_uri()
                    if uri:
                        triples.add((uri, P.tag, unpub, DT_URI))
        return triples_to_table(sorted(triples))

    out = rows_ds.map_batches(f, batch_format="pyarrow")
    if tagset:
        import ray.data as rd

        out = out.union(rd.from_arrow(triples_to_table(sorted(tagset))))
    return _finish(out, canonical)


# ----------------------------------------------------------------------
# Table prep with distributed column vote (A8)
# ----------------------------------------------------------------------
def vote_types(table_ds, *, na_str: Sequence[str] = NA_DEFAULT,
               threshold: float = 0.8,
               include: Sequence[str] = (),
               exclude: Sequence[str] = ()) -> Dict[str, str]:
    """Distributed HomoList.cast vote (classes.py:131-138): pass 1
    computes per-batch (column, classifier) match counts inside
    map_batches, a small sum-aggregate collapses them, and the driver
    does the priority-ordered argmax.  Returns {column -> classifier
    name}.  The counts table is tiny (|cols| x |classifiers| rows per
    batch) regardless of input size."""
    from ray.data.aggregate import Sum

    registry = R.select_classifiers(include, exclude)

    def partial(t: pa.Table) -> pa.Table:
        cols: List[str] = []
        clfs: List[str] = []
        hits: List[int] = []
        n_all: List[int] = []
        n_nonna: List[int] = []
        for col in t.schema.names:
            vals = t.column(col).to_pylist()
            present = [x for x in vals if x is not None and x not in na_str]
            for c in registry:
                if c.is_sequence:
                    h = sum(
                        1 for x in present if len(str(x)) > 20 and c.test_one(x)
                    )
                else:
                    h = sum(1 for x in present if c.test_one(x) is not None)
                cols.append(col)
                clfs.append(c.name)
                hits.append(h)
                n_all.append(len(vals))
                n_nonna.append(len(present))
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "clf": pa.array(clfs, pa.string()),
                "hits": pa.array(hits, pa.int64()),
                "n_all": pa.array(n_all, pa.int64()),
                "n_nonna": pa.array(n_nonna, pa.int64()),
            }
        )

    agg = (
        table_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["col", "clf"])
        .aggregate(
            Sum("hits", alias_name="hits"),
            Sum("n_all", alias_name="n_all"),
            Sum("n_nonna", alias_name="n_nonna"),
        )
    )
    by_col: Dict[str, Dict[str, tuple]] = {}
    for row in agg.take_all():
        by_col.setdefault(row["col"], {})[row["clf"]] = (
            row["hits"], row["n_all"], row["n_nonna"],
        )
    chosen: Dict[str, str] = {}
    for col, stats in by_col.items():
        pick = R.UNKNOWN.name
        for c in registry:
            h, na, nn = stats.get(c.name, (0, 0, 0))
            denom = na if c.is_sequence else nn
            if denom > 0 and h / denom > threshold:
                pick = c.name
                break
        chosen[col] = pick
    return chosen


def prep_table(table_ds, *, tag: Optional[str] = None, timestamp: str = "",
               na_str: Sequence[str] = NA_DEFAULT, levels=None,
               types: Optional[Dict[str, str]] = None, canonical: bool = True,
               include: Sequence[str] = (), exclude: Sequence[str] = (),
               segment_key: bool = False):
    """String-column table -> triples.  Column types come from the
    distributed vote (or the ``types`` override); each row becomes a
    Phrase whose mention fields carry the column name (tabularTyping,
    classes.py:192-226).  ``include``/``exclude`` amend the classifier
    registry for both the vote and the cast (ui.py:812-818).

    ``segment_key=True`` is the IrregularSegmentTable mode
    (recipes.py:559-573 + ui.py --segment-key): the FIRST column is
    forced to be a segment identifier (matches anything, mints a
    segment URI, emits no predicate of its own) and is excluded from
    the vote; the remaining columns' literals attach to it."""
    seg_col: Optional[str] = None
    vote_ds = table_ds
    if segment_key:
        names_all = _schema_names(table_ds)
        if not names_all:
            raise ValueError("segment_key table must have at least 1 column")
        seg_col = names_all[0]
        rest = names_all[1:]
        vote_ds = table_ds.select_columns(rest) if rest else None
    chosen = types or (
        vote_types(vote_ds, na_str=na_str, include=include, exclude=exclude)
        if vote_ds is not None else {})
    taguri = make_tag_uri(tag) if tag else None
    tagset = emit.tag_triples(tag, timestamp) if tag else set()

    def f(t: pa.Table) -> pa.Table:
        names = [c for c in t.schema.names if c != seg_col]
        clfs = {col: R.BY_NAME[chosen.get(col, "unknown")] for col in names}
        cols = {col: t.column(col).to_pylist() for col in names}
        segs = t.column(seg_col).to_pylist() if seg_col is not None else None
        triples = set()
        for i in range(t.num_rows):
            mentions = [
                emit.make_mention(clfs[col], cols[col][i], field=col, na_str=na_str)
                for col in names
            ]
            if segs is not None:
                # appended after the others (IrregularSegmentTable.cast
                # appends the forced token to each phrase); field=None so
                # the token is addressable only as a URI
                mentions.append(emit.make_mention(
                    R.IRREGULAR_SEGMENT, segs[i], na_str=na_str))
            triples |= emit.connect(mentions, levels=levels, taguri=taguri)
        return triples_to_table(sorted(triples))

    out = table_ds.map_batches(f, batch_format="pyarrow")
    if tagset:
        import ray.data as rd

        out = out.union(rd.from_arrow(triples_to_table(sorted(tagset))))
    return _finish(out, canonical)


# ----------------------------------------------------------------------
# BLAST outfmt-6 (S9, recipes.py:21-71)
# ----------------------------------------------------------------------
_BLAST_COLS = [
    ("qseqid", DT_URI), ("sseqid", DT_URI), ("pident", DT_DOUBLE),
    ("length", DT_INT), ("mismatch", DT_INT), ("gapopen", DT_INT),
    ("qstart", DT_INT), ("qend", DT_INT), ("sstart", DT_INT),
    ("send", DT_INT), ("evalue", DT_DOUBLE), ("bitscore", DT_DOUBLE),
]


def prep_blast(blast_ds, *, tag: Optional[str] = None, timestamp: str = "",
               canonical: bool = True):
    """BLAST outfmt-6 Dataset (12 string columns named as in
    _BLAST_COLS) -> one BlastResult entity per row
    (mk_blast, recipes.py:21-71): huid = fid:blast/{qseqid}-{sseqid}-
    {bitscore}; qseqid/sseqid as URI objects, metrics as typed
    literals.  Pure projection — no grouping, no shuffle beyond the
    final dedup."""
    taguri = make_tag_uri(tag) if tag else None
    tagset = emit.tag_triples(tag, timestamp) if tag else set()

    def f(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pylist() for c, _ in _BLAST_COLS}
        triples = []
        for i in range(t.num_rows):
            q, s_, bits = cols["qseqid"][i], cols["sseqid"][i], cols["bitscore"][i]
            huid = make_uri(f"blast/{q}-{s_}-{bits}")
            if taguri:
                triples.append((huid, P.tag, taguri, DT_URI))
            for c, dt in _BLAST_COLS:
                v = cols[c][i]
                if dt == DT_URI:
                    triples.append((huid, getattr(P, c), make_uri(v), DT_URI))
                else:
                    # numeric normalization matches make_literal
                    # (float()/int() round-trip, recipes.py:60-69)
                    lex = str(float(v)) if dt == DT_DOUBLE else str(int(v))
                    triples.append((huid, getattr(P, c), lex, dt))
        return triples_to_table(triples)

    out = blast_ds.map_batches(f, batch_format="pyarrow")
    if tagset:
        import ray.data as rd

        out = out.union(rd.from_arrow(triples_to_table(sorted(tagset))))
    return _finish(out, canonical)


# ----------------------------------------------------------------------
# IVR / IRD positional recipes (S7/S8, recipes.py:74-151)
# ----------------------------------------------------------------------
_IVR_STRAIN_PAT = __import__("re").compile(r"[ABCD]/[^()\[\]]+")


def prep_ivr(ds, *, levels=None, canonical: bool = True):
    """IVR 'influenza_na' table -> triples with the reference's FIXED
    11-column positional map (mk_influenza_na, recipes.py:74-110):
    genbank, host (lowered), segment number, subtype, country, date,
    length, strain extracted from the garnished name via
    [ABCD]/[^()\\[\\]]+, skip, skip, genome_status.  Columns by
    position (c0..c10, headerless input)."""

    def f(t: pa.Table) -> pa.Table:
        names = t.schema.names
        cols = [t.column(c).to_pylist() for c in names]
        triples = set()
        for i in range(t.num_rows):
            v = [c[i] for c in cols]
            raw = v[7] or ""
            m = _IVR_STRAIN_PAT.search(raw)
            mentions = [
                emit.make_mention(R.GENBANK, v[0]),
                emit.make_mention(R.UNKNOWN, (v[1] or "").lower(), field="host"),
                emit.make_mention(R.SEGMENT_NUMBER, v[2]),
                emit.make_mention(R.SUBTYPE, v[3]),
                emit.make_mention(R.COUNTRY, v[4]),
                emit.make_mention(R.DATE, v[5]),
                emit.make_mention(R.INTEGER, (v[6] or "").lower(), field="length"),
                emit.make_mention(R.STRAIN, m.group(0) if m else None),
                emit.make_mention(R.UNKNOWN, (v[10] or "").strip(),
                                  field="genome_status"),
            ]
            triples |= emit.connect(mentions, levels=levels)
        return triples_to_table(sorted(triples))

    return _finish(ds.map_batches(f, batch_format="pyarrow"), canonical)


def prep_ird(ds, *, levels=None, canonical: bool = True):
    """IRD table -> triples with the reference's FIXED positional map
    (mk_ird, recipes.py:113-151): segment number, (skip protein),
    genbank as genbank_id, (skip complete-genome), length, subtype,
    date, host with the 'IRD:' prefix stripped and lowered, country,
    (skip state — parsed from the strain name), flu_season, strain as
    strain_name; '-N/A-' folds to missing throughout."""
    na = ("-N/A-",)

    def f(t: pa.Table) -> pa.Table:
        names = t.schema.names
        cols = [t.column(c).to_pylist() for c in names]
        triples = set()
        for i in range(t.num_rows):
            v = [c[i] for c in cols]
            host = (v[7] or "").replace("IRD:", "").lower()
            mentions = [
                emit.make_mention(R.SEGMENT_NUMBER, v[0], na_str=na),
                emit.make_mention(R.GENBANK, v[2], field="genbank_id", na_str=na),
                emit.make_mention(R.INTEGER, v[4], field="length", na_str=na),
                emit.make_mention(R.SUBTYPE, v[5], na_str=na),
                emit.make_mention(R.DATE, v[6], na_str=na),
                emit.make_mention(R.UNKNOWN, host, field="host", na_str=na),
                emit.make_mention(R.COUNTRY, v[8]),
                emit.make_mention(R.UNKNOWN, v[10], field="flu_season", na_str=na),
                emit.make_mention(R.STRAIN, v[11], field="strain_name", na_str=na),
            ]
            triples |= emit.connect(mentions, levels=levels)
        return triples_to_table(sorted(triples))

    return _finish(ds.map_batches(f, batch_format="pyarrow"), canonical)


# ----------------------------------------------------------------------
# GISAID metadata recipe (S6, recipes.py:154-234)
# ----------------------------------------------------------------------
_GIS_SEGMENTS = ("PB2", "PB1", "PA", "HA", "NP", "NA", "MP", "NS")
_GIS_EPI_TAIL = __import__("re").compile(r" *\|.*")


def prep_gisaid(gis_ds, *, canonical: bool = True):
    """GISAID metadata table -> triples (mk_gis, recipes.py:154-234).

    One input row fans out into up to 8 segments x k comma-separated
    (EPI seqid, INSDC id) pairs — the widest unnest in the reference
    (SURVEY.md S6) — each pair re-connected as a Phrase with the
    row-level strain/host/subtype/date tokens.  Expressed as one
    ``map_batches`` (1 -> N row fan-out inside the batch, no shuffle).

    Expected columns: Isolate_Id, Isolate_Name, Host, Subtype,
    Lineage, Location, Collection_Date, Submission_Date, and per
    segment "<SEG> Segment_Id" / "<SEG> INSDC_Upload" (nullable).
    """
    from octoray.functions.identifiers import match_strain

    def row_triples(row: Dict[str, Optional[str]]):
        triples = set()
        iso = emit.make_mention(R.ISOLATE, row.get("Isolate_Id"))
        name_raw = row.get("Isolate_Name") or ""
        # strip parenthesized garbage after the strain name; keep the
        # full ugly name under its own field (recipes.py:166-173)
        cleaned = match_strain(name_raw)
        strain = emit.make_mention(R.UNKNOWN, cleaned or name_raw or None,
                                   field="strain_name")
        full_name = emit.make_mention(R.UNKNOWN, name_raw or None,
                                      field="gisaid_strain_name", na_str=("",))
        host = emit.make_mention(R.HOST, row.get("Host"), field="host")
        subtype = emit.make_mention(R.SUBTYPE, row.get("Subtype"), field="gisaid_subtype")
        lineage = emit.make_mention(R.STRING, row.get("Lineage"), field="lineage",
                                    na_str=("",))
        loc = row.get("Location")
        parts = loc.split(" / ") if loc else []
        country = emit.make_mention(R.COUNTRY, parts[1] if len(parts) > 1 else None)
        date = emit.make_mention(R.DATE, row.get("Collection_Date"), field="collection_date")
        sub_date = emit.make_mention(R.DATE, row.get("Submission_Date"),
                                     field="submission_date")
        for seg in _GIS_SEGMENTS:
            seg_ids = row.get(f"{seg} Segment_Id")
            if not seg_ids:
                continue
            seg_tok = emit.make_mention(R.SEGMENT_NAME, seg)
            epi_ids = [_GIS_EPI_TAIL.sub("", x) for x in str(seg_ids).split(",")]
            insdc = row.get(f"{seg} INSDC_Upload")
            gbk_ids: List[Optional[str]] = (
                list(str(insdc).split(",")) if insdc else [None]
            )
            for epi_id, gbk_id in zip(epi_ids, gbk_ids):
                mentions = [
                    iso,
                    emit.make_mention(R.EPI_SEQID, epi_id),
                    emit.make_mention(R.GENBANK, gbk_id),
                    strain, full_name, seg_tok, subtype, lineage, host,
                    country, date, sub_date,
                ]
                triples |= emit.connect(mentions, levels=None)
        return triples

    def f(t: pa.Table) -> pa.Table:
        triples = set()
        cols = {c: t.column(c).to_pylist() for c in t.schema.names}
        for i in range(t.num_rows):
            triples |= row_triples({c: cols[c][i] for c in cols})
        return triples_to_table(sorted(triples))

    out = gis_ds.map_batches(f, batch_format="pyarrow")
    return _finish(out, canonical)


# ----------------------------------------------------------------------
# id-list tagging (S10, ui.py:600-619 / 1099-1130)
# ----------------------------------------------------------------------
def tag_ids(ids_ds, tag: str, *, timestamp: str = "", id_col: str = "id",
            canonical: bool = True):
    """Dataset of identifiers -> (fid:id, f:tag, tag:...) triples plus
    the tag's metadata record."""
    taguri = make_tag_uri(tag)
    tagset = emit.tag_triples(tag, timestamp)

    def f(t: pa.Table) -> pa.Table:
        triples = [
            (make_uri(v), P.tag, taguri, DT_URI)
            for v in t.column(id_col).to_pylist()
            if v is not None
        ]
        return triples_to_table(triples)

    import ray.data as rd

    out = ids_ds.map_batches(f, batch_format="pyarrow").union(
        rd.from_arrow(triples_to_table(sorted(tagset)))
    )
    return _finish(out, canonical)
