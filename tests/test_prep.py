"""Prep pipelines (fasta/table/blast/tag) and text sinks.

Mirrors the reference's end-to-end in-memory goldens
(runtests.py:664-764 fasta->triples; recipes.py:21-71 blast) against
the Ray pipelines.
"""

import os

import pyarrow as pa
import pytest

from octoray.sources.fasta import parse_fasta
from octoray.sources.tables import parse_tsv


FASTA = """>A/swine/Iowa/A01234567/2015|H1N1|2015-03-15
ACGTACGTACGTACGTACGTACGT
>A/human/Texas/77/2019|H3N2
TTTTACGTACGTACGTACGTTTTT
"""


def test_parse_fasta_rows():
    rows = parse_fasta(FASTA)
    assert rows == [
        ["A/swine/Iowa/A01234567/2015", "H1N1", "2015-03-15",
         "ACGTACGTACGTACGTACGTACGT"],
        ["A/human/Texas/77/2019", "H3N2", "TTTTACGTACGTACGTACGTTTTT"],
    ]


def test_parse_fasta_multiline_seq():
    rows = parse_fasta(">x|y\nACGT\nACGT\n")
    assert rows == [["x", "y", "ACGTACGT"]]


def test_parse_tsv_na_folding():
    t = parse_tsv("a\tb\n1\tNA\n2\tx\n")
    assert t.column("a").to_pylist() == ["1", "2"]
    assert t.column("b").to_pylist() == [None, "x"]


def test_prep_fasta_triples(ray_session):
    from octoray.pipelines.prep import prep_fasta
    from octoray.sources.fasta import fasta_rows
    from octoray import emit, recognize as R

    ds = prep_fasta(fasta_rows(FASTA))
    rows = ds.take_all()
    got = {(r["subject"], r["predicate"], r["object"], r["object_datatype"]) for r in rows}

    # reference-semantics oracle: per-row Datum-cast Phrase.connect
    want = set()
    for fields in parse_fasta(FASTA):
        mentions = [emit.make_mention(R.cast_datum(x), x) for x in fields]
        want |= emit.connect(mentions, levels=None)
    assert got == want
    # the strain/barcode side-emission survived (classifier_flucrew.py:250-267)
    assert any(p == "f:barcode" for _, p, _, _ in got)
    # canonical order
    keys = [tuple(r.values()) for r in rows]
    assert keys == sorted(keys)


def test_vote_types_and_prep_table(ray_session):
    import ray.data as rd

    from octoray.pipelines.prep import prep_table, vote_types

    tsv = (
        "strain\tdate\tcount\thost\n"
        "A/swine/Iowa/1/2015\t2015-01-02\t4\tswine\n"
        "A/swine/Ohio/2/2016\t2016-03-04\t7\thuman\n"
        "A/human/Iowa/3/2017\t2017-05-06\t9\tswine\n"
    )
    from octoray.sources.tables import parse_tsv as _pt

    ds = rd.from_arrow(_pt(tsv))
    types = vote_types(ds)
    assert types["strain"] == "strain_name"
    assert types["date"] == "date"
    # Integer is NOT in the reference's vote registry
    # (classifier_flucrew.py:532-564) — numeric columns fall through to
    # Unknown and emit via the column-name property (f:count)
    assert types["count"] == "unknown"
    assert types["host"] == "host"

    triples = prep_table(ds).take_all()
    got = {(r["subject"], r["predicate"], r["object"]) for r in triples}
    # strain URIs carry their dates (StrainAttribute.relate)
    assert ("fid:a%2Fswine%2Fiowa%2F1%2F2015", "f:date", "2015-01-02") in got
    # ad-hoc column name -> property for the integer column
    assert any(p == "f:count" for _, p, _ in got)


def test_vote_types_matches_single_pass_reference(ray_session):
    """Distributed vote == driver-side vote_column on the full column
    (the A8 partial+final==whole invariant), even when values split
    across many blocks."""
    import ray.data as rd

    from octoray.pipelines.prep import vote_types
    from octoray import recognize as R

    col = ["Georgia", "Texas", "Iowa", "Ohio"] * 10  # states, not country
    t = pa.table({"place": pa.array(col, pa.string())})
    ds = rd.from_arrow(t).repartition(8)
    assert vote_types(ds)["place"] == R.vote_column(col).name
    # single 'Georgia' alone votes country (runtests.py:631-637)
    ds1 = rd.from_arrow(pa.table({"place": pa.array(["Georgia"], pa.string())}))
    assert vote_types(ds1)["place"] == "country"


def test_prep_blast(ray_session):
    import ray.data as rd

    from octoray.pipelines.prep import prep_blast

    cols = ["qseqid", "sseqid", "pident", "length", "mismatch", "gapopen",
            "qstart", "qend", "sstart", "send", "evalue", "bitscore"]
    row = ["q1", "s1", "99.5", "100", "1", "0", "1", "100", "5", "104",
           "1e-50", "200.0"]
    ds = rd.from_arrow(pa.table({c: pa.array([v], pa.string()) for c, v in zip(cols, row)}))
    got = {(r["subject"], r["predicate"], r["object"], r["object_datatype"])
           for r in prep_blast(ds).take_all()}
    huid = "fid:blast%2Fq1_s1_200.0"  # make_uri folds [ -]+ -> _ (nomenclature.py:59-66)
    assert (huid, "f:qseqid", "fid:q1", "uri") in got
    assert (huid, "f:pident", "99.5", "xsd:double") in got
    assert (huid, "f:length", "100", "xsd:integer") in got
    assert (huid, "f:evalue", "1e-50", "xsd:double") in got
    assert len(got) == 12


def test_tag_ids(ray_session):
    import ray.data as rd

    from octoray.pipelines.prep import tag_ids

    ds = rd.from_arrow(pa.table({"id": pa.array(["A01234567", "EPI_ISL_42"], pa.string())}))
    got = {(r["subject"], r["predicate"], r["object"]) for r in
           tag_ids(ds, "mytag", timestamp="2024-01-01").take_all()}
    assert ("fid:a01234567", "f:tag", "tag:mytag") in got
    assert ("tag:mytag", "f:name", "mytag") in got
    assert ("tag:mytag", "f:time", "2024-01-01") in got


def test_sinks_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from octoray import sinks
    from octoray.pipelines.prep import prep_fasta
    from octoray.sources.fasta import fasta_rows, parse_fasta

    triples = prep_fasta(fasta_rows(FASTA))
    ttl = sinks.write_turtle(triples, str(tmp_path / "g.ttl"))
    text = open(ttl).read()
    assert text.startswith("@prefix f: <https://flu-crew.org/term/> .")
    assert 'f:dnaseq' in text and text.rstrip().endswith(".")
    # line count = prefixes + triples
    n_triples = triples.count()
    assert len([l for l in text.splitlines() if l]) == n_triples + len(sinks.PREFIXES)

    # FASTA sink roundtrip: (strain, subtype, seq) -> text -> parse back
    ds = rd.from_arrow(pa.table({
        "strain": pa.array(["A/x/1/2020", "A/y/2/2021"]),
        "subtype": pa.array(["H1N1", None]),
        "seq": pa.array(["ACGT", "GGTT"]),
    }))
    fp = sinks.write_fasta(ds, ["strain", "subtype", "seq"], str(tmp_path / "o.fa"))
    assert parse_fasta(open(fp).read()) == [
        ["A/x/1/2020", "H1N1", "ACGT"], ["A/y/2/2021", "", "GGTT"]]

    tp = sinks.write_tsv(ds, str(tmp_path / "o.tsv"))
    lines = open(tp).read().splitlines()
    assert lines[0] == "strain\tsubtype\tseq"
    assert lines[1] == "A/x/1/2020\tH1N1\tACGT"
    assert lines[2] == "A/y/2/2021\t\tGGTT"


def test_prep_gisaid(ray_session):
    """mk_gis semantics (recipes.py:154-234): 8-segment unnest, EPI
    tail-stripping, paren-free strain vs full gisaid name."""
    import ray.data as rd

    from octoray.pipelines.prep import prep_gisaid
    from octoray.sources.synth import synth_gisaid_table

    t = synth_gisaid_table(20)
    got = prep_gisaid(rd.from_arrow(t)).take_all()
    trip = {(r["subject"], r["predicate"], r["object"]) for r in got}
    # the ISOLATE is the strain-group entity (Isolate(StrainToken),
    # classifier_flucrew.py:221): names attach to fid:epi_isl_*, and
    # has_segment fans out to the EPI seqid + genbank segment URIs
    iso_subjects = {s for s, p, o in trip if p == "f:strain_name"}
    assert iso_subjects and all(s.startswith("fid:epi_isl_") for s in iso_subjects)
    # cleaned vs full name on the same isolate (recipes.py:166-173)
    full = {(s, o) for s, p, o in trip if p == "f:gisaid_strain_name"}
    assert any("(H1N1)" in o for _, o in full)
    clean = {(s, o) for s, p, o in trip if p == "f:strain_name"}
    assert all("(" not in o for _, o in clean)
    # EPI garbage suffix stripped: no object may contain ' | junk'
    assert not any("junk" in o for _, _, o in trip)
    # segment fan-out present, pointing at epi/genbank segment URIs
    segs = {o for s, p, o in trip if p == "f:has_segment"}
    assert segs and all(o.startswith(("fid:epi", "fid:mh")) for o in segs)
    # deterministic
    got2 = prep_gisaid(rd.from_arrow(synth_gisaid_table(20))).take_all()
    assert got == got2


def test_prep_ivr_positional_map(ray_session):
    """mk_influenza_na parity (recipes.py:74-110): strain extracted
    from the garnished name, host lowered, length typed, genome_status
    kept as a literal field."""
    import pyarrow as pa
    import ray.data as rd

    from octoray.pipelines.prep import prep_ivr

    row = ["MH201254", "SWINE", "4", "H1N1", "Canada", "2014-09-13",
           "1701", "Influenza A virus (A/swine/Alberta/SD0222/2014(H1N1))",
           "na", "na", " c\n"]
    t = pa.table({f"c{i}": pa.array([v], pa.string()) for i, v in enumerate(row)})
    got = {(r["predicate"], r["object"]) for r in prep_ivr(rd.from_arrow(t)).take_all()}
    subj = "fid:a%2Fswine%2Falberta%2Fsd0222%2F2014"
    assert ("f:strain_name", "A/swine/Alberta/SD0222/2014") in got
    assert ("f:host", "swine") in got
    assert ("f:genome_status", "c") in got
    assert ("f:length", "1701") in got
    assert ("f:segment_number", "4") in got
    rows = {(r["subject"], r["predicate"], r["object"])
            for r in prep_ivr(rd.from_arrow(t)).take_all()}
    assert (subj, "f:has_segment", "fid:mh201254") in rows


def test_prep_ird_na_folding(ray_session):
    """mk_ird parity (recipes.py:113-151): '-N/A-' folds to missing,
    IRD: host prefix stripped + lowered, flu_season literal kept."""
    import pyarrow as pa
    import ray.data as rd

    from octoray.pipelines.prep import prep_ird

    row = ["4", "HA", "MH201254", "Yes", "-N/A-", "H1N1", "-N/A-",
           "IRD:Swine", "USA", "na", "16-17", "A/swine/Iowa/1/2016"]
    t = pa.table({f"c{i}": pa.array([v], pa.string()) for i, v in enumerate(row)})
    got = {(r["predicate"], r["object"]) for r in prep_ird(rd.from_arrow(t)).take_all()}
    assert ("f:host", "swine") in got
    assert ("f:flu_season", "16-17") in got
    assert ("f:strain_name", "A/swine/Iowa/1/2016") in got
    # -N/A- length and date never emit
    assert not any(p == "f:length" for p, _ in got)
    assert not any(p == "f:date" for p, _ in got)


UNPUB_FASTA = """>weird lab id 001|2020-12-31|USA
ACGTACGTACGTACGTACGTACGT
>another-odd-id|CAN
TTTTACGTACGTACGTACGTTTTT
"""


def test_prep_unpublished_forced_strain_and_tag(ray_session):
    """IrregularFasta semantics (reference recipes.py:510-543): field 0
    is forced to a strain id (even when no strain classifier matches),
    sequences get the automatic 'unpublished' tag, and the --tag option
    tags as usual on top."""
    from octoray.model import chksum
    from octoray.pipelines.prep import prep_unpublished
    from octoray.sources.fasta import fasta_rows

    rows = prep_unpublished(
        fasta_rows(UNPUB_FASTA), tag="b1", timestamp="2026-01-01").take_all()
    got = {(r["subject"], r["predicate"], r["object"]) for r in rows}

    # forced strain id: spaces -> underscores (StrainToken.munge), any
    # text accepted; URI minting folds remaining punctuation too
    assert ("fid:weird_lab_id_001", "f:strain_id", "weird_lab_id_001") in got
    assert ("fid:weird_lab_id_001", "f:date", "2020-12-31") in got
    assert ("fid:weird_lab_id_001", "f:country", "world:USA") in got
    # strain -> sequence link via md5 content address
    md5_1 = chksum("ACGTACGTACGTACGTACGTACGT")
    assert ("fid:weird_lab_id_001", "f:has_segment", "fid:" + md5_1) in got
    # automatic unpublished tag on the SEQUENCE uri (recipes.py:535-543)
    assert ("fid:" + md5_1, "f:tag", "tag:unpublished") in got
    # the explicit --tag still applies
    assert ("fid:weird_lab_id_001", "f:tag", "tag:b1") in got
    # second record: no date, country only; dash folds to _ in the URI
    assert ("fid:another_odd_id", "f:country", "world:CAN") in got
    assert ("fid:another_odd_id", "f:strain_id", "another-odd-id") in got


def test_prep_table_segment_key(ray_session):
    """IrregularSegmentTable semantics (recipes.py:559-573): first
    column forced to a segment id that mints a URI and receives the
    other columns' literals, but emits no predicate of its own."""
    import ray.data as rd

    from octoray.pipelines.prep import prep_table
    from octoray.sources.tables import parse_tsv

    # column names deliberately OUTSIDE STRAIN_FIELDS: strain-field
    # columns (date/host/...) route to strain tokens in relate() and
    # there is no strain here — same as the reference's SegmentToken
    # STRAIN_FIELDS guard (classifier_flucrew.py:343-347)
    tsv = (
        "seqid\tcollected\tpct\n"
        "chk-0001\t2015-01-02\t0.75\n"
        "chk-0002\t2016-03-04\t0.25\n"
    )
    rows = prep_table(rd.from_arrow(parse_tsv(tsv)), segment_key=True).take_all()
    got = {(r["subject"], r["predicate"], r["object"]) for r in rows}
    assert ("fid:chk_0001", "f:collected", "2015-01-02") in got
    assert ("fid:chk_0001", "f:pct", "0.75") in got
    assert ("fid:chk_0002", "f:pct", "0.25") in got
    # the forced segment token itself emits NO predicate (typename None)
    assert not any(o == "chk-0001" for _, _, o in got)


def test_select_classifiers_include_exclude():
    from octoray import recognize as R

    names = [c.name for c in R.select_classifiers()]
    assert names == [c.name for c in R.ALL_CLASSIFIERS]
    only = R.select_classifiers(include=("date", "host"))
    assert [c.name for c in only] == ["date", "host"]  # priority order kept
    no_date = R.select_classifiers(exclude=("date",))
    assert "date" not in [c.name for c in no_date]
    # nonsense include falls back to unknown-only rather than empty
    assert [c.name for c in R.select_classifiers(include=("nope",))] == ["unknown"]


def test_prep_fasta_exclude_changes_typing(ray_session):
    """--exclude removes a classifier: dates then fall through to the
    next matcher (Unknown) and the date triples disappear."""
    from octoray.pipelines.prep import prep_fasta
    from octoray.sources.fasta import fasta_rows

    base = {(r["subject"], r["predicate"], r["object"])
            for r in prep_fasta(fasta_rows(FASTA)).take_all()}
    nodate = {(r["subject"], r["predicate"], r["object"])
              for r in prep_fasta(fasta_rows(FASTA), exclude=("date",)).take_all()}
    assert any(p == "f:date" for _, p, _ in base)
    assert not any(p == "f:date" for _, p, _ in nodate)


def test_ntriples_roundtrip_identity(ray_session, tmp_path):
    """sink -> .nt file -> Turtle-source parse is identity, including
    escapes, unicode, datatype tags and prefix re-abbreviation."""
    import pyarrow as pa
    import ray.data as rd

    from octoray.model import triples_to_table
    from octoray.sinks import ntriples_lines, write_ntriples
    from octoray.sources.turtle import read_turtle

    rows = [
        ("fid:a", "f:name", 'he said "hi"\nline2\tand \\slash', ""),
        ("fid:a", "f:date", "2020-01-02", "xsd:date"),
        ("fid:a", "f:link", "fid:b", "uri"),
        ("fid:b", "f:note", "café — naïve", ""),
        ("http://example.org/x", "f:link", "http://example.org/y", "uri"),
    ]
    ds = rd.from_arrow(triples_to_table(rows))
    path = str(tmp_path / "g.nt")
    write_ntriples(ds, path)
    # every line is a strict single-line statement
    lines = open(path, encoding="utf-8").read().splitlines()
    assert len(lines) == len(rows) and all(l.endswith(" .") for l in lines)
    assert all("\n" not in l for l in lines)
    back = read_turtle(path).to_pandas().sort_values(
        ["subject", "predicate", "object"]).reset_index(drop=True)
    want = triples_to_table(rows).to_pandas().sort_values(
        ["subject", "predicate", "object"]).reset_index(drop=True)
    assert back.equals(want)

    # line shape: full IRIs in <>, typed literal tag expanded
    nt = {l.split(" ", 1)[0]: l for l in lines}
    assert any("^^<" in l and "XMLSchema#date" in l for l in lines)
    assert all(k.startswith("<http") for k in nt)
