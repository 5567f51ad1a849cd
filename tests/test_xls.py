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
