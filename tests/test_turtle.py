"""Turtle source (sources/turtle.py): parser unit vectors and the
sink -> source roundtrip identity (reference upload path,
ui.py:561-589)."""

import pyarrow as pa
import pytest

from octoray.model import triples_to_table
from octoray.sources.turtle import (TurtleError, parse_turtle_text,
                                    read_turtle)

TTL = """\
@prefix f: <https://flu-crew.org/term/> .
@prefix fid: <https://flu-crew.org/id/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

# a comment
fid:s1 f:strain_name "A/swine/Iowa/001/2021" .
fid:s1 f:date "2021-05-04"^^xsd:date ;
       f:host "swine" , "pig" .
fid:s1 f:has_segment fid:g1 .
fid:g1 a f:segment .
"""


def test_parse_basic_forms():
    rows = parse_turtle_text(TTL)
    assert ("fid:s1", "f:strain_name", "A/swine/Iowa/001/2021", "") in rows
    assert ("fid:s1", "f:date", "2021-05-04", "xsd:date") in rows
    # ',' object list
    assert ("fid:s1", "f:host", "swine", "") in rows
    assert ("fid:s1", "f:host", "pig", "") in rows
    # IRI object + 'a' keyword
    assert ("fid:s1", "f:has_segment", "fid:g1", "uri") in rows
    assert ("fid:g1", "rdf:type", "f:segment", "uri") in rows
    assert len(rows) == 6


def test_parse_escapes_and_lang():
    rows = parse_turtle_text(r'''
        @prefix f: <https://flu-crew.org/term/> .
        <https://flu-crew.org/id/x> f:note "line\nbreak \"q\" \\ é"@en .
    ''')
    assert rows == [("fid:x", "f:note", 'line\nbreak "q" \\ é', "")]


def test_parse_local_prefix_normalizes():
    # a foreign prefix name for the same IRI base lands in engine form
    rows = parse_turtle_text("""
        @prefix flu: <https://flu-crew.org/term/> .
        <https://flu-crew.org/id/x> flu:host "swine" .
    """)
    assert rows == [("fid:x", "f:host", "swine", "")]


def test_parse_bare_numerics_and_bool():
    rows = parse_turtle_text("""
        @prefix f: <https://flu-crew.org/term/> .
        <https://flu-crew.org/id/x> f:n 42 ; f:r 1.5 ; f:b true .
    """)
    assert ("fid:x", "f:n", "42", "xsd:integer") in rows
    assert ("fid:x", "f:r", "1.5", "xsd:decimal") in rows
    assert ("fid:x", "f:b", "true", "xsd:boolean") in rows


def test_parse_sparql_style_prefix():
    rows = parse_turtle_text("""
        PREFIX f: <https://flu-crew.org/term/>
        <https://flu-crew.org/id/x> f:host "swine" .
    """)
    assert rows == [("fid:x", "f:host", "swine", "")]


@pytest.mark.parametrize("bad", [
    "<http://s> <http://p> <rel/no-base> .",   # relative IRI, no @base
    '<http://s> <http://p> ("open .',          # unterminated collection
])
def test_parse_rejects_out_of_subset(bad):
    with pytest.raises(TurtleError):
        parse_turtle_text(bad)


def test_parse_collections_and_base():
    doc = "\n".join([
        "@base <http://ex/data/> .",
        "@prefix f: <https://flu-crew.org/term/> .",
        '<rel/x> f:tags ("a" "b") ;',
        "        f:empty () .",
        '<../up> f:host "swine" .',
    ])
    rows = parse_turtle_text(doc)
    firsts = [(s, o, dt) for s, p, o, dt in rows if p == "rdf:first"]
    rests = [(s, o) for s, p, o, dt in rows if p == "rdf:rest"]
    assert [o for _, o, _ in firsts] == ["a", "b"]
    cell1, cell2 = firsts[0][0], firsts[1][0]
    assert rests == [(cell1, cell2), (cell2, "rdf:nil")]
    assert ("http://ex/data/rel/x", "f:tags", cell1, "uri") in rows
    assert ("http://ex/data/rel/x", "f:empty", "rdf:nil", "uri") in rows
    # RFC 3986 dot-segment resolution via urljoin
    assert ("http://ex/up", "f:host", "swine", "") in rows


def test_collection_labels_stable_across_splitting():
    from octoray.sources.turtle import _split_statements

    doc_lines = ["@base <http://ex/> .",
                 "@prefix f: <https://flu-crew.org/term/> ."]
    for i in range(25):
        doc_lines.append(f'<d{i}> f:tags ("t{i}" "u{i}" [ f:k "v{i}" ]) .')
    doc = "\n".join(doc_lines) + "\n"
    want = parse_turtle_text(doc)
    for target in (64, 512, 10**9):
        pieces = _split_statements(doc, target)
        got = [r for p in pieces for r in parse_turtle_text(p)]
        assert got == want, f"target={target}"


def test_parse_anonymous_blank_nodes():
    """[ pred obj ; ... ] as object (nested) and as subject; labels
    are skolemized from the statement's own source text."""
    doc = "\n".join([
        "@prefix f: <https://flu-crew.org/term/> .",
        '<https://flu-crew.org/id/x> f:loc [ f:country "usa" ;',
        '    f:nested [ f:state "IA" ] ] .',
        '[ f:host "swine" ] .',
        '[ f:host "human" ] f:note "tail" .',
    ])
    rows = parse_turtle_text(doc)
    by_pred = {(p, o) for _, p, o, _ in rows}
    assert ("f:country", "usa") in by_pred
    assert ("f:state", "IA") in by_pred
    assert ("f:host", "swine") in by_pred and ("f:note", "tail") in by_pred
    # the nested edge points from the outer anon to the inner anon
    outer = next(s for s, p, o, _ in rows if p == "f:country")
    inner = next(o for s, p, o, dt in rows
                 if p == "f:nested" and dt == "uri")
    assert outer.startswith("_:a") and inner.startswith("_:a")
    assert outer != inner
    assert next(s for s, p, _, _ in rows if p == "f:nested") == outer
    # anon-subject statements got DISTINCT labels (different source)
    swine = next(s for s, p, o, _ in rows if o == "swine")
    human = next(s for s, p, o, _ in rows if o == "human")
    assert swine != human


def test_anon_labels_stable_across_splitting():
    """Skolem labels derive from statement text, so parsing pieces
    yields the SAME rows as parsing the whole document."""
    from octoray.sources.turtle import _split_statements

    doc_lines = ["@prefix f: <https://flu-crew.org/term/> ."]
    for i in range(30):
        doc_lines.append(
            f'<https://flu-crew.org/id/s{i}> f:loc [ f:country "c{i}" ;\n'
            f'    f:inner [ f:state "st{i}" ] ] ;\n'
            f'    f:note """dot line.\nmore {i}""" .')
    doc = "\n".join(doc_lines) + "\n"
    want = parse_turtle_text(doc)
    assert len(want) == 150
    for target in (64, 512, 10**9):
        pieces = _split_statements(doc, target)
        got = [r for p in pieces for r in parse_turtle_text(p)]
        assert got == want, f"target={target}"


def test_parse_long_literals_and_blank_nodes():
    """Round-5 grammar widening (VERDICT r4 #7): triple-quoted
    literals with RAW newlines / quotes / '.'-ending inner lines, and
    labelled blank nodes as subject or object."""
    doc = "\n".join([
        "@prefix f: <https://flu-crew.org/term/> .",
        '<https://flu-crew.org/id/x> f:note """first line.',
        'second "quoted" line.',
        'third line""" .',
        '_:b1 f:host "swine" ;',
        "     f:linked _:b2 .",
        "<https://flu-crew.org/id/z> f:alt 'single' .",
    ])
    rows = parse_turtle_text(doc)
    assert rows == [
        ("fid:x", "f:note",
         'first line.\nsecond "quoted" line.\nthird line', ""),
        ("_:b1", "f:host", "swine", ""),
        ("_:b1", "f:linked", "_:b2", "uri"),
        ("fid:z", "f:alt", "single", ""),
    ]


def test_parse_single_triple_quoted_with_inner_quotes():
    doc = ("@prefix f: <https://flu-crew.org/term/> .\n"
           "<https://flu-crew.org/id/y> f:alt " +
           "'''tick " + '"dq"' + " inner''' .\n")
    rows = parse_turtle_text(doc)
    assert rows == [("fid:y", "f:alt", 'tick "dq" inner', "")]


def test_parse_long_literal_escapes_and_datatype():
    rows = parse_turtle_text(
        "@prefix f: <https://flu-crew.org/term/> .\n"
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        '<https://flu-crew.org/id/x> f:note """a\\tb"""^^xsd:string ;\n'
        '    f:tagged """hola\nmundo"""@es .\n')
    assert rows == [
        ("fid:x", "f:note", "a\tb", "xsd:string"),
        ("fid:x", "f:tagged", "hola\nmundo", ""),
    ]


def test_splitter_is_quote_aware():
    """A '.'-ending line INSIDE a long literal must never become a
    piece boundary; every split of the fixture reparses to the same
    rows as the unsplit document."""
    from octoray.sources.turtle import _split_statements

    doc_lines = ["@prefix f: <https://flu-crew.org/term/> ."]
    for i in range(40):
        doc_lines.append(
            f'<https://flu-crew.org/id/s{i}> f:note """line one.\n'
            f"inner line ends with a dot.\n"
            f'closing {i}""" ;\n    f:host "swine" .')
    doc = "\n".join(doc_lines) + "\n"
    want = parse_turtle_text(doc)
    assert len(want) == 80
    for target in (64, 256, 1024, 10**9):
        pieces = _split_statements(doc, target)
        got = [r for p in pieces for r in parse_turtle_text(p)]
        assert got == want, f"target={target} pieces={len(pieces)}"


def test_sink_source_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from octoray import sinks

    triples = [
        ("fid:s1", "f:strain_name", 'A/swine "X"/1', ""),
        ("fid:s1", "f:date", "2021-05-04", "xsd:date"),
        ("fid:s1", "f:has_segment", "fid:g1", "uri"),
        ("fid:g1", "f:genbank_id", "MG0001", ""),
    ]
    ds = rd.from_arrow(triples_to_table(sorted(triples)))
    path = str(tmp_path / "g.ttl")
    sinks.write_turtle(ds, path)
    back = read_turtle(path).to_pandas()
    got = sorted(map(tuple, back.values))
    assert got == sorted(triples)


def test_cli_upload_idempotent(ray_session, tmp_path):
    import os

    import ray.data as rd

    from octoray import sinks
    from octoray.__main__ import main

    triples = [
        ("fid:s9", "f:strain_name", "A/swine/Ohio/9/2020", ""),
        ("fid:s9", "f:host", "swine", ""),
    ]
    ttl = str(tmp_path / "up.ttl")
    sinks.write_turtle(rd.from_arrow(triples_to_table(triples)), ttl)

    store = str(tmp_path / "store")
    assert main(["upload", ttl, "--store", store]) == 0
    parts = [d for d in os.listdir(store) if d.startswith("shard=upload-")]
    assert len(parts) == 1
    got = rd.read_parquet(os.path.join(store, parts[0])).select_columns(
        ["subject", "predicate", "object", "object_datatype"]).to_pandas()
    assert sorted(map(tuple, got.values)) == sorted(triples)

    # identical content re-uploads into the SAME partition (idempotent)
    assert main(["upload", ttl, "--store", store]) == 0
    assert [d for d in os.listdir(store)
            if d.startswith("shard=upload-")] == parts


def test_cli_init_then_upload_then_query(ray_session, tmp_path):
    """init (reference ui.py:120-160) gives a valid empty store every
    consumer can run against from zero."""
    import os

    import ray.data as rd

    from octoray import sinks
    from octoray.__main__ import main
    from octoray.pipelines.pull import read_graph

    store = str(tmp_path / "fresh")
    assert main(["init", "--store", store]) == 0
    assert read_graph(store).count() == 0
    # idempotent: re-init leaves the store alone
    assert main(["init", "--store", store]) == 0

    triples = [("fid:z", "f:host", "swine", "")]
    ttl = str(tmp_path / "z.ttl")
    sinks.write_turtle(rd.from_arrow(triples_to_table(triples)), ttl)
    assert main(["upload", ttl, "--store", store]) == 0
    got = read_graph(store).select_columns(
        ["subject", "predicate", "object"]).to_pandas()
    assert sorted(map(tuple, got.values)) == [("fid:z", "f:host", "swine")]


def test_roundtrip_property(ray_session, tmp_path):
    """Arbitrary value bytes (quotes, backslashes, newlines, tabs,
    unicode) survive the sink -> source roundtrip."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from octoray.model import format_turtle_line
    from octoray.sources.turtle import parse_turtle_text

    value = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=0, max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(value)
    def check(v):
        line = format_turtle_line("fid:s", "f:note", v, "")
        assert "\n" not in line and "\r" not in line
        rows = parse_turtle_text(line)
        assert rows == [("fid:s", "f:note", v, "")]

    check()


def test_long_literal_property(ray_session):
    """Arbitrary quote-free/backslash-free content — including RAW
    newlines, NULs, '.'-ending lines and unicode — survives a
    triple-quoted literal parse verbatim (round-5 widened grammar)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    value = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               blacklist_characters='"\\'),
        min_size=0, max_size=60)

    @settings(max_examples=200, deadline=None)
    @given(value)
    def check(v):
        doc = ('@prefix f: <https://flu-crew.org/term/> .\n'
               '<https://flu-crew.org/id/x> f:note """' + v + '""" .\n')
        assert parse_turtle_text(doc) == [("fid:x", "f:note", v, "")]

    check()


def test_blank_node_label_property(ray_session):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    label = st.from_regex(r"[A-Za-z0-9_][A-Za-z0-9_-]{0,20}",
                          fullmatch=True)

    @settings(max_examples=100, deadline=None)
    @given(label, label)
    def check(a, b):
        doc = (f'_:{a} <https://flu-crew.org/term/linked> _:{b} .\n')
        assert parse_turtle_text(doc) == [
            (f"_:{a}", "f:linked", f"_:{b}", "uri")]

    check()


def test_splitter_handles_fragment_iris():
    """'#' inside an <IRI> must not start a comment in the splitter
    (it swallowed the rest of the line, mis-classifying the newline
    inside a following long literal as top-level — review r5)."""
    from octoray.sources.turtle import _split_statements

    doc = ""
    for i in range(30):
        doc += (f'<http://ex/doc#s{i}> <http://ex/ns#note> """line one.\n'
                f'inner dot line.\nclosing {i}""" .\n')
    want = parse_turtle_text(doc)
    assert len(want) == 30
    for target in (64, 256, 1024):
        pieces = _split_statements(doc, target)
        got = [r for p in pieces for r in parse_turtle_text(p)]
        assert got == want, f"target={target}"


def test_splitter_property(ray_session):
    """Property: for ANY document assembled from random statement
    shapes (fragment IRIs, long literals with raw newlines and inner
    dots, comments, short strings, blank nodes), every split target
    reparses to exactly the unsplit rows."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from octoray.sources.turtle import _split_statements

    word = st.from_regex(r"[a-z][a-z0-9]{0,8}", fullmatch=True)
    content = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               blacklist_characters='"\\'),
        min_size=0, max_size=25)

    @st.composite
    def statement(draw):
        i = draw(st.integers(0, 99))
        shape = draw(st.integers(0, 4))
        if shape == 0:
            v = draw(content)
            return f'<http://ex/doc#s{i}> <http://ex/ns#note> """{v}""" .'
        if shape == 1:
            v = draw(word)
            return f'<http://ex/d{i}> <http://ex/p> "{v}" .'
        if shape == 2:
            return f"# comment {draw(word)} with a dot."
        if shape == 3:
            return f'_:b{i} <http://ex/p> _:c{i} .'
        v = draw(word)
        return (f'<http://ex/doc#s{i}> <http://ex/ns#a> "{v}" ;\n'
                f'    <http://ex/ns#b> {draw(st.integers(0, 9))} .')

    @settings(max_examples=60, deadline=None)
    @given(st.lists(statement(), min_size=1, max_size=12),
           st.sampled_from([32, 128, 512]))
    def check(stmts, target):
        doc = "\n".join(stmts) + "\n"
        want = parse_turtle_text(doc)
        pieces = _split_statements(doc, target)
        got = [r for p in pieces for r in parse_turtle_text(p)]
        assert got == want

    check()
