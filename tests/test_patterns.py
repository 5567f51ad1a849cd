"""BGP / OPTIONAL / property-path / CONSTRUCT layer (patterns.py)."""

import pyarrow as pa
import pytest

from octoray.model import DT_PLAIN, DT_URI, triples_to_table
from octoray.patterns import construct, match_patterns, select_bindings


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(triples_to_table(rows))


GRAPH = [
    ("fid:s1", "f:subtype", "H1N1", ""),
    ("fid:s1", "f:state", "IA", ""),
    ("fid:s1", "f:collection_date", "2020-01-01", "xsd:date"),
    ("fid:s2", "f:subtype", "H3N2", ""),
    ("fid:s2", "f:collection_date", "2021-02-02", "xsd:date"),
    ("fid:s3", "f:state", "MN", ""),
    ("geo:IA", "f:locatedIn", "geo:Region3", "uri"),
    ("geo:Region3", "f:locatedIn", "geo:USA", "uri"),
    ("geo:USA", "f:locatedIn", "geo:NorthAmerica", "uri"),
]


def test_conjunctive_match(ray_session):
    b = match_patterns(
        _ds(GRAPH),
        [("?s", "f:subtype", "?t"), ("?s", "f:collection_date", "?d")],
    )
    rows = {(r["s"], r["t"], r["d"]) for r in b.take_all()}
    assert rows == {
        ("fid:s1", "H1N1", "2020-01-01"),
        ("fid:s2", "H3N2", "2021-02-02"),
    }
    # hidden dt columns ride along
    cols = set(b.schema().names)
    assert {"t__dt", "d__dt"} <= cols


def test_optional_keeps_unmatched(ray_session):
    b = match_patterns(
        _ds(GRAPH),
        [("?s", "f:subtype", "?t")],
        optionals=[("?s", "f:state", "?st")],
    )
    rows = {(r["s"], r["st"]) for r in b.take_all()}
    assert rows == {("fid:s1", "IA"), ("fid:s2", None)}


def test_select_bindings_projects(ray_session):
    b = match_patterns(_ds(GRAPH), [("?s", "f:subtype", "?t")])
    out = select_bindings(b, ["s", "t"])
    assert set(out.schema().names) == {"s", "t"}


def test_property_path_plus(ray_session):
    b = match_patterns(_ds(GRAPH), [("geo:IA", "f:locatedIn+", "?a")])
    assert {r["a"] for r in b.take_all()} == {
        "geo:Region3", "geo:USA", "geo:NorthAmerica"
    }


def test_disconnected_raises(ray_session):
    with pytest.raises(ValueError, match="disconnected"):
        match_patterns(
            _ds(GRAPH),
            [("?s", "f:subtype", "?t"), ("?x", "f:state", "?y")],
        )


def test_construct_with_dt_propagation(ray_session):
    out = construct(
        _ds(GRAPH),
        where=[("?s", "f:subtype", "?t"), ("?s", "f:collection_date", "?d")],
        template=[
            ("?s", "f:dated_subtype", "?t"),
            ("?s", "f:obs_date", "?d"),
            ("?s", "f:flagged", "yes"),
        ],
    )
    rows = {tuple(r.values()) for r in out.take_all()}
    assert rows == {
        ("fid:s1", "f:dated_subtype", "H1N1", DT_PLAIN),
        ("fid:s1", "f:obs_date", "2020-01-01", "xsd:date"),
        ("fid:s1", "f:flagged", "yes", DT_PLAIN),
        ("fid:s2", "f:dated_subtype", "H3N2", DT_PLAIN),
        ("fid:s2", "f:obs_date", "2021-02-02", "xsd:date"),
        ("fid:s2", "f:flagged", "yes", DT_PLAIN),
    }


def test_construct_skips_unbound_optional_rows(ray_session):
    out = construct(
        _ds(GRAPH),
        where=[("?s", "f:subtype", "?t")],
        optionals=[("?s", "f:state", "?st")],
        template=[("?s", "f:from_state", "?st")],
    )
    rows = {tuple(r.values()) for r in out.take_all()}
    # s2 has no state -> its template row is skipped, not emitted as null
    assert rows == {("fid:s1", "f:from_state", "IA", DT_PLAIN)}


def test_construct_uri_object_keeps_uri_dt(ray_session):
    out = construct(
        _ds(GRAPH),
        where=[("?s", "f:locatedIn+", "?a")],
        template=[("?s", "f:within", "?a")],
    )
    rows = {tuple(r.values()) for r in out.take_all()}
    assert ("geo:IA", "f:within", "geo:NorthAmerica", DT_URI) in rows
    assert all(r[3] == DT_URI for r in rows)
    assert len(rows) == 6


GRAPH2 = [
    ("fid:s1", "f:state", "geo:IA", "uri"),
    ("fid:s2", "f:state", "geo:TX", "uri"),
    ("fid:s3", "f:country", "geo:CAN", "uri"),
    ("geo:IA", "f:name", "Iowa", ""),
    ("geo:TX", "f:name", "Texas", ""),
    ("fid:s1", "f:strain_name", "A/swine/Iowa/1/2020", ""),
    ("fid:s2", "f:strain_name", "B/human/Texas/2/2021", ""),
    ("fid:s3", "f:strain_name", "A/swine/Alberta/3/2019", ""),
    ("fid:s1", "f:n", "7", "xsd:integer"),
    ("fid:s2", "f:n", "12", "xsd:integer"),
]


def test_sequence_path(ray_session):
    b = match_patterns(_ds(GRAPH2), [("?s", "f:state/f:name", "?nm")])
    rows = {(r["s"], r["nm"]) for r in b.take_all()}
    assert rows == {("fid:s1", "Iowa"), ("fid:s2", "Texas")}
    # hidden sequence variables never leak
    assert not any(c.startswith("__seq") for c in b.schema().names)


def test_alternation_and_inverse(ray_session):
    b = match_patterns(_ds(GRAPH2), [("?s", "f:state|f:country", "?loc")])
    assert {r["loc"] for r in b.take_all()} == {"geo:IA", "geo:TX", "geo:CAN"}
    b2 = match_patterns(_ds(GRAPH2), [("?loc", "^f:state", "?s")])
    assert {(r["loc"], r["s"]) for r in b2.take_all()} == {
        ("geo:IA", "fid:s1"), ("geo:TX", "fid:s2")
    }


def test_filters_regex_compare_null(ray_session):
    # regex filter
    b = match_patterns(
        _ds(GRAPH2), [("?s", "f:strain_name", "?n")],
        filters=[("n", "~", "^A/")],
    )
    assert {r["s"] for r in b.take_all()} == {"fid:s1", "fid:s3"}
    # numeric comparison casts the lexical value
    b2 = match_patterns(
        _ds(GRAPH2), [("?s", "f:n", "?v")], filters=[("v", ">", 10)],
    )
    assert {r["s"] for r in b2.take_all()} == {"fid:s2"}
    # null optional bindings fail filters (SPARQL error semantics)
    b3 = match_patterns(
        _ds(GRAPH2), [("?s", "f:strain_name", "?n")],
        optionals=[("?s", "f:n", "?v")],
        filters=[("v", ">=", 0)],
    )
    assert {r["s"] for r in b3.take_all()} == {"fid:s1", "fid:s2"}
