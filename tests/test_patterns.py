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


def test_zero_length_path_constant_endpoint_reflexive(ray_session):
    """`<s> p? ?o` / `<s> p* ?o` must yield the reflexive s=o solution
    even when s has NO p edge (ADVICE r3: the identity set used to be
    only p-incident nodes)."""
    # fid:s1 has no f:locatedIn edge at all
    b = match_patterns(_ds(GRAPH), [("fid:s1", "f:locatedIn?", "?a")])
    assert {r["a"] for r in b.take_all()} == {"fid:s1"}
    b2 = match_patterns(_ds(GRAPH), [("fid:s1", "f:locatedIn*", "?a")])
    assert {r["a"] for r in b2.take_all()} == {"fid:s1"}
    # an incident node still gets identity + hops, no duplicates
    b3 = match_patterns(_ds(GRAPH), [("geo:IA", "f:locatedIn?", "?a")])
    assert sorted(r["a"] for r in b3.take_all()) == [
        "geo:IA", "geo:Region3"]


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


def test_seq_paths_in_where_and_optional_do_not_collide(ray_session):
    """where[0] and optionals[0] both expand composite paths; their
    hidden intermediates must be independent (a shared '__seq0' name
    silently joined unrelated hops)."""
    g = [
        ("fid:s1", "f:p1", "geo:m1", "uri"),
        ("geo:m1", "f:p2", "END1", ""),
        ("fid:s1", "f:q1", "geo:k1", "uri"),
        ("geo:k1", "f:q2", "END2", ""),
        # a second s with p-path but a DIFFERENT q intermediate value
        ("fid:s2", "f:p1", "geo:m2", "uri"),
        ("geo:m2", "f:p2", "END3", ""),
        ("fid:s2", "f:q1", "geo:k2", "uri"),
        ("geo:k2", "f:q2", "END4", ""),
    ]
    b = match_patterns(
        _ds(g),
        [("?s", "f:p1/f:p2", "?o")],
        optionals=[("?s", "f:q1/f:q2", "?y")],
    )
    rows = {(r["s"], r["o"], r["y"]) for r in b.take_all()}
    assert rows == {("fid:s1", "END1", "END2"), ("fid:s2", "END3", "END4")}


def test_optional_composite_path_is_atomic(ray_session):
    """A partially-matching optional path yields ONE unmatched row,
    not one per dangling intermediate."""
    g = [
        ("fid:s1", "f:name", "one", ""),
        # three p1 hops, NONE of which completes with p2
        ("fid:s1", "f:p1", "geo:a", "uri"),
        ("fid:s1", "f:p1", "geo:b", "uri"),
        ("fid:s1", "f:p1", "geo:c", "uri"),
    ]
    b = match_patterns(
        _ds(g),
        [("?s", "f:name", "?n")],
        optionals=[("?s", "f:p1/f:p2", "?y")],
    )
    rows = [(r["s"], r["n"], r["y"]) for r in b.take_all()]
    assert rows == [("fid:s1", "one", None)]


def test_filter_numeric_on_mixed_lexicals(ray_session):
    """A non-numeric bound value fails a numeric filter (SPARQL error
    semantics) instead of crashing the cast."""
    g = [
        ("fid:s1", "f:v", "7", "xsd:integer"),
        ("fid:s2", "f:v", "abc", ""),
        ("fid:s3", "f:v", "12.5", "xsd:double"),
        ("fid:s4", "f:v", "-3e1", "xsd:double"),
    ]
    b = match_patterns(_ds(g), [("?s", "f:v", "?v")],
                       filters=[("v", ">", 5)])
    assert {r["s"] for r in b.take_all()} == {"fid:s1", "fid:s3"}


def test_filter_date_part_accessors(ray_session):
    """YEAR()/MONTH()/DAY() in FILTER (reference wgs.rq:46-50): parts
    extract from the lexical ISO form; partial dates missing the part
    fail the filter (SPARQL error semantics); non-dates fail too."""
    g = [
        ("fid:s1", "f:date", "2019-08-15", "xsd:date"),
        ("fid:s2", "f:date", "2019-03-15", "xsd:date"),
        ("fid:s3", "f:date", "2019", "xsd:gYear"),          # no month
        ("fid:s4", "f:date", "2018-12", "xsd:gYearMonth"),  # no day
        ("fid:s5", "f:date", "not-a-date", ""),
        ("fid:s6", "f:date", "2020-07-01", "xsd:date"),
    ]
    b = match_patterns(_ds(g), [("?s", "f:date", "?d")],
                       filters=[("YEAR(?d)", "=", 2019), ("MONTH(?d)", ">", 6)])
    assert {r["s"] for r in b.take_all()} == {"fid:s1"}
    b2 = match_patterns(_ds(g), [("?s", "f:date", "?d")],
                        filters=[("DAY(?d)", "=", 15)])
    assert {r["s"] for r in b2.take_all()} == {"fid:s1", "fid:s2"}
    b3 = match_patterns(_ds(g), [("?s", "f:date", "?d")],
                        filters=[("YEAR(?d)", ">=", 2019)])
    assert {r["s"] for r in b3.take_all()} == {
        "fid:s1", "fid:s2", "fid:s3", "fid:s6"}


def test_aggregate_bindings(ray_session):
    """GROUP BY + aggregate head: group_concat is sorted-distinct,
    min/max/count skip unbound values (SPARQL aggregate semantics)."""
    from octoray.patterns import aggregate_bindings

    g = [
        ("fid:s1", "f:v", "b", ""),
        ("fid:s1", "f:v", "a", ""),
        ("fid:s1", "f:v", "b", ""),
        ("fid:s2", "f:v", "z", ""),
    ]
    b = match_patterns(_ds(g), [("?s", "f:v", "?v")])
    out = {r["s"]: r for r in aggregate_bindings(
        b, ["s"],
        [("v", "group_concat", "vals"), ("v", "min", "lo"),
         ("v", "max", "hi"), ("v", "count", "n"),
         ("v", "count_distinct", "nd")]).take_all()}
    # NB: bindings mirror the INPUT multiset — canonical triple stores
    # are deduped upstream, but this raw fixture carries ('s1','b')
    # twice, so count == 3 while count_distinct == 2
    assert out["fid:s1"]["vals"] == "a+b"
    assert (out["fid:s1"]["lo"], out["fid:s1"]["hi"]) == ("a", "b")
    assert (out["fid:s1"]["n"], out["fid:s1"]["nd"]) == (3, 2)
    assert out["fid:s2"]["vals"] == "z" and out["fid:s2"]["n"] == 1


def test_extend_bindings_date_parts(ray_session):
    """BIND(YEAR/MONTH/DAY(?d)) (wgs.rq:44-46): int64 parts, null on
    partial dates' absent parts and on non-dates."""
    from octoray.patterns import extend_bindings

    g = [
        ("fid:s1", "f:date", "2019-08-15", "xsd:date"),
        ("fid:s2", "f:date", "2018-12", "xsd:gYearMonth"),
        ("fid:s3", "f:date", "junk", ""),
    ]
    b = match_patterns(_ds(g), [("?s", "f:date", "?d")])
    out = {r["s"]: r for r in extend_bindings(
        b, [("year", "YEAR(?d)"), ("month", "MONTH(?d)"),
            ("day", "DAY(?d)"), ("d2", "?d")]).take_all()}
    assert (out["fid:s1"]["year"], out["fid:s1"]["month"], out["fid:s1"]["day"]) == (2019, 8, 15)
    assert (out["fid:s2"]["year"], out["fid:s2"]["month"], out["fid:s2"]["day"]) == (2018, 12, None)
    assert out["fid:s3"]["year"] is None
    assert out["fid:s1"]["d2"] == "2019-08-15"


def test_values_bindings(ray_session):
    """VALUES: inline table restricts on the shared variable and
    appends new columns; disjoint VALUES is refused."""
    import pytest

    from octoray.patterns import values_bindings

    g = [
        ("fid:s1", "f:host", "swine", ""),
        ("fid:s2", "f:host", "human", ""),
        ("fid:s3", "f:host", "avian", ""),
    ]
    b = match_patterns(_ds(g), [("?s", "f:host", "?h")])
    out = {r["s"]: r["label"] for r in values_bindings(
        b, ["?h", "?label"],
        [("swine", "pig"), ("human", "person")]).take_all()}
    assert out == {"fid:s1": "pig", "fid:s2": "person"}
    with pytest.raises(Exception):
        values_bindings(
            match_patterns(_ds(g), [("?s", "f:host", "?h")]),
            ["?x", "?y"], [("a", "b")]).take_all()


def test_aggregate_bindings_empty_and_unmatched(ray_session):
    """No matching bindings -> empty result, not a crash."""
    from octoray.patterns import aggregate_bindings

    g = [("fid:s1", "f:v", "a", "")]
    b = match_patterns(_ds(g), [("?s", "f:nope", "?v")])
    out = aggregate_bindings(b, ["s"], [("v", "count", "n")]).take_all()
    assert out == []


def test_minus_bindings(ray_session):
    """SPARQL MINUS (fetch-unclassified-swine.rq:9): the inner
    2-pattern conjunction removes only subjects matching BOTH."""
    from octoray.patterns import minus_bindings

    g = [
        ("fid:s1", "f:name", "a", ""),
        ("fid:s1", "f:clade", "c1", ""),
        ("fid:s1", "f:subtype", "H1N1", ""),   # both -> removed
        ("fid:s2", "f:name", "b", ""),
        ("fid:s2", "f:clade", "c2", ""),       # clade only -> kept
        ("fid:s3", "f:name", "c", ""),         # neither -> kept
    ]
    t = _ds(g)
    b = match_patterns(t, [("?s", "f:name", "?n")])
    out = minus_bindings(
        b, t, [("?s", "f:clade", "?c"), ("?s", "f:subtype", "?st")])
    assert {r["s"] for r in out.take_all()} == {"fid:s2", "fid:s3"}


def test_minus_distributed_path_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the distributed anti-join; results
    must be identical to the broadcast path."""
    from octoray.patterns import minus_bindings

    g = [("fid:s%d" % i, "f:name", "n%d" % i, "") for i in range(20)]
    g += [("fid:s%d" % i, "f:flag", "x", "") for i in range(0, 20, 3)]
    t = _ds(g)
    b = match_patterns(t, [("?s", "f:name", "?n")])
    want = {r["s"] for r in minus_bindings(
        b, t, [("?s", "f:flag", "?f")]).take_all()}
    got = {r["s"] for r in minus_bindings(
        b, t, [("?s", "f:flag", "?f")], broadcast_limit=0).take_all()}
    assert got == want == {"fid:s%d" % i for i in range(20) if i % 3}


def test_not_exists_with_inner_filter(ray_session):
    """subtypes.rq:18 shape: FILTER NOT EXISTS { ?s f:subtype ?st .
    FILTER REGEX(?st, 'H.N.') } — only subjects whose subtype matches
    the regex are removed."""
    from octoray.patterns import minus_bindings

    g = [
        ("fid:s1", "f:name", "a", ""),
        ("fid:s1", "f:subtype", "H1N1", ""),   # matches -> removed
        ("fid:s2", "f:name", "b", ""),
        ("fid:s2", "f:subtype", "mixed", ""),  # no match -> kept
        ("fid:s3", "f:name", "c", ""),         # no subtype -> kept
    ]
    t = _ds(g)
    b = match_patterns(t, [("?s", "f:name", "?n")])
    out = minus_bindings(b, t, [("?s", "f:subtype", "?st")],
                         filters=[("?st", "~", "H.N.")], mode="not_exists")
    assert {r["s"] for r in out.take_all()} == {"fid:s2", "fid:s3"}


def test_minus_disjoint_domains(ray_session):
    """No shared variables: MINUS keeps everything (SPARQL 8.3.3);
    NOT EXISTS empties the outer iff the inner has any match."""
    from octoray.patterns import minus_bindings

    g = [
        ("fid:s1", "f:name", "a", ""),
        ("fid:s2", "f:name", "b", ""),
        ("fid:x", "f:other", "z", ""),
    ]
    t = _ds(g)
    b = match_patterns(t, [("?s", "f:name", "?n")])
    kept = minus_bindings(b, t, [("?q", "f:other", "?v")])
    assert kept.count() == 2
    emptied = minus_bindings(b, t, [("?q", "f:other", "?v")],
                             mode="not_exists")
    assert emptied.count() == 0
    unmatched = minus_bindings(b, t, [("?q", "f:nope", "?v")],
                               mode="not_exists")
    assert unmatched.count() == 2


def test_minus_multivar_correlation(ray_session):
    """Two shared variables ride the composite key: only the exact
    (s, v) combination present in the inner is removed."""
    from octoray.patterns import minus_bindings

    g = [
        ("fid:s1", "f:v", "x", ""),
        ("fid:s1", "f:v", "y", ""),
        ("fid:s2", "f:v", "x", ""),
        ("fid:s1", "f:w", "x", ""),   # inner: (s1, x) only
    ]
    t = _ds(g)
    b = match_patterns(t, [("?s", "f:v", "?o")])
    out = minus_bindings(b, t, [("?s", "f:w", "?o")])
    assert {(r["s"], r["o"]) for r in out.take_all()} == {
        ("fid:s1", "y"), ("fid:s2", "x")}


def test_filter_or_bound_in(ray_session):
    """Disjunction-of-conjunctions + BOUND + IN (monthly-context.rq:30,
    masterlist.rq:28 shapes)."""
    g = [
        ("fid:s1", "f:name", "a", ""),
        ("fid:s1", "f:date", "2017-05-01", "xsd:date"),
        ("fid:s1", "f:host", "swine", ""),
        # s1: date-range branch -> kept
        ("fid:s2", "f:name", "b", ""),
        ("fid:s2", "f:date", "2022-03", "xsd:gYearMonth"),
        ("fid:s2", "f:host", "human", ""),
        ("fid:s2", "f:subtype", "H3N2", ""),
        # s2: YEAR>2020 && BOUND && regex -> kept
        ("fid:s3", "f:name", "c", ""),
        ("fid:s3", "f:date", "2022-03", "xsd:gYearMonth"),
        ("fid:s3", "f:host", "swine", ""),
        # s3: recent but subtype unbound -> dropped
        ("fid:s4", "f:name", "e", ""),
        ("fid:s4", "f:date", "2017-06-01", "xsd:date"),
        ("fid:s4", "f:host", "turkey", ""),
        # s4: fails the IN conjunct -> dropped
    ]
    from octoray.patterns import match_patterns

    b = match_patterns(
        _ds(g),
        [("?s", "f:name", "?n"), ("?s", "f:date", "?d"),
         ("?s", "f:host", "?h")],
        optionals=[("?s", "f:subtype", "?st")],
        filters=[
            ("?h", "in", ["swine", "human"]),
            ("or", [
                [("?d", ">", "2016"), ("?d", "<", "2019")],
                [("YEAR(?d)", ">", 2020), ("?st", "bound", True),
                 ("?st", "~", "^H[13]")],
            ]),
        ],
    )
    assert {r["s"] for r in b.take_all()} == {"fid:s1", "fid:s2"}


def test_filter_not_bound(ray_session):
    """FILTER(!BOUND(?x)) keeps only rows where the OPTIONAL missed."""
    g = [
        ("fid:s1", "f:name", "a", ""),
        ("fid:s1", "f:state", "IA", ""),
        ("fid:s2", "f:name", "b", ""),
    ]
    from octoray.patterns import match_patterns

    b = match_patterns(
        _ds(g), [("?s", "f:name", "?n")],
        optionals=[("?s", "f:state", "?stt")],
        filters=[("?stt", "bound", False)],
    )
    assert {r["s"] for r in b.take_all()} == {"fid:s2"}


def test_minus_multivar_distributed_matches_broadcast(ray_session):
    """Composite-key MINUS through the forced distributed anti-join
    equals the broadcast path."""
    from octoray.patterns import minus_bindings

    g = [("fid:s%d" % i, "f:v", "o%d" % (i % 4), "") for i in range(24)]
    g += [("fid:s%d" % i, "f:w", "o%d" % (i % 4), "") for i in range(0, 24, 2)]
    t = _ds(g)
    b = match_patterns(t, [("?s", "f:v", "?o")])
    want = {(r["s"], r["o"]) for r in minus_bindings(
        b, t, [("?s", "f:w", "?o")]).take_all()}
    got = {(r["s"], r["o"]) for r in minus_bindings(
        b, t, [("?s", "f:w", "?o")], broadcast_limit=0).take_all()}
    assert got == want
    assert want == {("fid:s%d" % i, "o%d" % (i % 4)) for i in range(1, 24, 2)}


def test_property_path_star(ray_session):
    """p* = p+ plus the identity over the predicate's node set (the
    documented restriction of SPARQL's zero-length path)."""
    from octoray.patterns import match_patterns, select_bindings

    b = match_patterns(_ds(GRAPH), [("?x", "f:locatedIn*", "?a")])
    rows = {(r["x"], r["a"]) for r in select_bindings(b, ["x", "a"]).take_all()}
    plus = {("geo:IA", "geo:Region3"), ("geo:IA", "geo:USA"),
            ("geo:IA", "geo:NorthAmerica"),
            ("geo:Region3", "geo:USA"), ("geo:Region3", "geo:NorthAmerica"),
            ("geo:USA", "geo:NorthAmerica")}
    nodes = {"geo:IA", "geo:Region3", "geo:USA", "geo:NorthAmerica"}
    assert rows == plus | {(n, n) for n in nodes}


def test_star_path_with_constant_endpoint(ray_session):
    from octoray.patterns import match_patterns, select_bindings

    b = match_patterns(_ds(GRAPH), [("?x", "f:locatedIn*", "geo:USA")])
    rows = {r["x"] for r in select_bindings(b, ["x"]).take_all()}
    assert rows == {"geo:IA", "geo:Region3", "geo:USA"}


def test_property_path_zero_or_one(ray_session):
    """p? = single hops plus the node-set identity (no closure)."""
    from octoray.patterns import match_patterns, select_bindings

    b = match_patterns(_ds(GRAPH), [("?x", "f:locatedIn?", "?a")])
    rows = {(r["x"], r["a"]) for r in select_bindings(b, ["x", "a"]).take_all()}
    hops = {("geo:IA", "geo:Region3"), ("geo:Region3", "geo:USA"),
            ("geo:USA", "geo:NorthAmerica")}
    nodes = {"geo:IA", "geo:Region3", "geo:USA", "geo:NorthAmerica"}
    assert rows == hops | {(n, n) for n in nodes}
