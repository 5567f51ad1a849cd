"""SPARQL text front end (sparql.py): parse the reference's own .rq
files; execute the supported algebra against small in-memory graphs
and check against hand-computed solutions and the structured pattern
layer."""

import glob
import os

import pyarrow as pa
import pytest

from octoray.model import triples_to_table
from octoray.sparql import (SparqlError, execute, parse_sparql)

REF_RQ = sorted(glob.glob("/root/reference/octofludb/data/*.rq"))

# the reference's own macro conventions (ui.py:1315, recipe.py callers)
_MACROS = {
    "__YEAR__": 2021,
    "__MONTH__": 5,
    "__MIN_DATE__": "2020-01-01",
    "__MAX_DATE__": "2021-12-31",
}


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(triples_to_table(rows))


GRAPH = [
    # two swine strains with dates/subtypes/segments, one human
    ("fid:s1", "f:strain_name", "A/swine/Iowa/001/2021", ""),
    ("fid:s1", "f:host", "swine", ""),
    ("fid:s1", "f:date", "2021-05-04", "xsd:date"),
    ("fid:s1", "f:subtype", "H1N1", ""),
    ("fid:s1", "f:state", "IA", ""),
    ("fid:s1", "f:has_segment", "fid:g1", "uri"),
    ("fid:g1", "f:segment_name", "HA", ""),
    ("fid:g1", "f:genbank_id", "MG00001", ""),
    ("fid:s2", "f:strain_name", "A/swine/Minnesota/002/2021", ""),
    ("fid:s2", "f:host", "swine", ""),
    ("fid:s2", "f:date", "2021-05", "xsd:gYearMonth"),
    ("fid:s2", "f:has_segment", "fid:g2", "uri"),
    ("fid:g2", "f:segment_name", "NA", ""),
    ("fid:g2", "f:genbank_id", "MG00002", ""),
    ("fid:s3", "f:strain_name", "A/Texas/003/2020", ""),
    ("fid:s3", "f:host", "human", ""),
    ("fid:s3", "f:date", "2020-03-01", "xsd:date"),
    ("fid:s3", "f:subtype", "H3N2", ""),
    ("fid:s3", "f:has_segment", "fid:g3", "uri"),
    ("fid:g3", "f:segment_name", "HA", ""),
    # query tags addressing s1 by strain name, s2 by genbank id
    ("query:default", "f:query_tag", "A/swine/Iowa/001/2021", ""),
    ("query:default", "f:query_tag", "MG00002", ""),
]


def _rows(ds):
    return ds.to_pandas()


# ---------------------------------------------------------------------------
# parsing the reference's shipped files


@pytest.mark.parametrize("path", [p for p in REF_RQ
                                  if not p.endswith("get-tagged.rq")])
def test_parse_reference_file(path):
    with open(path) as fh:
        text = fh.read()
    q = parse_sparql(text, params=_MACROS)
    assert q.form in ("select", "construct", "delete")
    if q.form == "select":
        assert q.proj, path
    assert q.where.patterns or q.where.unions, path


def test_get_tagged_rq_is_malformed_upstream():
    # data/get-tagged.rq uses the non-SPARQL '?haid as HA' projection
    # (and references variables nothing binds) — refuse clearly
    with open("/root/reference/octofludb/data/get-tagged.rq") as fh:
        text = fh.read()
    with pytest.raises(SparqlError, match="get-tagged.rq is malformed"):
        parse_sparql(text)


# ---------------------------------------------------------------------------
# execution semantics


def test_select_distinct_filters(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain ?segment WHERE {
            ?sid f:host "swine" .
            ?sid f:strain_name ?strain .
            ?sid f:has_segment ?gid .
            ?gid f:segment_name ?segment .
            FILTER (?segment != "NA") .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(map(tuple, out.values)) == {
        ("A/swine/Iowa/001/2021", "HA")}
    assert list(out.columns) == ["strain", "segment"]


def test_prefix_renormalization(ray_session):
    # a file-local prefix name different from the engine's canonical
    # one must still hit the stored representation
    q = parse_sparql("""
        PREFIX t: <https://flu-crew.org/term/>
        SELECT DISTINCT ?h WHERE { ?s t:host ?h . }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["h"]) == {"swine", "human"}


def test_optional_and_bound_filter(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain ?st WHERE {
            ?sid f:strain_name ?strain .
            OPTIONAL { ?sid f:state ?st . }
            FILTER BOUND(?st) .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(map(tuple, out.values)) == {("A/swine/Iowa/001/2021", "IA")}


def test_bind_year_month_and_macro(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain ?year ?month WHERE {
            ?sid f:strain_name ?strain .
            ?sid f:date ?date .
            BIND(YEAR(?date) as ?year) .
            BIND(MONTH(?date) as ?month) .
            FILTER (?year = __YEAR__ && ?month = __MONTH__) .
        }
    """, params={"__YEAR__": 2021, "__MONTH__": 5})
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["strain"]) == {
        "A/swine/Iowa/001/2021", "A/swine/Minnesota/002/2021"}


def test_union_branches_bag_semantics(ray_session):
    # the get-tagged-*.rq shape: ids resolved across UNION branches
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain WHERE {
            ?tid f:query_tag ?tag .
            {
                ?sid f:strain_name ?tag .
            } UNION {
                ?sid f:has_segment ?gid .
                ?gid f:genbank_id ?tag .
            }
            ?sid f:strain_name ?strain .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["strain"]) == {
        "A/swine/Iowa/001/2021", "A/swine/Minnesota/002/2021"}


def test_minus_block(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain WHERE {
            ?sid f:strain_name ?strain .
            MINUS { ?sid f:subtype ?t . }
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["strain"]) == {"A/swine/Minnesota/002/2021"}


def test_filter_not_exists_with_inner_filter(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain WHERE {
            ?sid f:strain_name ?strain .
            FILTER NOT EXISTS {
                ?sid f:subtype ?t .
                FILTER REGEX(?t, "^H1") .
            }
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["strain"]) == {
        "A/swine/Minnesota/002/2021", "A/Texas/003/2020"}


def test_group_concat_min_aggregates(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT
            ?host
            (GROUP_CONCAT(DISTINCT ?strain; separator="+") as ?strains)
            (MIN(?date) as ?earliest)
            (COUNT(DISTINCT ?sid) as ?n)
        WHERE {
            ?sid f:strain_name ?strain .
            ?sid f:host ?host .
            ?sid f:date ?date .
        }
        GROUP BY ?host
    """)
    out = _rows(execute(q, _ds(GRAPH))).sort_values("host")
    assert list(out.columns) == ["host", "strains", "earliest", "n"]
    swine = out[out.host == "swine"].iloc[0]
    assert swine["strains"] == \
        "A/swine/Iowa/001/2021+A/swine/Minnesota/002/2021"
    assert swine["earliest"] == "2021-05"
    assert swine["n"] == 2


def test_disjunction_to_or_groups(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain WHERE {
            ?sid f:strain_name ?strain .
            ?sid f:date ?date .
            OPTIONAL { ?sid f:subtype ?t . }
            FILTER (
                (?date > "2021-01-01" && ?date < "2021-12-31") ||
                (YEAR(?date) < 2021 && BOUND(?t) && REGEX(?t, "N2$"))
            ) .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["strain"]) == {
        "A/swine/Iowa/001/2021",       # in the 2021 date range
        "A/swine/Minnesota/002/2021",  # partial date, still in range lexically
        "A/Texas/003/2020",            # pre-2021 with an N2 subtype
    }


def test_equality_disjunction_compiles_to_in(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?g WHERE {
            ?gid f:segment_name ?g .
            FILTER (?g = "HA" || ?g = "NA") .
        }
    """)
    assert any(f[1] == "in" for f in q.where.filters)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["g"]) == {"HA", "NA"}


def test_var_to_var_filter(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?tag WHERE {
            ?tid f:query_tag ?tag .
            ?sid f:strain_name ?n .
            FILTER (?tag = ?n) .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["tag"]) == {"A/swine/Iowa/001/2021"}


def test_values_inline_table(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?h ?label WHERE {
            ?sid f:host ?h .
            VALUES (?h ?label) { ("swine" "pig") ("human" "person") }
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(map(tuple, out.values)) == {
        ("swine", "pig"), ("human", "person")}


def test_construct_form(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        CONSTRUCT { ?sid f:dated_subtype ?t . }
        WHERE { ?sid f:subtype ?t . ?sid f:date ?d . }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["object"]) == {"H1N1", "H3N2"}
    assert set(out["predicate"]) == {"f:dated_subtype"}


def test_matches_structured_pattern_layer(ray_session):
    """The text front end and the structured API must agree."""
    from octoray.patterns import match_patterns, select_bindings

    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?s ?t ?st WHERE {
            ?s f:subtype ?t .
            OPTIONAL { ?s f:state ?st . }
        }
    """)
    got = _rows(execute(q, _ds(GRAPH)))
    b = match_patterns(_ds(GRAPH), [("?s", "f:subtype", "?t")],
                       optionals=[("?s", "f:state", "?st")])
    want = _rows(select_bindings(b, ["s", "t", "st"]))
    key = lambda df: sorted(map(tuple, df.fillna("␀").values))
    assert key(got) == key(want)


def test_filter_exists_positive(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain WHERE {
            ?sid f:strain_name ?strain .
            FILTER EXISTS { ?sid f:subtype ?t . }
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["strain"]) == {
        "A/swine/Iowa/001/2021", "A/Texas/003/2020"}


def test_order_by_and_limit(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?strain ?date WHERE {
            ?sid f:strain_name ?strain .
            ?sid f:date ?date .
        }
        ORDER BY DESC(?date) LIMIT 2
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert list(out["date"]) == ["2021-05-04", "2021-05"]


def test_ask_form(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        ASK { ?sid f:subtype "H1N1" . }
    """)
    assert execute(q, _ds(GRAPH)).take_all() == [{"ask": True}]
    q2 = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        ASK WHERE { ?sid f:subtype "H9N9" . }
    """)
    assert execute(q2, _ds(GRAPH)).take_all() == [{"ask": False}]


def test_describe_variable_and_constant(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        DESCRIBE ?sid WHERE { ?sid f:subtype "H1N1" . }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["subject"]) == {"fid:s1"}
    assert len(out) == 6  # all of s1's triples
    q2 = parse_sparql("""
        PREFIX fid: <https://flu-crew.org/id/>
        DESCRIBE fid:g1
    """)
    out2 = _rows(execute(q2, _ds(GRAPH)))
    assert set(out2["subject"]) == {"fid:g1"}
    assert set(out2["predicate"]) == {"f:segment_name", "f:genbank_id"}


def test_delete_via_file_predicate_shape(ray_session, tmp_path):
    import os

    import ray.data as rd

    from octoray.sparql import delete_via_file

    store = str(tmp_path / "store")
    _ds(GRAPH).write_parquet(os.path.join(store, "shard=00000"))
    with open("/root/reference/octofludb/data/delete-subtypes.rq") as fh:
        text = fh.read()
    delete_via_file(store, text)
    left = rd.read_parquet(store).to_pandas()
    assert "f:subtype" not in set(left["predicate"])
    assert "f:strain_name" in set(left["predicate"])


def test_star_and_optional_paths_parse(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?x ?a WHERE { ?x f:locatedIn* ?a . }
    """)
    assert q.where.patterns == [("?x", "f:locatedIn*", "?a")]
    q2 = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?x ?a WHERE { ?x f:locatedIn? ?a . }
    """)
    assert q2.where.patterns == [("?x", "f:locatedIn?", "?a")]


def test_group_concat_bag_keeps_duplicates(ray_session):
    """Non-DISTINCT GROUP_CONCAT has SPARQL bag semantics: duplicate
    solutions stay.  The engine renders both forms value-sorted (the
    deterministic convention), so the bag form differs from DISTINCT
    exactly by the kept duplicates."""
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT ?host (GROUP_CONCAT(?sub; separator="+") AS ?subs)
        WHERE { ?sid f:host ?host . ?sid f:subtype ?sub . }
        GROUP BY ?host
    """)
    out = _rows(execute(q, _ds(GRAPH + [
        ("fid:s4", "f:host", "swine", ""),
        ("fid:s4", "f:subtype", "H1N1", ""),
    ]))).set_index("host")
    # swine solutions: s1 H1N1, s4 H1N1 (s2 has no subtype) -> bag
    assert out.loc["swine", "subs"] == "H1N1+H1N1"
    assert out.loc["human", "subs"] == "H3N2"

    qd = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT ?host (GROUP_CONCAT(DISTINCT ?sub; separator="+") AS ?subs)
        WHERE { ?sid f:host ?host . ?sid f:subtype ?sub . }
        GROUP BY ?host
    """)
    outd = _rows(execute(qd, _ds(GRAPH + [
        ("fid:s4", "f:host", "swine", ""),
        ("fid:s4", "f:subtype", "H1N1", ""),
    ]))).set_index("host")
    assert outd.loc["swine", "subs"] == "H1N1"


def test_count_star_and_having(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?host (COUNT(*) as ?n) WHERE {
            ?sid f:strain_name ?s .
            ?sid f:host ?host .
        }
        GROUP BY ?host
        HAVING (?n >= 2)
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(map(tuple, out.values)) == {("swine", 2)}


def test_sum_avg_grouped(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT ?host (SUM(?y) as ?sy) (AVG(?y) as ?ay) (COUNT(?y) as ?n)
        WHERE {
            ?sid f:host ?host .
            ?sid f:date ?d .
            BIND(YEAR(?d) AS ?y)
        }
        GROUP BY ?host
    """)
    out = _rows(execute(q, _ds(GRAPH))).set_index("host")
    # swine: years 2021, 2021 -> sum 4042, avg 2021; human: 2020
    assert out.loc["swine", "sy"] == 4042.0
    assert out.loc["swine", "ay"] == 2021.0
    assert out.loc["swine", "n"] == 2
    assert out.loc["human", "sy"] == 2020.0
    assert out.loc["human", "ay"] == 2020.0


def test_implicit_group_aggregates(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT (COUNT(*) as ?n) (COUNT(DISTINCT ?host) as ?nh)
               (MIN(?d) as ?lo) (MAX(?d) as ?hi)
               (GROUP_CONCAT(DISTINCT ?host; separator="+") as ?hosts)
        WHERE {
            ?sid f:host ?host .
            ?sid f:date ?d .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n"] == 3 and r["nh"] == 2
    assert r["lo"] == "2020-03-01" and r["hi"] == "2021-05-04"
    assert r["hosts"] == "human+swine"


def test_implicit_group_empty_input(ray_session):
    # SPARQL: the implicit group over an empty solution set still
    # yields ONE row — COUNT 0, other aggregates unbound
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT (COUNT(*) as ?n) (SUM(?y) as ?s) (MIN(?host) as ?m)
        WHERE {
            ?sid f:host ?host .
            ?sid f:no_such_predicate ?y .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n"] == 0
    assert r["s"] is None or r["s"] != r["s"]  # null / NaN
    assert r["m"] is None


def test_sum_skips_non_numeric(ray_session):
    # lexical (string) bindings coerce; non-numeric values are skipped
    # (the try_cast mirror), per the documented semantics
    from octoray.patterns import aggregate_all, match_patterns

    b = match_patterns(_ds(GRAPH), [("?s", "f:subtype", "?t")])
    out = _rows(aggregate_all(b, [("t", "sum", "s"), ("t", "count", "n")]))
    assert out.iloc[0]["n"] == 2           # H1N1, H3N2 bound
    assert out.iloc[0]["s"] is None or out.iloc[0]["s"] != out.iloc[0]["s"]


def test_bare_var_with_aggregate_no_group_rejected():
    with pytest.raises(SparqlError):
        parse_sparql("""
            PREFIX f: <https://flu-crew.org/term/>
            SELECT (?host AS ?h) (COUNT(*) as ?n) WHERE {
                ?sid f:host ?host .
            }
        """)


def test_negated_property_set(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?v WHERE {
            ?sid f:strain_name ?n .
            ?sid !(f:strain_name|f:has_segment|f:date) ?v .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert set(out["v"]) == {"swine", "human", "H1N1", "H3N2", "IA"}


def test_negated_single_predicate(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?p_obj WHERE {
            ?g f:segment_name "HA" .
            ?g !f:segment_name ?p_obj .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    # g1 carries genbank_id MG00001; g3 has only segment_name
    assert set(out["p_obj"]) == {"MG00001"}


def test_subquery_aggregate_join(ray_session):
    # per-strain segment count from a nested SELECT joins the outer BGP
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT ?name ?nseg WHERE {
            ?sid f:strain_name ?name .
            ?sid f:host "swine" .
            { SELECT ?sid (COUNT(?g) AS ?nseg) WHERE {
                ?sid f:has_segment ?g .
              } GROUP BY ?sid }
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    got = dict(zip(out["name"], out["nseg"]))
    assert got == {"A/swine/Iowa/001/2021": "1",
                   "A/swine/Minnesota/002/2021": "1"}


def test_subquery_only_group(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT ?host ?n WHERE {
            { SELECT ?host (COUNT(*) AS ?n) WHERE {
                ?sid f:host ?host .
              } GROUP BY ?host }
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert dict(zip(out["host"], out["n"])) == {"swine": "2", "human": "1"}


def test_subquery_limit_topk(ray_session):
    # ORDER BY + LIMIT inside the subquery: top-1 host by count
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT ?host ?n WHERE {
            { SELECT ?host (COUNT(*) AS ?n) WHERE {
                ?sid f:host ?host .
              } GROUP BY ?host ORDER BY DESC(?n) LIMIT 1 }
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert list(zip(out["host"], out["n"])) == [("swine", "2")]


def test_subquery_disconnected_rejected(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT ?name ?n WHERE {
            ?sid f:strain_name ?name .
            { SELECT ?g (COUNT(*) AS ?n) WHERE {
                ?x f:genbank_id ?g .
              } GROUP BY ?g }
        }
    """)
    with pytest.raises((SparqlError, ValueError)):
        _rows(execute(q, _ds(GRAPH)))


def test_insert_data_ground(ray_session):
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        INSERT DATA {
            <https://flu-crew.org/id/n1> f:host "swine" .
            <https://flu-crew.org/id/n1> f:date "2022-01-01"^^xsd:date .
            <https://flu-crew.org/id/n1> f:has_segment <https://flu-crew.org/id/g9> .
        }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    got = sorted(map(tuple, out.values))
    assert got == [
        ("fid:n1", "f:date", "2022-01-01", "xsd:date"),
        ("fid:n1", "f:has_segment", "fid:g9", "uri"),
        ("fid:n1", "f:host", "swine", ""),
    ]


def test_insert_where_pattern(ray_session):
    # derive new triples from matched bindings (rule-style INSERT)
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        INSERT { ?sid f:reviewed "yes" . }
        WHERE { ?sid f:host "swine" . }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    got = sorted(map(tuple, out.values))
    assert got == [
        ("fid:s1", "f:reviewed", "yes", ""),
        ("fid:s2", "f:reviewed", "yes", ""),
    ]


def test_insert_data_rejects_variables():
    with pytest.raises(SparqlError):
        parse_sparql("INSERT DATA { ?s <http://p> \"v\" . }")


def test_construct_constant_iri_object(ray_session):
    # the template's constant IRI object must instantiate as a URI,
    # not a plain literal
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        PREFIX fid: <https://flu-crew.org/id/>
        CONSTRUCT { ?sid f:flagged_by fid:reviewer1 . }
        WHERE { ?sid f:host "human" . }
    """)
    out = _rows(execute(q, _ds(GRAPH)))
    assert sorted(map(tuple, out.values)) == [
        ("fid:s3", "f:flagged_by", "fid:reviewer1", "uri")]


def test_insert_via_file_lands_idempotent(ray_session, tmp_path):
    import os

    import ray.data as rd

    from octoray.sparql import insert_via_file

    store = str(tmp_path / "store")
    part = os.path.join(store, "shard=00000")
    os.makedirs(part)
    import pyarrow.parquet as pq

    pq.write_table(triples_to_table(GRAPH), os.path.join(part, "p.parquet"))

    text = """
        PREFIX f: <https://flu-crew.org/term/>
        INSERT { ?sid f:reviewed "yes" . }
        WHERE { ?sid f:host "swine" . }
    """
    r1 = insert_via_file(store, text)
    assert r1["triples"] == 2
    r2 = insert_via_file(store, text)
    assert r2["partition"] == r1["partition"]  # content-addressed
    got = rd.read_parquet(r1["partition"]).count()
    assert got == 2


MOTIF_GRAPH = [
    # g1: classified segment — seqid + motif, and the motif value ALSO
    # appears under its concrete predicate (the reference's
    # subPropertyOf materialization: sa_motif <= motif)
    ("fid:g1", "f:seqid", "SQ1", ""),
    ("fid:g1", "f:motif", "PNHD", ""),
    ("fid:g1", "f:sa_motif", "PNHD", ""),
    ("fid:g1", "f:segment_name", "HA", ""),
    # g2: motif but NO seqid — the join must protect it
    ("fid:g2", "f:motif", "QKRG", ""),
    ("fid:g2", "f:sa_motif", "QKRG", ""),
    # g3: seqid but no motif
    ("fid:g3", "f:seqid", "SQ3", ""),
    ("fid:g3", "f:segment_name", "NA", ""),
]


def test_delete_via_file_pattern_bound_motifs(ray_session, tmp_path):
    """delete-motifs.rq: VARIABLE template predicate bound through a
    join — must take the general pattern-bound path and retract
    exactly the instantiated triples (reference data/delete-motifs.rq)."""
    import ray.data as rd

    from octoray.sparql import delete_via_file

    store = str(tmp_path / "store")
    _ds(MOTIF_GRAPH).write_parquet(os.path.join(store, "shard=00000"))
    path = os.path.join(os.path.dirname(__file__), "..", "octoray",
                        "data", "delete-motifs.rq")
    with open(path) as fh:
        res = delete_via_file(store, fh.read())
    assert res["triples_deleted"] == 2  # g1's f:motif + f:sa_motif rows
    left = {(r["subject"], r["predicate"], r["object"])
            for r in rd.read_parquet(store).take_all()}
    # g1 keeps seqid + segment_name; loses both motif-valued triples
    assert ("fid:g1", "f:motif", "PNHD") not in left
    assert ("fid:g1", "f:sa_motif", "PNHD") not in left
    assert ("fid:g1", "f:seqid", "SQ1") in left
    assert ("fid:g1", "f:segment_name", "HA") in left
    # g2 (no seqid) untouched
    assert ("fid:g2", "f:motif", "QKRG") in left
    assert ("fid:g2", "f:sa_motif", "QKRG") in left


def test_delete_via_file_constrained_where_not_whole_predicate(
        ray_session, tmp_path):
    """A WHERE that constrains beyond the template must NOT fall into
    the whole-predicate fast path: only the constrained subjects'
    triples go."""
    import ray.data as rd

    from octoray.sparql import delete_via_file

    store = str(tmp_path / "store")
    _ds(GRAPH).write_parquet(os.path.join(store, "shard=00000"))
    res = delete_via_file(store, """
        PREFIX f: <https://flu-crew.org/term/>
        DELETE { ?s f:subtype ?o . }
        WHERE { ?s f:subtype ?o . ?s f:host "swine" . }
    """)
    assert res["triples_deleted"] == 1  # only s1 is swine AND subtyped
    left = {(r["subject"], r["predicate"])
            for r in rd.read_parquet(store).take_all()}
    assert ("fid:s1", "f:subtype") not in left
    assert ("fid:s3", "f:subtype") in left  # human strain keeps its


def test_delete_via_file_values_constrained(ray_session, tmp_path):
    """A VALUES clause in the WHERE must keep the DELETE off the
    whole-predicate fast path (ADVICE r3 high: the fast path used to
    ignore VALUES and retract every f:host triple)."""
    import ray.data as rd

    from octoray.sparql import delete_via_file

    store = str(tmp_path / "store")
    _ds(GRAPH).write_parquet(os.path.join(store, "shard=00000"))
    res = delete_via_file(store, """
        PREFIX f: <https://flu-crew.org/term/>
        PREFIX fid: <https://flu-crew.org/id/>
        DELETE { ?s f:host ?o . }
        WHERE { ?s f:host ?o . VALUES ?s { fid:s1 } }
    """)
    assert res["triples_deleted"] == 1
    left = {(r["subject"], r["predicate"])
            for r in rd.read_parquet(store).take_all()}
    assert ("fid:s1", "f:host") not in left
    assert ("fid:s2", "f:host") in left
    assert ("fid:s3", "f:host") in left


def test_delete_via_file_minus_constrained(ray_session, tmp_path):
    """MINUS in the WHERE must also take the general plan."""
    import ray.data as rd

    from octoray.sparql import delete_via_file

    store = str(tmp_path / "store")
    _ds(GRAPH).write_parquet(os.path.join(store, "shard=00000"))
    res = delete_via_file(store, """
        PREFIX f: <https://flu-crew.org/term/>
        DELETE { ?s f:subtype ?o . }
        WHERE { ?s f:subtype ?o . MINUS { ?s f:host "human" . } }
    """)
    assert res["triples_deleted"] == 1  # s1 only; s3 is human
    left = {(r["subject"], r["predicate"])
            for r in rd.read_parquet(store).take_all()}
    assert ("fid:s1", "f:subtype") not in left
    assert ("fid:s3", "f:subtype") in left


def test_cli_delete_shape(ray_session, tmp_path):
    """`python -m octoray delete --shape` runs the bundled named
    templates (reference `octofludb delete X`, ui.py:1364-1462)."""
    import ray.data as rd

    from octoray.__main__ import main

    store = str(tmp_path / "store")
    _ds(MOTIF_GRAPH + [("fid:s9", "f:subtype", "H1N1", "")]).write_parquet(
        os.path.join(store, "shard=00000"))
    assert main(["delete", "--graph", store, "--shape", "motifs"]) == 0
    assert main(["delete", "--graph", store, "--shape", "subtypes"]) == 0
    left = {(r["subject"], r["predicate"])
            for r in rd.read_parquet(store).take_all()}
    assert ("fid:g1", "f:motif") not in left
    assert ("fid:s9", "f:subtype") not in left
    assert ("fid:g2", "f:motif") in left
