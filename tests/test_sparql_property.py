"""Property test: the SPARQL text front end must agree with the
structured pattern layer on randomly generated conjunctive queries —
render a random BGP (+ optional OPTIONAL and FILTER) to SPARQL text,
parse + execute it, and compare with match_patterns on the same
structures."""

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import HealthCheck, given, settings

from octoray.model import triples_to_table

PREDS = ["f:a", "f:b", "f:c"]
SUBJ = [f"fid:s{i}" for i in range(6)]
VALS = ["v1", "v2", "v3"]


@st.composite
def graph_and_query(draw):
    n = draw(st.integers(8, 24))
    triples = [
        (draw(st.sampled_from(SUBJ)), draw(st.sampled_from(PREDS)),
         draw(st.sampled_from(VALS)), "")
        for _ in range(n)
    ]
    # connected 2-pattern BGP on a shared subject variable
    p1, p2 = draw(st.sampled_from(PREDS)), draw(st.sampled_from(PREDS))
    opt_pred = draw(st.sampled_from(PREDS + [None]))
    filt_val = draw(st.sampled_from(VALS + [None]))
    return triples, p1, p2, opt_pred, filt_val


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(graph_and_query())
def test_text_equals_structured(ray_session, case):
    import ray.data as rd

    from octoray.patterns import (apply_filters, match_patterns,
                                  select_bindings)
    from octoray.sparql import execute, parse_sparql

    triples, p1, p2, opt_pred, filt_val = case

    def ds():
        return rd.from_arrow(triples_to_table(triples))

    text = "PREFIX f: <https://flu-crew.org/term/>\nSELECT DISTINCT ?s ?x ?y"
    text += " WHERE {\n  ?s " + p1 + " ?x .\n  ?s " + p2 + " ?y .\n"
    if opt_pred:
        text = text.replace("?s ?x ?y", "?s ?x ?y ?o")
        text += "  OPTIONAL { ?s " + opt_pred + " ?o . }\n"
    if filt_val:
        text += f'  FILTER (?x != "{filt_val}") .\n'
    text += "}"
    q = parse_sparql(text)
    got = execute(q, ds()).to_pandas()

    b = match_patterns(
        ds(), [("?s", p1, "?x"), ("?s", p2, "?y")],
        optionals=[("?s", opt_pred, "?o")] if opt_pred else (),
    )
    if filt_val:
        b = apply_filters(b, [("?x", "!=", filt_val)])
    cols = ["s", "x", "y"] + (["o"] if opt_pred else [])
    want = select_bindings(b, cols).to_pandas().drop_duplicates()

    def key(df):
        # an empty Dataset loses its schema through to_pandas (the
        # Ray 2.49 empty-block quirk) — both sides empty is agreement
        if len(df) == 0:
            return []
        return sorted(map(tuple, df[cols].fillna("␀").values))

    assert key(got) == key(want)
