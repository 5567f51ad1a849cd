"""Property-based checks of the canonicalization contract: for ANY
multiset of triples (unicode, empties, heavy duplication across block
boundaries), canonicalize == sorted(set(rows))."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

triple = st.tuples(
    st.text(min_size=0, max_size=12),
    st.text(min_size=0, max_size=8),
    st.text(min_size=0, max_size=12),
    st.sampled_from(["", "uri", "xsd:date", "xsd:integer"]),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(triple, min_size=0, max_size=300))
def test_canonicalize_is_sorted_set(ray_session, rows):
    import ray.data as rd

    from octoray.model import triples_to_table
    from octoray.stages.canon import canonicalize

    # duplicate the input and scatter across many small blocks so
    # duplicates straddle block boundaries
    t = triples_to_table(rows + rows)
    ds = rd.from_arrow(t).repartition(7) if t.num_rows else rd.from_arrow(t)
    got = [tuple(r.values()) for r in canonicalize(ds).take_all()]
    assert got == sorted(set(rows))
