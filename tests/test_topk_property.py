"""Property-based differential: grouped_top_k vs a pandas reference
over randomized (group, score, id) data — tie storms, tiny groups,
k larger than groups, ascending and descending."""

import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from octoray.query import grouped_top_k

_rows = st.lists(
    st.tuples(st.integers(0, 3),          # group
              st.integers(0, 5)),         # score (heavy ties)
    min_size=0, max_size=40)


@settings(max_examples=25, deadline=None)
@given(rows=_rows, k=st.integers(1, 6), desc=st.booleans(),
       parts=st.integers(1, 4))
def test_grouped_top_k_property(ray_session, rows, k, desc, parts):
    if not rows:
        return
    df = pd.DataFrame({
        "g": [g for g, _ in rows],
        "s": [s for _, s in rows],
        "id": range(len(rows)),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
    out = grouped_top_k(ds, ["g"], "s", k, tie_cols=["id"],
                        descending=desc).to_pandas()
    want = (df.sort_values(["g", "s", "id"],
                           ascending=[True, not desc, True],
                           kind="mergesort")
              .groupby("g", sort=False).head(k))
    key = ["g", "s", "id"]
    assert (out.sort_values(key).reset_index(drop=True)[key]
            .astype("int64")
            .equals(want.sort_values(key).reset_index(drop=True)[key]
                    .astype("int64")))


@settings(max_examples=15, deadline=None)
@given(vals=st.lists(st.integers(0, 30), min_size=1, max_size=60),
       parts=st.integers(1, 4), k=st.sampled_from([4, 8, 64]))
def test_kmv_partition_invariance_property(ray_session, vals, parts, k):
    """The KMV estimate must be identical under ANY partitioning
    (exact mergeability), and exact whenever distinct < k."""
    from octoray.stages.sketch import approx_distinct

    t = pa.table({"g": pa.array(["x"] * len(vals)),
                  "v": pa.array(vals, pa.int64())})
    one = approx_distinct(rd.from_arrow(t), "g", "v",
                          k=k).to_pandas()["approx_distinct"].iloc[0]
    many = approx_distinct(rd.from_arrow(t).repartition(parts), "g", "v",
                           k=k).to_pandas()["approx_distinct"].iloc[0]
    assert one == many
    nd = len(set(vals))
    if nd < k:
        assert one == float(nd)
