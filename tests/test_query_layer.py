"""Query-layer primitives: sorted/block grouping equivalence with
Ray's native groupby (the block-colocation invariant), anti-joins,
and hot-key skew correctness."""

import numpy as np
import pyarrow as pa
import pandas as pd


def _rand_table(n=5000, n_keys=400, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array([f"key{int(x):04d}" for x in rng.integers(0, n_keys, n)]),
            "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
        }
    )


def test_sorted_groupby_count_equals_native(ray_session):
    import ray.data as rd

    from octoray.query import sorted_groupby_count

    t = _rand_table()
    ds = rd.from_arrow(t).repartition(16)
    got = {(r["k"], r["n"]) for r in sorted_groupby_count(ds, ["k"], alias="n").take_all()}
    want = {
        (r["k"], r["count()"]) for r in rd.from_arrow(t).groupby("k").count().take_all()
    }
    assert got == want


def test_sorted_map_groups_equals_native(ray_session):
    import ray.data as rd

    from octoray.query import sorted_map_groups

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "s": [int(g["v"].sum())]})

    t = _rand_table()
    ds = rd.from_arrow(t).repartition(16)
    got = {(r["k"], r["s"]) for r in sorted_map_groups(ds, ["k"], fn).take_all()}
    want = {
        (r["k"], r["s"])
        for r in rd.from_arrow(t).groupby("k").map_groups(fn, batch_format="pandas").take_all()
    }
    assert got == want


def test_hot_key_skew_exactness(ray_session):
    """A hub key holding 50% of all rows (the H1N1-hub scenario the
    north rule names) must aggregate exactly through both the
    partial-combine path and the sorted-block path."""
    import ray.data as rd

    from octoray.query import sorted_groupby_count
    from octoray.stages.canon import subject_degree

    n = 20000
    subjects = ["fid:hub"] * (n // 2) + [f"fid:s{i}" for i in range(n // 2)]
    t = pa.table(
        {
            "subject": pa.array(subjects),
            "predicate": pa.array(["f:p"] * n),
            "object": pa.array([str(i) for i in range(n)]),
            "object_datatype": pa.array([""] * n),
        }
    )
    ds = rd.from_arrow(t).repartition(32)
    deg = {r["subject"]: r["degree"] for r in subject_degree(ds, combined=True).take_all()}
    assert deg["fid:hub"] == n // 2
    assert all(v == 1 for k, v in deg.items() if k != "fid:hub")
    cnt = {r["subject"]: r["n"]
           for r in sorted_groupby_count(ds, ["subject"], alias="n").take_all()}
    assert cnt == deg


def test_anti_join_distributed(ray_session):
    import ray.data as rd

    from octoray.query import anti_join

    left = rd.from_arrow(pa.table({"subject": [f"s{i}" for i in range(100)],
                                   "value": [str(i) for i in range(100)]}))
    right = rd.from_arrow(pa.table({"subject": [f"s{i}" for i in range(0, 100, 2)]}))
    out = anti_join(left, right, on="subject").take_all()
    assert sorted(r["subject"] for r in out) == sorted(f"s{i}" for i in range(1, 100, 2))


def test_salted_groupby_sum_equals_unsalted(ray_session):
    """Salted two-phase == direct aggregate on hub-skewed data."""
    import ray.data as rd

    from octoray.query import salted_groupby_sum
    from ray.data.aggregate import Sum

    n = 10000
    t = pa.table(
        {
            "k": pa.array(["hub"] * (n // 2) + [f"k{i % 50}" for i in range(n // 2)]),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(t).repartition(16)
    got = {(r["k"], r["s"]) for r in salted_groupby_sum(ds, "k", "v", alias="s").take_all()}
    want = {(r["k"], r["s"])
            for r in rd.from_arrow(t).groupby("k").aggregate(Sum("v", alias_name="s")).take_all()}
    assert got == want


def test_subjects_matching_all(ray_session):
    import ray.data as rd

    from octoray.model import triples_to_table
    from octoray.query import subjects_matching_all

    rows = [
        ("fid:a", "f:subtype", "H1N1", ""),
        ("fid:a", "f:state", "usa:IA", "uri"),
        ("fid:b", "f:subtype", "H1N1", ""),
        ("fid:c", "f:subtype", "H3N2", ""),
        ("fid:c", "f:state", "usa:MN", "uri"),
    ]
    ds = rd.from_arrow(triples_to_table(rows)).repartition(3)
    got = {r["subject"] for r in subjects_matching_all(
        ds, [("f:subtype", "H1N1"), ("f:state", None)]).take_all()}
    assert got == {"fid:a"}
    got2 = {r["subject"] for r in subjects_matching_all(
        ds, [("f:state", None)]).take_all()}
    assert got2 == {"fid:a", "fid:c"}
