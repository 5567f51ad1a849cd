"""Unit coverage for the task-only join paths (query.hash_join /
merge_join) that replaced Ray 2.49's actor-based JoinOperator (whose
hash-shuffle aggregator actors linger across executions and degrade a
long-lived session 3-4x).

Properties pinned here:
  - inner and left_outer equality against a pandas reference on
    many-to-many keys (cross-product fan-out included)
  - broadcast path == merge path (hash_join's stats gate picks either;
    both must agree exactly)
  - schema discipline: left_outer null-fill keeps the arrow int type
    (no pandas NaN-float coercion), and non-key column collisions
    raise instead of silently suffixing
  - exactness under forced tiny target_max_block_size (merge_join
    rides the sorted-block co-location machinery; splitting sort
    partitions must not split a key across blocks)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from ray.data import DataContext


@pytest.fixture()
def tiny_blocks():
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024
    try:
        yield
    finally:
        ctx.target_max_block_size = old


def _sides(n_left=5_000, n_right=800, n_keys=300, seed=3):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "k": pa.array([f"k{int(x):04d}" for x in rng.integers(0, n_keys, n_left)]),
            "lv": pa.array(rng.integers(0, 1000, n_left), pa.int64()),
        }
    )
    # right has duplicate keys too (many-to-many) and misses some keys
    right = pa.table(
        {
            "k": pa.array(
                [f"k{int(x):04d}" for x in rng.integers(0, n_keys + 50, n_right)]
            ),
            "rv": pa.array(rng.integers(0, 1000, n_right), pa.int64()),
        }
    )
    return left, right


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _expect(left: pa.Table, right: pa.Table, how: str) -> pd.DataFrame:
    return left.to_pandas().merge(
        right.to_pandas(), on="k", how="left" if how == "left_outer" else how
    )


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_merge_join_matches_pandas(ray_session, how):
    from octoray.query import merge_join

    left, right = _sides()
    got = merge_join(
        rd.from_arrow(left).repartition(8), rd.from_arrow(right).repartition(4),
        ["k"], how=how,
    ).to_pandas()
    want = _expect(left, right, how)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False
    )


def test_left_outer_keeps_int_type(ray_session):
    """Unmatched right values become arrow nulls in an int64 column,
    not pandas NaN-coerced floats."""
    from octoray.query import merge_join

    left = pa.table({"k": ["a", "b"], "lv": pa.array([1, 2], pa.int64())})
    right = pa.table({"k": ["a"], "rv": pa.array([10], pa.int64())})
    out = merge_join(
        rd.from_arrow(left), rd.from_arrow(right), ["k"], how="left_outer"
    )
    schema = out.schema()
    assert dict(zip(schema.names, schema.types))["rv"] == pa.int64()
    rows = {r["k"]: r["rv"] for r in out.take_all()}
    assert rows == {"a": 10, "b": None}


def test_broadcast_and_merge_paths_agree(ray_session):
    from octoray.query import hash_join

    left, right = _sides()
    lds, rds = rd.from_arrow(left).repartition(8), rd.from_arrow(right)
    bcast = hash_join(lds, rds, "k").to_pandas()  # right side under limit
    merge = hash_join(lds, rds, "k", broadcast_limit=0).to_pandas()  # forced merge
    pd.testing.assert_frame_equal(_canon(bcast), _canon(merge), check_dtype=False)
    want = _expect(left, right, "inner")
    assert len(bcast) == len(want)


def test_hash_join_right_on_rename(ray_session):
    from octoray.query import hash_join

    left = pa.table({"k": ["a", "b", "a"], "lv": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"rk": ["a"], "rv": pa.array([9], pa.int64())})
    got = hash_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", right_on="rk"
    ).to_pandas()
    assert sorted(got["lv"].tolist()) == [1, 3]
    assert set(got.columns) == {"k", "lv", "rv"}


def test_merge_join_column_collision_raises(ray_session):
    from octoray.query import merge_join

    left = pa.table({"k": ["a"], "v": [1]})
    right = pa.table({"k": ["a"], "v": [2]})
    with pytest.raises(ValueError, match="collision"):
        merge_join(rd.from_arrow(left), rd.from_arrow(right), ["k"])


def test_merge_join_empty_right(ray_session):
    from octoray.query import merge_join

    left = pa.table({"k": ["a", "b"], "lv": pa.array([1, 2], pa.int64())})
    right = pa.table(
        {"k": pa.array([], pa.string()), "rv": pa.array([], pa.int64())}
    )
    inner = merge_join(rd.from_arrow(left), rd.from_arrow(right), ["k"])
    assert inner.count() == 0
    louter = merge_join(
        rd.from_arrow(left), rd.from_arrow(right), ["k"], how="left_outer"
    )
    assert sorted(r["k"] for r in louter.take_all()) == ["a", "b"]


def test_merge_join_exact_under_tiny_blocks(ray_session, tiny_blocks):
    """Hot keys + 4 KiB blocks: sort partitions split into many blocks;
    the join must still produce the exact pandas cross-product."""
    from octoray.query import merge_join

    rng = np.random.default_rng(11)
    n = 6_000
    keys = np.where(rng.random(n) < 0.4, 0, rng.integers(1, 40, n))
    left = pa.table(
        {
            "k": pa.array([f"h{int(x):02d}" for x in keys]),
            "lv": pa.array(np.arange(n), pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([f"h{i:02d}" for i in range(0, 45, 2)]),
            "rv": pa.array(np.arange(0, 45, 2), pa.int64()),
        }
    )
    got = merge_join(
        rd.from_arrow(left).repartition(16), rd.from_arrow(right), ["k"]
    ).to_pandas()
    want = _expect(left, right, "inner")
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
