"""Stress the sorted-block co-location invariant (VERDICT r1 #6 /
ADVICE): the block-local grouping family (block_map_groups,
sorted_groupby_count, _sorted_block_dedup, sessionize) assumes a Ray
range-partitioned sort emits each partition as ONE block, so equal
keys never straddle block boundaries.  These tests force tiny
target_max_block_size so that, if Ray ever starts splitting sort
partitions, assert_block_colocation and the exactness checks below
fail loudly instead of dedup silently dropping rows."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from ray.data import DataContext


@pytest.fixture()
def tiny_blocks():
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024  # 4 KiB — far below any real value
    try:
        yield
    finally:
        ctx.target_max_block_size = old


def _skewed_table(n=20_000, n_keys=7):
    # heavy skew: one hot key holds half the rows
    rng = np.random.default_rng(7)
    keys = np.where(rng.random(n) < 0.5, 0, rng.integers(1, n_keys, n))
    return pa.table(
        {
            "k": pa.array([f"key{int(x):03d}" for x in keys], pa.string()),
            "v": pa.array(rng.integers(0, 50, n), pa.int64()),
        }
    )


def test_colocation_holds_under_tiny_blocks(ray_session, tiny_blocks):
    from octoray.query import assert_block_colocation

    ds = rd.from_arrow(_skewed_table()).repartition(16).sort(["k"])
    # raises AssertionError if any key straddles two blocks
    assert_block_colocation(ds, ["k"])


def test_sorted_groupby_count_exact_under_tiny_blocks(ray_session, tiny_blocks):
    from octoray.query import sorted_groupby_count

    t = _skewed_table()
    ds = rd.from_arrow(t).repartition(16)
    got = {
        r["k"]: r["n"] for r in sorted_groupby_count(ds, ["k"], alias="n").take_all()
    }
    import collections

    want = collections.Counter(t.column("k").to_pylist())
    assert got == dict(want)


def test_dedup_exact_under_tiny_blocks(ray_session, tiny_blocks):
    from octoray.stages.canon import dedup_triples

    # many duplicate triples spread over many input blocks
    n = 5000
    rows = [(f"s{i % 97}", "f:p", f"o{i % 31}", "") for i in range(n)]
    t = pa.table(
        {
            "subject": pa.array([r[0] for r in rows]),
            "predicate": pa.array([r[1] for r in rows]),
            "object": pa.array([r[2] for r in rows]),
            "object_datatype": pa.array([r[3] for r in rows]),
        }
    )
    ds = rd.from_arrow(t).repartition(16)
    out = dedup_triples(ds).take_all()
    got = {(r["subject"], r["predicate"], r["object"], r["object_datatype"]) for r in out}
    assert len(out) == len(got) == len(set(rows))


def test_sorted_block_dedup_null_safe(ray_session):
    """Null object values must dedup as equal-to-null, never be
    silently dropped by a null filter mask (ADVICE r1)."""
    from octoray.stages.canon import dedup_triples

    t = pa.table(
        {
            "subject": pa.array(["s1", "s1", "s2", "s2", "s3"]),
            "predicate": pa.array(["p", "p", "p", "p", "p"]),
            "object": pa.array([None, None, "o", None, "o"], pa.string()),
            "object_datatype": pa.array(["", "", "", "", ""]),
        }
    )
    out = dedup_triples(rd.from_arrow(t)).take_all()
    got = {(r["subject"], r["object"]) for r in out}
    # s1 keeps ONE null row; s2 keeps both its null and its value row
    assert got == {("s1", None), ("s2", "o"), ("s2", None), ("s3", "o")}
    assert len(out) == 4
