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


def test_line_dedup_exact_under_tiny_blocks(ray_session, tiny_blocks):
    """The round-2 C4 line dedup relies twice on the invariant (keep-
    first per line, doc rebuild) — stress both with heavy duplication
    across many small blocks."""
    from octoray.stages.linededup import line_dedup

    rows = []
    for i in range(400):
        # every doc shares 'common one'/'common two'; unique tail
        rows.append((f"u{i:04d}", f"common one. common two. unique {i}"))
    docs = rd.from_arrow(pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "text": pa.array([t for _, t in rows], pa.string()),
    })).repartition(16)
    out = line_dedup(docs).to_pandas().set_index("url")
    assert len(out) == 400
    assert out.loc["u0000", "n_kept"] == 3
    assert int((out["n_kept"] == 1).sum()) == 399
    # every doc keeps its unique line exactly once
    assert all(f"unique {i}" in out.loc[f"u{i:04d}", "text_dedup"]
               for i in range(0, 400, 97))


def test_tfidf_topk_exact_under_tiny_blocks(ray_session, tiny_blocks):
    from octoray.stages.tfidf import tfidf_keywords

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "text": pa.array([f"tok{i % 5} shared words tok{i % 5}"
                          for i in range(300)], pa.string()),
    })).repartition(16)
    out = tfidf_keywords(docs, k=2).to_pandas()
    # exactly 2 keywords per doc, and every doc present
    assert sorted(out["doc_id"].unique()) == list(range(300))
    assert (out.groupby("doc_id").size() == 2).all()


def test_latest_per_url_exact_under_tiny_blocks(ray_session, tiny_blocks):
    """The crawl arg-max reduce (round-2 crawl family) rides the same
    sorted-block invariant: many fetches per url spread over many tiny
    blocks must still collapse to exactly one winner per url."""
    from octoray.stages.crawl import latest_per_url

    rows_url, rows_ts, rows_text = [], [], []
    for u in range(120):
        for f in range(17):  # 17 fetches per url
            rows_url.append(f"https://d{u % 7}.org/p/{u:04d}")
            rows_ts.append((u * 1000 + f * 13) * 1_000_000)
            rows_text.append(f"content {u} v{f}")
    crawl = rd.from_arrow(pa.table({
        "url": pa.array(rows_url, pa.string()),
        "warc_ts": pa.array(rows_ts, pa.timestamp("us")),
        "text": pa.array(rows_text, pa.string()),
    })).repartition(16)
    out = latest_per_url(crawl).to_pandas()
    assert len(out) == 120
    assert out["url"].is_unique
    # the winner is always the last fetch (highest ts)
    import hashlib
    want = {f"https://d{u % 7}.org/p/{u:04d}":
            hashlib.md5(f"content {u} v16".encode()).hexdigest()
            for u in range(120)}
    got = dict(zip(out["url"], out["content_md5"]))
    assert got == want


# ---------------------------------------------------------------------
# Round-5 structural enforcement (VERDICT r4 #1): colocated_sort runs
# the O(blocks) bounds verification ON BY DEFAULT, and the verifier is
# proven to actually catch a split/interleaved sort partition by
# simulating one directly (multi-block datasets built WITHOUT a sort).
# ---------------------------------------------------------------------


def _blocks(*tables):
    """One Ray block per input table, in order (bypasses sort)."""
    return rd.from_arrow(list(tables))


def test_verify_raises_on_forced_partition_split(ray_session):
    """Simulate a future Ray splitting a sort partition mid-key: the
    key 'b' ends block 0 and starts block 1."""
    from octoray.plan import BlockColocationError, verify_block_colocation

    ds = _blocks(pa.table({"k": ["a", "a", "b"]}),
                 pa.table({"k": ["b", "c"]}))
    with pytest.raises(BlockColocationError):
        verify_block_colocation(ds, ["k"])


def test_verify_raises_on_interleaved_blocks(ray_session):
    """A sort that emitted overlapping (not merely touching) ranges
    must also fail: block 0 covers a..c, block 1 starts at b."""
    from octoray.plan import BlockColocationError, verify_block_colocation

    ds = _blocks(pa.table({"k": ["a", "c"]}),
                 pa.table({"k": ["b", "d"]}))
    with pytest.raises(BlockColocationError):
        verify_block_colocation(ds, ["k"])


def test_verify_raises_on_null_key_straddle(ray_session):
    from octoray.plan import BlockColocationError, verify_block_colocation

    ds = _blocks(pa.table({"k": pa.array(["a", None], pa.string())}),
                 pa.table({"k": pa.array([None, "b"], pa.string())}))
    with pytest.raises(BlockColocationError):
        verify_block_colocation(ds, ["k"], ordered=False)


def test_verify_accepts_disjoint_blocks(ray_session):
    from octoray.plan import verify_block_colocation

    ds = _blocks(pa.table({"k": ["a", "b"], "v": [1, 2]}),
                 pa.table({"k": ["c", "d"], "v": [3, 4]}),
                 pa.table({"k": [], "v": []}).cast(
                     pa.schema([("k", pa.string()), ("v", pa.int64())])))
    # empty blocks are skipped; 2 non-empty blocks inspected
    assert verify_block_colocation(ds, ["k"]) == 2


def test_verify_multikey_straddle(ray_session):
    from octoray.plan import BlockColocationError, verify_block_colocation

    ds = _blocks(pa.table({"a": ["x", "x"], "b": [1, 2]}),
                 pa.table({"a": ["x", "y"], "b": [2, 1]}))
    with pytest.raises(BlockColocationError):
        verify_block_colocation(ds, ["a", "b"])


def test_colocated_sort_on_by_default(ray_session, tiny_blocks, monkeypatch):
    """The production chokepoint: check enabled with no env var set,
    sorted output correct and verified."""
    monkeypatch.delenv("OCTORAY_CHECK_BLOCKS", raising=False)
    from octoray.plan import block_check_enabled, colocated_sort

    assert block_check_enabled()
    ds = rd.from_arrow(_skewed_table()).repartition(16)
    out = colocated_sort(ds, ["k"])
    vals = [r["k"] for r in out.take_all()]
    assert vals == sorted(vals)


def test_block_check_env_optout(monkeypatch):
    from octoray import plan

    monkeypatch.setenv("OCTORAY_CHECK_BLOCKS", "0")
    assert not plan.block_check_enabled()
    monkeypatch.setenv("OCTORAY_CHECK_BLOCKS", "off")
    assert not plan.block_check_enabled()
    monkeypatch.setenv("OCTORAY_CHECK_BLOCKS", "1")
    assert plan.block_check_enabled()


def test_dedup_fails_loudly_when_sort_splits(ray_session, monkeypatch):
    """End-to-end guard: if a future Ray's sort re-chunks its output
    (splitting a key run across blocks), the PRODUCTION dedup path
    must raise BlockColocationError — never return a silently
    under-deduplicated graph.  Simulated by wrapping Dataset.sort with
    an order-preserving repartition (splits blocks mid-run)."""
    import ray.data

    from octoray.plan import BlockColocationError
    from octoray.stages.canon import dedup_triples

    orig = ray.data.Dataset.sort

    def splitting_sort(self, *a, **k):
        return orig(self, *a, **k).repartition(6)

    monkeypatch.setattr(ray.data.Dataset, "sort", splitting_sort)
    # one key repeated 1200x: any 6-way re-chunk MUST straddle it
    t = pa.table({
        "subject": pa.array(["s"] * 1200 + ["t", "u"]),
        "predicate": pa.array(["p"] * 1202),
        "object": pa.array(["o"] * 1200 + ["x", "y"]),
        "object_datatype": pa.array([""] * 1202),
    })
    ds = rd.from_arrow(t).repartition(4)
    with pytest.raises(BlockColocationError):
        dedup_triples(ds).take_all()
