"""Corpus dedup decisions: exact-dup removal and connected components."""

import numpy as np
import pyarrow as pa


def test_drop_exact_dups(ray_session):
    import ray.data as rd

    from octoray.stages.dedup import drop_exact_dups

    texts = ["hello world", "Hello   WORLD", "unique one", "another", "hello world"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": pa.array(texts)})
    kept = sorted(r["doc_id"] for r in drop_exact_dups(rd.from_arrow(t)).take_all())
    # 0,1,4 normalize identically -> keep 0; plus 2 and 3
    assert kept == [0, 2, 3]


def _union_find(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_dup_components_matches_union_find(ray_session):
    import ray.data as rd

    from octoray.stages.dedup import dup_components

    rng = np.random.default_rng(11)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 120, (150, 2)) if a != b]
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]
    t = pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64()),
    })
    got = {r["id"]: r["component"] for r in dup_components(rd.from_arrow(t)).take_all()}
    nodes = {x for p in pairs for x in p}
    want = _union_find(pairs, nodes)
    # min-label propagation labels every node with its component min;
    # union-find with min-root merging gives the same representative
    assert got == want

    # the distributed label-propagation path (driver_limit=0 forces it)
    # must agree with the driver fast path exactly
    got_dist = {
        r["id"]: r["component"]
        for r in dup_components(rd.from_arrow(t), driver_limit=0).take_all()
    }
    assert got_dist == want


def test_dup_components_long_chain_converges_logarithmically(ray_session):
    """Pointer jumping: a 200-node chain must converge well inside
    max_iters=12 (log2(200) ~ 8); pure neighbor propagation would need
    ~200 rounds, so passing here pins the O(log d) behavior."""
    import ray.data as rd

    from octoray.stages.dedup import dup_components

    n = 200
    t = pa.table({
        "id_a": pa.array(list(range(n - 1)), pa.int64()),
        "id_b": pa.array(list(range(1, n)), pa.int64()),
    })
    got = {
        r["id"]: r["component"]
        for r in dup_components(
            rd.from_arrow(t), driver_limit=0, max_iters=12
        ).take_all()
    }
    assert got == {i: 0 for i in range(n)}


def test_near_dup_kept_representatives(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.dedup import near_dup_kept

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64())}))
    # components {1,2,3} and {5,6}; 4 untouched
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 5], pa.int64()),
        "id_b": pa.array([2, 3, 6], pa.int64())}))
    kept = sorted(near_dup_kept(docs, pairs).to_pandas()["doc_id"])
    assert kept == [1, 4, 5]

    # broadcast_limit=0 forces the distributed anti-join path; both
    # gates must agree (the unigram_logprob path-equality pattern)
    kept_join = sorted(
        near_dup_kept(docs, pairs, broadcast_limit=0).to_pandas()["doc_id"])
    assert kept_join == kept


def test_simhash_batch_matches_scalar_with_edge_docs():
    """The reduceat-vectorized batch path is bit-identical to the
    scalar definition, including empty / whitespace-only / 1-token
    docs at any position (incl. the last slot, where a naive reduceat
    start index would run out of bounds)."""
    from octoray.stages.dedup import SimHasher

    sh = SimHasher()
    texts = ["hello world foo", "", "   ", "a", "x y z w",
             "hello world foo", ""]
    batch = sh._batch_simhash(texts)
    for t, b in zip(texts, batch):
        toks = t.split()
        if not toks:
            assert int(b) == 0
        else:
            assert int(b) == sh.simhash(" ".join(toks))
    # identical docs -> identical signatures
    assert int(batch[0]) == int(batch[5])
