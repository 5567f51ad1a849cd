"""PageRank: hand-checked small graphs + invariants."""

import pyarrow as pa
import ray.data as rd

from octoray.stages.graphalgo import pagerank, uri_edges


def _triples(edges, extra_literal=True):
    rows = [(s, "f:linksTo", o, "uri") for s, o in edges]
    if extra_literal:
        # literal triples must NOT become edges
        rows.append(("a", "f:name", "alpha", "plain"))
    return rd.from_arrow(pa.table({
        "subject": pa.array([r[0] for r in rows]),
        "predicate": pa.array([r[1] for r in rows]),
        "object": pa.array([r[2] for r in rows]),
        "object_datatype": pa.array([r[3] for r in rows]),
    }))


def test_uri_edges_filters_literals(ray_session):
    e = uri_edges(_triples([("a", "b")])).to_pandas()
    assert len(e) == 1 and tuple(e.iloc[0]) == ("a", "b")


def test_two_node_cycle_uniform(ray_session):
    # a <-> b: symmetric, every iteration keeps rank = 0.5 each
    out = pagerank(_triples([("a", "b"), ("b", "a")], extra_literal=False),
                   n_iters=5).to_pandas().set_index("node")["rank"]
    assert abs(out["a"] - 0.5) < 1e-9 and abs(out["b"] - 0.5) < 1e-9


def test_chain_matches_hand_iteration(ray_session):
    # a -> b -> c, one iteration, d = 0.85, N = 3:
    # base = 0.05; r(a)=0.05, r(b)=0.05+0.85/3, r(c)=0.05+0.85/3
    out = pagerank(_triples([("a", "b"), ("b", "c")], extra_literal=False),
                   damping=0.85, n_iters=1).to_pandas().set_index("node")["rank"]
    assert abs(out["a"] - 0.05) < 1e-6
    assert abs(out["b"] - (0.05 + 0.85 / 3)) < 1e-6
    assert abs(out["c"] - (0.05 + 0.85 / 3)) < 1e-6


def test_sink_accumulates(ray_session):
    # star into c: c must outrank the sources
    out = pagerank(_triples([("a", "c"), ("b", "c"), ("d", "c")],
                            extra_literal=False),
                   n_iters=5).to_pandas().set_index("node")["rank"]
    assert out["c"] > out["a"] == out["b"] == out["d"]


def test_fast_and_distributed_paths_identical(ray_session):
    import numpy as np

    rng = np.random.default_rng(3)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 40, (150, 2))
             if a != b}
    tr = _triples([(f"n{a}", f"n{b}") for a, b in edges],
                  extra_literal=False)
    fast = pagerank(tr, n_iters=4).to_pandas().set_index("node")["rank"]
    slow = pagerank(tr, n_iters=4, driver_limit=0).to_pandas(
        ).set_index("node")["rank"]
    assert sorted(fast.index) == sorted(slow.index)
    for k in fast.index:
        assert abs(fast[k] - slow[k]) < 1e-9, k
