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


def test_triangle_count_known_and_random(ray_session):
    """K4 has exactly 4 triangles; a random graph matches the
    brute-force enumeration (reverse edges, self-loops and literal
    triples are ignored)."""
    import itertools

    import numpy as np
    import ray.data as rd

    from octoray.model import DT_URI, triples_to_table
    from octoray.stages.graphalgo import triangle_count

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("d", "e"), ("x", "y")]
    rows = [(s, "f:rel", o, DT_URI) for s, o in k4]
    out = triangle_count(rd.from_arrow(triples_to_table(rows)))
    assert out.to_pydict()["n_triangles"] == [4]

    rng = np.random.default_rng(5)
    nodes = [f"n{i:02d}" for i in range(30)]
    es = set()
    for _ in range(120):
        a, b = rng.choice(30, 2, replace=False)
        es.add((min(nodes[a], nodes[b]), max(nodes[a], nodes[b])))
    rows = [(a, "f:rel", b, DT_URI) for a, b in es]
    rows += [(b, "f:rel2", a, DT_URI) for a, b in list(es)[:20]]
    rows += [("n00", "f:rel", "n00", DT_URI), ("n01", "f:name", "lit", "")]
    want = sum(1 for x, y, z in itertools.combinations(sorted(nodes), 3)
               if (x, y) in es and (y, z) in es and (x, z) in es)
    got = triangle_count(rd.from_arrow(triples_to_table(rows)))
    assert got.to_pydict()["n_triangles"] == [want]


# ------------------------------------------------------------------- k-core
def _edge_triples(pairs):
    import pyarrow as pa

    from octoray.model import triples_to_table

    rows = [(a, "f:edge", b, "uri") for a, b in pairs]
    return triples_to_table(rows)


def test_kcore_hand_case(ray_session):
    import ray.data as rd

    from octoray.stages.graphalgo import kcore

    # triangle a-b-c (2-core) + pendant path c-d-e (peels away)
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    ds = rd.from_arrow(_edge_triples(pairs))
    out = sorted(r["node"] for r in kcore(ds, k=2).take_all())
    assert out == ["a", "b", "c"]
    # 3-core of a triangle is empty
    assert kcore(ds, k=3).count() == 0


def test_kcore_paths_agree_and_match_brute(ray_session):
    import numpy as np
    import ray.data as rd

    from octoray.stages.graphalgo import kcore

    rng = np.random.default_rng(13)
    n = 120
    pairs = {(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, n, size=(600, 2)) if a != b}
    ds = rd.from_arrow(_edge_triples(sorted(pairs)))
    drv = sorted(r["node"] for r in kcore(ds, k=3).take_all())
    dist = sorted(r["node"] for r in
                  kcore(ds, k=3, driver_limit=0).take_all())
    assert drv == dist
    # brute-force peel
    import collections
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive
                if len(adj[v] & alive) < 3}
        if not drop:
            break
        alive -= drop
    assert drv == sorted(alive)
    assert len(drv) > 0  # non-degenerate case


def test_hop_distances_hand_case_and_paths_agree(ray_session):
    """Undirected BFS depths on a hand graph; the driver fast path and
    the distributed frontier loop must be identical."""
    from octoray.stages.graphalgo import hop_distances

    # a - b - c - d chain plus a - e; f isolated from a
    edges = [("a", "b"), ("c", "b"), ("c", "d"), ("e", "a"), ("f", "g")]
    tri = _triples(edges)
    want = {"a": 0, "b": 1, "e": 1, "c": 2, "d": 3}
    for kwargs in ({}, {"driver_limit": 0}):
        out = {r["node"]: r["hops"]
               for r in hop_distances(tri, "a", max_hops=4,
                                      **kwargs).take_all()}
        assert out == want, f"{kwargs}"
    # cap stops the walk
    out2 = {r["node"]: r["hops"]
            for r in hop_distances(tri, "a", max_hops=1).take_all()}
    assert out2 == {"a": 0, "b": 1, "e": 1}
    # absent source: just the anchor row
    out3 = {r["node"]: r["hops"]
            for r in hop_distances(tri, "zz", max_hops=3,
                                   driver_limit=0).take_all()}
    assert out3 == {"zz": 0}


def test_random_walks_deterministic_and_handchecked(ray_session):
    """Walk picks match a brute-force md5 re-derivation; sinks stop
    walks early; output is partition-independent."""
    import hashlib

    from octoray.stages.graphalgo import random_walks

    edges = [("a", "b"), ("a", "c"), ("b", "c")]  # c is a sink
    tri = _triples(edges)
    adj = {"a": ["b", "c"], "b": ["c"]}

    def pick(w, t, u):
        hv = int.from_bytes(
            hashlib.md5(f"1:{w}:{t}:{u}".encode()).digest()[8:16], "little")
        return adj[u][hv % len(adj[u])]

    want = set()
    for start in ("a", "b"):
        for w in range(2):
            node = start
            want.add((start, w, 0, node))
            for t in range(1, 4):
                if node not in adj:
                    break
                node = pick(w, t, node)
                want.add((start, w, t, node))
    got = {(r["start"], r["walk"], r["step"], r["node"])
           for r in random_walks(tri, n_walks=2, walk_len=3,
                                 seed=1).take_all()}
    assert got == want
    got2 = {(r["start"], r["walk"], r["step"], r["node"])
            for r in random_walks(tri, n_walks=2, walk_len=3,
                                  seed=1).take_all()}
    assert got2 == want  # deterministic rerun


def test_walk_skipgrams_bruteforce(ray_session):
    """Skip-gram pairs match a brute-force window count, independent
    of partitioning (walks co-locate on the (start, walk) sort)."""
    import ray.data as rd

    from octoray.stages.graphalgo import walk_skipgrams

    rows = [("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "c"),
            ("a", 0, 3, "d"), ("b", 0, 0, "b"), ("b", 0, 1, "c"),
            ("a", 1, 0, "a"), ("a", 1, 1, "c")]
    t = pa.table({"start": pa.array([r[0] for r in rows]),
                  "walk": pa.array([r[1] for r in rows], pa.int64()),
                  "step": pa.array([r[2] for r in rows], pa.int64()),
                  "node": pa.array([r[3] for r in rows])})
    from collections import Counter
    want = Counter()
    walks = {}
    for s, w, st, n in rows:
        walks.setdefault((s, w), []).append((st, n))
    for seq in walks.values():
        seq = [n for _, n in sorted(seq)]
        for i, c in enumerate(seq):
            for d in (1, 2):
                if i + d < len(seq):
                    want[(c, seq[i + d])] += 1
                    want[(seq[i + d], c)] += 1
    for parts in (1, 4):
        got = {(r["center"], r["context"]): r["n"]
               for r in walk_skipgrams(
                   rd.from_arrow(t).repartition(parts),
                   window=2).take_all()}
        assert got == dict(want), f"parts={parts}"


def test_neighborhood_similarity_brute_and_paths(ray_session):
    """Jaccard link prediction matches a brute-force enumeration on a
    random graph (non-adjacent pairs only, hub cap honored), and the
    broadcast and merge-join edge-drop paths return identical rows."""
    import itertools

    import numpy as np
    import ray.data as rd

    from octoray.model import DT_URI, triples_to_table
    from octoray.stages.graphalgo import neighborhood_similarity

    rng = np.random.default_rng(11)
    nodes = [f"n{i:02d}" for i in range(25)]
    es = set()
    for _ in range(90):
        a, b = rng.choice(25, 2, replace=False)
        es.add((min(nodes[a], nodes[b]), max(nodes[a], nodes[b])))
    rows = [(a, "f:rel", b, DT_URI) for a, b in es]
    rows += [("n00", "f:name", "lit", "")]  # literals never edges
    tr = rd.from_arrow(triples_to_table(rows))

    nbr = {n: set() for n in nodes}
    for a, b in es:
        nbr[a].add(b)
        nbr[b].add(a)
    cap = 8
    want = {}
    for u, v in itertools.combinations(sorted(nodes), 2):
        if (u, v) in es:
            continue
        common = sum(1 for c in nbr[u] & nbr[v] if len(nbr[c]) <= cap)
        if common:
            want[(u, v)] = (common,
                            common / (len(nbr[u]) + len(nbr[v]) - common))

    got = neighborhood_similarity(tr, k=10_000, max_center_degree=cap
                                  ).to_pandas()
    got_map = {(r.a, r.b): (int(r.common), float(r.jaccard))
               for r in got.itertuples()}
    assert got_map == {k: (c, j) for k, (c, j) in want.items()}

    # top-k boundary: k smaller than candidates, deterministic ties
    top = neighborhood_similarity(tr, k=5, max_center_degree=cap
                                  ).to_pandas()
    ordered = sorted(want.items(),
                     key=lambda kv: (-kv[1][1], kv[0][0], kv[0][1]))[:5]
    assert [(r.a, r.b) for r in top.itertuples()] == [k for k, _ in ordered]

    # distributed path (driver gate forced off) identical
    dist = neighborhood_similarity(tr, k=10_000, max_center_degree=cap,
                                   driver_limit=0).to_pandas()
    dmap = {(r.a, r.b): (int(r.common), float(r.jaccard))
            for r in dist.itertuples()}
    assert dmap == got_map

    # merge-join edge-drop path (both gates forced off) identical
    mj = neighborhood_similarity(tr, k=10_000, max_center_degree=cap,
                                 driver_limit=0,
                                 broadcast_edge_limit=0).to_pandas()
    mmap = {(r.a, r.b): (int(r.common), float(r.jaccard))
            for r in mj.itertuples()}
    assert mmap == got_map


def test_label_propagation_two_cliques(ray_session):
    """Two triangles joined by one bridge edge settle into two
    communities labeled by each clique's smallest node; a brute-force
    synchronous re-derivation matches on a random graph."""
    import numpy as np
    import ray.data as rd

    from octoray.model import DT_URI, triples_to_table
    from octoray.stages.graphalgo import label_propagation

    es = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
          ("b1", "b2"), ("b1", "b3"), ("b2", "b3"), ("a3", "b1")]
    rows = [(s, "f:rel", o, DT_URI) for s, o in es]
    out = label_propagation(
        rd.from_arrow(triples_to_table(rows)), n_rounds=3).to_pandas()
    lab = dict(zip(out["node"], out["label"]))
    # synchronous dynamics traced by hand: the a-clique settles on a1;
    # the b-clique converges on the bridge-imported a3 (the classic
    # synchronous-LPA label bleed — deterministic, and what the
    # brute-force below re-derives)
    assert lab["a1"] == lab["a2"] == lab["a3"] == "a1"
    assert lab["b1"] == lab["b2"] == lab["b3"] == "a3"

    rng = np.random.default_rng(7)
    nodes = [f"n{i:02d}" for i in range(20)]
    es = set()
    for _ in range(50):
        a, b = rng.choice(20, 2, replace=False)
        es.add((min(nodes[a], nodes[b]), max(nodes[a], nodes[b])))
    nbr = {}
    for a, b in es:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    lab = {n: n for n in nbr}
    for _ in range(3):
        nxt = {}
        for n in nbr:
            cnt = {}
            for m in nbr[n]:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            nxt[n] = min(sorted(cnt), key=lambda L: (-cnt[L], L))
        lab = nxt
    rows = [(s, "f:rel", o, DT_URI) for s, o in es]
    got = label_propagation(
        rd.from_arrow(triples_to_table(rows)), n_rounds=3).to_pandas()
    assert dict(zip(got["node"], got["label"])) == lab


def test_random_walks_driver_and_distributed_identical(ray_session):
    """The driver fast path and the distributed per-step join loop
    produce the identical corpus on a random graph."""
    import numpy as np
    import ray.data as rd

    from octoray.model import DT_URI, triples_to_table
    from octoray.stages.graphalgo import random_walks

    rng = np.random.default_rng(13)
    es = {(f"n{a}", f"n{b}") for a, b in rng.integers(0, 30, (80, 2))
          if a != b}
    rows = [(s, "f:rel", o, DT_URI) for s, o in es]
    tri = rd.from_arrow(triples_to_table(rows))
    key = lambda r: (r["start"], r["walk"], r["step"], r["node"])
    fast = sorted(map(key, random_walks(
        tri, n_walks=2, walk_len=4, seed=3).take_all()))
    dist = sorted(map(key, random_walks(
        tri, n_walks=2, walk_len=4, seed=3, driver_limit=0).take_all()))
    assert fast == dist and len(fast) > 0


def test_adjacency_export_sorted_and_distinct(ray_session):
    """Neighbor lists are sorted-distinct '+'-joins; degree matches;
    literal triples excluded; result is partition-invariant."""
    from octoray.stages.graphalgo import adjacency_export

    tri = _triples([("a", "c"), ("a", "b"), ("a", "c"), ("b", "a")])
    out = adjacency_export(tri).to_pandas().sort_values(
        "node").reset_index(drop=True)
    assert out["node"].tolist() == ["a", "b"]
    assert out["neighbors"].tolist() == ["b+c", "a"]
    assert out["out_degree"].tolist() == [2, 1]


def test_hits_single_edge(ray_session):
    from octoray.stages.graphalgo import hits_edges

    e = rd.from_arrow(pa.table({"src": ["a"], "dst": ["b"]}))
    out = hits_edges(e, n_iters=3).to_pandas().set_index("node")
    assert abs(out.loc["a", "hub"] - 1.0) < 1e-9
    assert abs(out.loc["a", "authority"] - 0.0) < 1e-9
    assert abs(out.loc["b", "hub"] - 0.0) < 1e-9
    assert abs(out.loc["b", "authority"] - 1.0) < 1e-9


def test_hits_star(ray_session):
    # a,b,d -> c: c is the sole authority; a=b=d equal hubs 1/sqrt(3)
    from octoray.stages.graphalgo import hits_edges

    e = rd.from_arrow(pa.table({"src": ["a", "b", "d"],
                                "dst": ["c", "c", "c"]}))
    out = hits_edges(e, n_iters=4).to_pandas().set_index("node")
    assert abs(out.loc["c", "authority"] - 1.0) < 1e-9
    for n in "abd":
        assert abs(out.loc[n, "hub"] - 3 ** -0.5) < 1e-6
        assert abs(out.loc[n, "authority"]) < 1e-9


def test_hits_fast_and_distributed_identical(ray_session):
    import numpy as np

    from octoray.stages.graphalgo import hits_edges

    rng = np.random.default_rng(7)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 40, (150, 2))
             if a != b}
    e = rd.from_arrow(pa.table({
        "src": [f"n{a}" for a, _ in sorted(edges)],
        "dst": [f"n{b}" for _, b in sorted(edges)]}))
    fast = hits_edges(e, n_iters=4).to_pandas().set_index("node")
    slow = hits_edges(e, n_iters=4, driver_limit=0).to_pandas(
        ).set_index("node")
    assert sorted(fast.index) == sorted(slow.index)
    for k in fast.index:
        assert abs(fast.loc[k, "hub"] - slow.loc[k, "hub"]) < 1e-9, k
        assert abs(fast.loc[k, "authority"]
                   - slow.loc[k, "authority"]) < 1e-9, k


def test_clustering_coefficients_brute(ray_session):
    import numpy as np

    from octoray.stages.graphalgo import clustering_coefficients

    rng = np.random.default_rng(5)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 25, (120, 2))
             if a != b}
    tr = _triples([(f"n{a}", f"n{b}") for a, b in sorted(edges)],
                  extra_literal=False)
    got = (clustering_coefficients(tr).to_pandas()
           .set_index("node").sort_index())

    und = {(min(f"n{a}", f"n{b}"), max(f"n{a}", f"n{b}"))
           for a, b in edges}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert sorted(got.index) == sorted(adj)
    any_triangle = False
    for n, nb in adj.items():
        nbl = sorted(nb)
        t = sum(1 for i in range(len(nbl)) for j in range(i + 1, len(nbl))
                if (min(nbl[i], nbl[j]), max(nbl[i], nbl[j])) in und)
        d = len(nbl)
        assert got.loc[n, "deg"] == d, n
        assert got.loc[n, "n_triangles"] == t, n
        c = 0.0 if d < 2 else 2.0 * t / (d * (d - 1))
        assert abs(got.loc[n, "coeff"] - np.floor(c * 1e6 + 0.5) / 1e6) < 1e-9
        any_triangle = any_triangle or t > 0
    assert any_triangle


def test_trustrank_fast_and_distributed_identical(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.graphalgo import trustrank_edges

    rng = np.random.default_rng(13)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 30, (120, 2))
             if a != b}
    e = rd.from_arrow(pa.table({
        "src": [f"n{a}" for a, _ in sorted(edges)],
        "dst": [f"n{b}" for _, b in sorted(edges)]}))
    fast = trustrank_edges(e, n_iters=4, n_seeds=5).to_pandas(
        ).set_index("node")["rank"]
    slow = trustrank_edges(e, n_iters=4, n_seeds=5, driver_limit=0
                           ).to_pandas().set_index("node")["rank"]
    assert sorted(fast.index) == sorted(slow.index)
    for k in fast.index:
        assert abs(fast[k] - slow[k]) < 1e-9, k
    # mass is concentrated near seeds: at least one zero-rank node
    # (unreachable from any seed) and one strictly positive
    assert (fast == 0.0).any() and (fast > 0.0).any()


def test_katz_fast_and_distributed_identical(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.graphalgo import katz_edges

    rng = np.random.default_rng(17)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 30, (100, 2))
             if a != b}
    e = rd.from_arrow(pa.table({
        "src": [f"n{a}" for a, _ in sorted(edges)],
        "dst": [f"n{b}" for _, b in sorted(edges)]}))
    fast = katz_edges(e, beta=0.1, n_iters=3).to_pandas(
        ).set_index("node")["katz"]
    slow = katz_edges(e, beta=0.1, n_iters=3, driver_limit=0
                      ).to_pandas().set_index("node")["katz"]
    assert sorted(fast.index) == sorted(slow.index)
    for k in fast.index:
        assert abs(fast[k] - slow[k]) < 1e-9, k
    # one hop: a node with in-degree d gets at least beta*d
    assert (fast > 0).any()


def test_assortativity_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.graphalgo import assortativity

    # star K1,3: every edge joins deg 3 with deg 1 -> r = -1
    e = rd.from_arrow(pa.table({
        "src": ["c", "c", "c"], "dst": ["x", "y", "z"]}))
    out = assortativity(e).to_pandas()
    assert int(out["n_edges"][0]) == 3
    assert abs(out["assortativity"][0] + 1.0) < 1e-9


def test_comention_graph_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.graphalgo import comention_graph

    rows = [  # (src page, subject); p1 and p2 both mention x and y
        ("p1", "x"), ("p1", "y"), ("p1", "z"),
        ("p2", "x"), ("p2", "y"),
        ("p2", "x"),  # duplicate mention on one page: no double count
        ("p3", "w"),
    ]
    tr = rd.from_arrow(pa.table({
        "subject": [r[1] for r in rows],
        "predicate": ["f:p"] * len(rows),
        "object": ["o"] * len(rows),
        "object_datatype": ["plain"] * len(rows),
        "src": [r[0] for r in rows]}))
    out = (comention_graph(tr, min_pages=2).to_pandas()
           .sort_values(["entity_a", "entity_b"]).reset_index(drop=True))
    assert len(out) == 1
    assert tuple(out.iloc[0]) == ("x", "y", 2)
