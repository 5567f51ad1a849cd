"""Web link-graph products: extraction, anchor index, link rank."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from octoray.sources import webtext
from octoray.stages.extract import extract_links_batch
from octoray.stages import webgraph


def _pages_table(n, seed=42):
    return webtext.pages_batch(np.arange(n), seed=seed)


def test_page_links_deterministic_and_in_html():
    for pid in [0, 1, 7, 123, 9999]:
        links = webtext.page_links(pid)
        assert links == webtext.page_links(pid)
        row, _ = webtext.page_record(pid)
        html = row["html"].decode("utf-8")
        # every planted link appears verbatim, in order, in <nav>
        nav = html.split("<nav>")[1].split("</nav>")[0]
        found = re.findall(r'<a href="([^"]*)">([^<]*)</a>', nav)
        assert found == links
        # and none leak into the extracted text (the byte invariant)
        assert "<a href" not in row["text"]


def test_extract_links_matches_naive_per_row():
    t = _pages_table(200)
    got = extract_links_batch(t).to_pandas()
    exp_rows = []
    for url, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        for d, a in re.findall(rb'<a href="([^"]*)">([^<]*)</a>', bytes(h)):
            exp_rows.append((url, d.decode(), a.decode()))
    exp = pd.DataFrame(exp_rows, columns=["src", "dst", "anchor"])
    pd.testing.assert_frame_equal(got, exp)


def test_extract_links_batch_boundary_invariant():
    t = _pages_table(64)
    whole = extract_links_batch(t)
    parts = pa.concat_tables([extract_links_batch(t.slice(0, 31)),
                              extract_links_batch(t.slice(31))])
    assert whole.equals(parts)
    assert extract_links_batch(t.slice(0, 0)).num_rows == 0


def test_links_equal_planted_ground_truth(ray_session):
    import ray.data as rd

    pages = webtext.pages_dataset(300)
    got = webgraph.links_dataset(pages).to_pandas()
    exp_rows = []
    for pid in range(300):
        url = f"{webtext.URL_PREFIX}{pid:012d}"
        for d, a in webtext.page_links(pid):
            exp_rows.append((url, d, a))
    exp = pd.DataFrame(exp_rows, columns=["src", "dst", "anchor"])
    key = ["src", "dst", "anchor"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True))


def test_anchor_summary_vs_pandas(ray_session):
    pages = webtext.pages_dataset(400)
    links = webgraph.links_dataset(pages)
    got = (webgraph.anchor_summary(links).to_pandas()
           .sort_values("dst").reset_index(drop=True))
    raw = links.to_pandas()
    g = raw.groupby("dst", sort=True)
    exp = pd.DataFrame({
        "n_inlinks": g.size().astype(np.int64),
        "n_src": g["src"].nunique().astype(np.int64),
        "anchors": raw.drop_duplicates(["dst", "anchor"])
                     .sort_values(["dst", "anchor"])
                     .groupby("dst", sort=True)["anchor"].agg("+".join),
    }).reset_index()
    pd.testing.assert_frame_equal(
        got[["dst", "n_inlinks", "n_src", "anchors"]],
        exp[["dst", "n_inlinks", "n_src", "anchors"]])
    # hub skew is actually present: some target has many in-links
    assert got["n_inlinks"].max() >= 5


def test_harmonic_paths_equal_and_match_naive(ray_session):
    from octoray.stages.graphalgo import harmonic_centrality

    pages = webtext.pages_dataset(250)
    links = webgraph.links_dataset(pages)
    edges = webgraph.internal_edges(links).materialize()

    a = (harmonic_centrality(edges, n_sources=6, max_hops=3)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (harmonic_centrality(edges, n_sources=6, max_hops=3,
                             driver_limit=0)  # force distributed BFS
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)

    # naive recomputation: undirected BFS from the same md5 bottom-k
    import hashlib
    e = edges.to_pandas()
    e = e[e["src"] != e["dst"]]
    adj = {}
    for s, d in zip(e["src"], e["dst"]):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    nodes = sorted(adj)
    hv = {n: int.from_bytes(hashlib.md5(n.encode()).digest()[8:16], "little")
          for n in nodes}
    srcs = sorted(nodes, key=lambda n: (hv[n], n))[:6]
    acc = {}
    for s in srcs:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, 4):
            nxt = [v for u in frontier for v in adj[u] if v not in dist]
            for v in nxt:
                dist.setdefault(v, d)
            frontier = sorted(set(nxt))
            if not frontier:
                break
        for n, d in dist.items():
            if d > 0:
                c, h = acc.get(n, (0, 0.0))
                acc[n] = (c + 1, h + 1.0 / d)
    exp = pd.DataFrame(
        [(n, c, np.floor(h * 1e6 + 0.5) / 1e6)
         for n, (c, h) in sorted(acc.items())],
        columns=["node", "n_reached", "harmonic"])
    exp["n_reached"] = exp["n_reached"].astype("int64")
    pd.testing.assert_frame_equal(a, exp)


def test_link_rank_matches_numpy_power_iteration(ray_session):
    pages = webtext.pages_dataset(300)
    links = webgraph.links_dataset(pages)
    got = webgraph.link_rank(links, damping=0.85, n_iters=3).to_pandas()

    edges = (webgraph.internal_edges(links).to_pandas()
             .drop_duplicates().reset_index(drop=True))
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = edges.groupby("src").size()
    rank = np.full(n, 1.0 / n)
    for _ in range(3):
        mass = np.zeros(n)
        r_by_src = rank[[idx[s] for s in edges["src"]]]
        np.add.at(mass, [idx[d] for d in edges["dst"]],
                  r_by_src / deg[edges["src"]].to_numpy())
        rank = (1 - 0.85) / n + 0.85 * mass
    exp = pd.DataFrame({"node": nodes, "rank": np.floor(rank * 1e6 + 0.5) / 1e6})
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True), exp)


def test_frontier_urls_brute(ray_session):
    pages = webtext.pages_dataset(200)
    links = webgraph.links_dataset(pages)
    got = (webgraph.frontier_urls(links, pages).to_pandas()
           .sort_values("url").reset_index(drop=True))

    ldf = links.to_pandas()
    ldf = ldf[ldf["dst"].str.startswith(webtext.URL_PREFIX)]
    crawled = set(pages.to_pandas()["url"])
    g = ldf.groupby("dst")
    exp = pd.DataFrame({
        "n_inlinks": g.size().astype("int64"),
        "n_src": g["src"].nunique().astype("int64"),
    }).reset_index().rename(columns={"dst": "url"})
    exp = exp[~exp["url"].isin(crawled)].sort_values(
        "url").reset_index(drop=True)
    assert len(exp) > 0  # LINK_UNIVERSE >> crawl: frontier non-trivial
    pd.testing.assert_frame_equal(got, exp)


def test_degree_histogram_brute(ray_session):
    pages = webtext.pages_dataset(200)
    links = webgraph.links_dataset(pages)
    got = (webgraph.degree_histogram(links).to_pandas()
           .sort_values(["direction", "degree"]).reset_index(drop=True))

    e = webgraph.internal_edges(links).to_pandas().drop_duplicates()
    rows = []
    for tag, col in [("in", "dst"), ("out", "src")]:
        deg = e.groupby(col).size()
        for d, n in deg.value_counts().sort_index().items():
            rows.append((tag, d, n))
    exp = pd.DataFrame(rows, columns=["direction", "degree", "n_nodes"])
    exp["degree"] = exp["degree"].astype("int64")
    exp["n_nodes"] = exp["n_nodes"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_reciprocity_hand_graph(ray_session):
    import ray.data as rd

    # a<->b reciprocated, a->c not, c->c self-loop dropped
    pre = webtext.URL_PREFIX
    links = rd.from_arrow(pa.table({
        "src": [f"{pre}a", f"{pre}b", f"{pre}a", f"{pre}c"],
        "dst": [f"{pre}b", f"{pre}a", f"{pre}c", f"{pre}c"],
        "anchor": ["x", "y", "z", "w"]}))
    out = webgraph.reciprocity(links).to_pandas()
    assert int(out["n_edges"][0]) == 3
    assert int(out["n_recip"][0]) == 2
    assert abs(out["reciprocity"][0] - 0.666667) < 1e-9


def _bowtie_links(edges):
    import ray.data as rd

    pre = webtext.URL_PREFIX
    return rd.from_arrow(pa.table({
        "src": [f"{pre}{s}" for s, _ in edges],
        "dst": [f"{pre}{d}" for _, d in edges],
        "anchor": ["x"] * len(edges)}))


def test_bowtie_hand_graph(ray_session):
    # core: a<->b (b is max-indeg pivot... indeg: b=2,a=1,c=1,d=1)
    # i->a (IN), b->o (OUT), t->o (OTHER: reaches OUT, not core)
    links = _bowtie_links([("a", "b"), ("b", "a"), ("i", "a"),
                           ("i", "b"), ("b", "o"), ("t", "o")])
    out = webgraph.bowtie(links).to_pandas().set_index("node")
    pre = webtext.URL_PREFIX
    exp = {"a": "core", "b": "core", "i": "in", "o": "out", "t": "other"}
    for n, part in exp.items():
        assert out.loc[f"{pre}{n}", "part"] == part, n


def test_bowtie_fast_and_distributed_identical(ray_session):
    pages = webtext.pages_dataset(300)
    links = webgraph.links_dataset(pages)
    fast = (webgraph.bowtie(links).to_pandas()
            .sort_values("node").reset_index(drop=True))
    slow = (webgraph.bowtie(links, driver_limit=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    assert set(fast["part"]) >= {"core", "other"}
    pd.testing.assert_frame_equal(fast, slow)


def test_webgraph_ops_invariant_under_repartition(ray_session):
    """The web-graph products are pure functions of the link SET:
    re-blocking the pages input must not change any result (the
    partition-invariance claim every scale-shape docstring makes)."""
    import pandas as pd

    pages = webtext.pages_dataset(250)
    shuffled = pages.repartition(7)

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns),
                              kind="mergesort").reset_index(drop=True)

    for op in (lambda p: webgraph.link_rank(webgraph.links_dataset(p)),
               lambda p: webgraph.hits_rank(webgraph.links_dataset(p)),
               lambda p: webgraph.degree_histogram(
                   webgraph.links_dataset(p)),
               lambda p: webgraph.anchor_summary(
                   webgraph.links_dataset(p)),
               lambda p: webgraph.bowtie(webgraph.links_dataset(p)),
               lambda p: webgraph.cocitation(webgraph.links_dataset(p),
                                             k=50)):
        a, b = canon(op(pages)), canon(op(shuffled))
        pd.testing.assert_frame_equal(a, b)


def test_salsa_hand_graph(ray_session):
    import ray.data as rd

    # s1 -> {a, b}; s2 -> {a, b}; s3 -> {c}
    # authority graph: component {a, b} (co-cited), singleton {c}
    # din: a=2, b=2, c=1; V_a = 3
    # salsa(a) = (2/3)*(2/4) = 1/3; salsa(b) = 1/3
    # salsa(c) = (1/3)*(1/1) = 1/3
    pre = webtext.URL_PREFIX
    links = rd.from_arrow(pa.table({
        "src": [f"{pre}s1", f"{pre}s1", f"{pre}s2", f"{pre}s2",
                f"{pre}s3"],
        "dst": [f"{pre}a", f"{pre}b", f"{pre}a", f"{pre}b", f"{pre}c"],
        "anchor": ["x"] * 5}))
    out = webgraph.salsa_authorities(links).to_pandas().set_index("node")
    for n in ("a", "b", "c"):
        assert abs(out.loc[f"{pre}{n}", "salsa"] - 0.333333) < 1e-9, n
