"""Web link-graph products derived from the crawl's raw html.

Common Crawl's flagship derived datasets are exactly these: the
hyperlink web graph, the anchor-text index, and link-based ranks
(cc-webgraph / Harmonic & PageRank releases).  The reference engine
has no web-graph notion (its graph is the flu KG); these stages
generalize its graph machinery (graphalgo.pagerank, the one-sort
group-concat of adjacency_export) to the crawl's own link structure.

Scale shape:
- link extraction is a stateless flat map over zero-copy Arrow
  batches (stages/extract.extract_links_batch — one C-level regex
  scan per batch);
- the anchor-text index is ONE dst-keyed range sort followed by a
  block-local vectorized group-concat (equal keys co-locate after a
  range sort — the repo's pinned invariant), so the corpus text never
  shuffles, only slim (dst, src, anchor) rows;
- link rank distincts the internal edge list (slim 2-column rows)
  and reuses graphalgo.pagerank_edges, which is stats-gated between
  a driver power iteration (small graphs) and the distributed
  broadcast-join/combine-sum loop (the 100-TB path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from octoray.sources.webtext import URL_PREFIX
from octoray.stages.extract import extract_links_batch, sql_extract_links

from octoray.plan import colocated_sort

from octoray import plan

__all__ = ["links_dataset", "anchor_summary", "internal_edges",
           "link_rank", "hits_rank", "frontier_urls", "degree_histogram",
           "reciprocity", "bowtie", "sql_extract_links",
           "sql_anchor_summary", "sql_internal_edges",
           "sql_frontier_urls", "sql_degree_histogram",
           "sql_reciprocity", "sql_bowtie", "host_graph",
           "sql_host_graph", "anchor_names", "sql_anchor_names",
           "cocitation", "sql_cocitation", "salsa_authorities",
           "sql_salsa", "salsa_hubs", "sql_salsa_hubs"]


def links_dataset(pages):
    """(src, dst, anchor) hyperlinks from a pages dataset."""
    return pages.select_columns(["url", "html"]).map_batches(
        extract_links_batch, batch_format="pyarrow")


def anchor_summary(links):
    """Anchor-text index: per link target, the in-link count, the
    number of distinct linking pages, and the '+'-joined
    sorted-distinct anchor texts (the shape entity-naming /
    query-expansion consumers read; Common Crawl publishes this as
    its columnar anchor index).

    ONE dst range sort + block-local pandas aggregation; counts are
    over ALL in-links, anchors over the distinct set."""

    def concat_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({"dst": pd.Series([], dtype=object),
                                 "n_inlinks": pd.Series([], dtype="int64"),
                                 "n_src": pd.Series([], dtype="int64"),
                                 "anchors": pd.Series([], dtype=object)})
        df = df.sort_values(["dst", "anchor"], kind="mergesort")
        g = df.groupby("dst", sort=False)
        out = pd.DataFrame({
            "n_inlinks": g.size().astype(np.int64),
            "n_src": g["src"].nunique().astype(np.int64),
        })
        ded = df.drop_duplicates(["dst", "anchor"])
        out["anchors"] = ded.groupby("dst", sort=False)["anchor"].agg("+".join)
        return out.reset_index()

    return colocated_sort(links, ["dst"]).map_batches(
        concat_block, batch_format="pandas", batch_size=None)


def internal_edges(links):
    """Distinct (src, dst) pairs whose target is inside the crawl's
    own url space — the page-level web graph."""
    import pyarrow.compute as pc

    from octoray.query import distinct_values

    def f(t: pa.Table) -> pa.Table:
        keep = pc.starts_with(t.column("dst"), URL_PREFIX)
        return t.select(["src", "dst"]).filter(keep)

    return distinct_values(
        links.map_batches(f, batch_format="pyarrow"), ["src", "dst"])


def link_rank(links, *, damping: float = 0.85, n_iters: int = 5,
              driver_limit: int = plan.WEB_DRIVER_EDGES):
    """PageRank over the internal page-level link graph (the
    cc-webgraph rank release, page granularity).  Hub-skewed
    in-degree (the synthesis plants 64 super-hub targets) exercises
    the hot-key path the north rule names."""
    from octoray.stages.graphalgo import pagerank_edges

    return pagerank_edges(internal_edges(links), damping=damping,
                          n_iters=n_iters, driver_limit=driver_limit)


def harmonic_rank(links, *, n_sources: int = 12, max_hops: int = 4,
                  driver_limit: int = plan.WEB_DRIVER_EDGES):
    """Sampled harmonic centrality over the internal link graph —
    cc-webgraph's harmonic-rank release at page granularity."""
    from octoray.stages.graphalgo import harmonic_centrality

    return harmonic_centrality(internal_edges(links), n_sources=n_sources,
                               max_hops=max_hops, driver_limit=driver_limit)


def hits_rank(links, *, n_iters: int = 5, driver_limit: int = plan.WEB_DRIVER_EDGES):
    """HITS hubs & authorities over the internal page-level link
    graph — the mutually-recursive companion to link_rank/
    harmonic_rank in the web-graph rank family (directory pages score
    as hubs, the planted super-hub targets as authorities)."""
    from octoray.stages.graphalgo import hits_edges

    return hits_edges(internal_edges(links), n_iters=n_iters,
                      driver_limit=driver_limit)


def sql_anchor_summary(links_src: str) -> str:
    """DuckDB twin of anchor_summary over the same link rows."""
    return f"""
        SELECT dst,
               count(*) AS n_inlinks,
               count(DISTINCT src) AS n_src,
               string_agg(DISTINCT anchor, '+' ORDER BY anchor) AS anchors
        FROM ({links_src})
        GROUP BY dst
    """


def sql_internal_edges(links_src: str) -> str:
    return (f"SELECT DISTINCT src, dst FROM ({links_src}) "
            f"WHERE dst LIKE '{URL_PREFIX}%'")


def frontier_urls(links, pages, *, broadcast_limit: int = plan.BROADCAST_ROWS):
    """Discovered-but-uncrawled internal urls with their in-link
    weight — the seed list for the next crawl wave (every crawler's
    frontier-expansion product; the synthesis's LINK_UNIVERSE is
    deliberately larger than any test crawl, so the frontier is
    non-trivial at every scale, exactly like a partial crawl).

    Scale shape: two slim combine-counts over the internal edge list
    (n_inlinks over all links, n_src over the distinct pair set), one
    node-sized hash join, then the stats-gated anti-join against the
    crawled url set (broadcast below the limit, distributed J8 above
    — a 100-TB crawl's url set is itself corpus-scale)."""
    import pyarrow.compute as pc

    from octoray.query import (distinct_values, hash_join,
                               semi_join_auto, sorted_groupby_count)

    def f(t: pa.Table) -> pa.Table:
        keep = pc.starts_with(t.column("dst"), URL_PREFIX)
        return t.select(["src", "dst"]).filter(keep)

    internal = links.map_batches(f, batch_format="pyarrow")
    n_in = sorted_groupby_count(internal.select_columns(["dst"]), ["dst"],
                                alias="n_inlinks")
    n_src = sorted_groupby_count(distinct_values(internal, ["src", "dst"]),
                                 ["dst"], alias="n_src")
    counts = hash_join(n_in, n_src, on="dst")
    out = semi_join_auto(counts, "dst", pages.select_columns(["url"]),
                         key_col="url", anti=True,
                         broadcast_limit=broadcast_limit)
    return out.map_batches(
        lambda t: pa.table({"url": t.column("dst"),
                            "n_inlinks": t.column("n_inlinks"),
                            "n_src": t.column("n_src")}),
        batch_format="pyarrow")


def degree_histogram(links):
    """(direction, degree, n_nodes) in/out-degree distribution of the
    internal link graph — the first sanity product of every webgraph
    release (the power-law shape check).  Two chained slim
    combine-counts per direction; nothing wider than (degree) ever
    shuffles."""
    from octoray.query import sorted_groupby_count

    e = internal_edges(links)

    def hist(col: str, tag: str):
        deg = sorted_groupby_count(e.select_columns([col]), [col],
                                   alias="degree")
        h = sorted_groupby_count(deg.select_columns(["degree"]), ["degree"],
                                 alias="n_nodes")
        return h.map_batches(
            lambda t: pa.table({
                "direction": pa.array([tag] * t.num_rows, pa.string()),
                "degree": t.column("degree"),
                "n_nodes": t.column("n_nodes")}),
            batch_format="pyarrow")

    return hist("src", "out").union(hist("dst", "in"))


def reciprocity(links):
    """One-row link-reciprocity summary of the internal graph
    (self-loops excluded, the standard convention): n_edges, n_recip
    (edges whose reverse also exists), reciprocity ratio rounded
    half-up to 6 decimals.  The reciprocal set is a self-semi-join of
    the slim edge list on the swapped composite key — stats-gated
    broadcast below the limit, distributed hash join above."""
    import pyarrow.compute as pc
    import ray.data as rd

    from octoray.query import semi_join_auto
    from octoray.util import round_half_up_scalar

    def no_self(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("src"), t.column("dst")))
        # sort blocks arrive as large_string; the separator scalar must
        # share the type or the kernel has no matching signature
        s = t.column("src").cast(pa.string())
        d = t.column("dst").cast(pa.string())
        k = pc.binary_join_element_wise(s, d, "\x1f")
        rk = pc.binary_join_element_wise(d, s, "\x1f")
        return t.append_column("k", k).append_column("rk", rk)

    e = internal_edges(links).map_batches(
        no_self, batch_format="pyarrow").materialize()
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "n_edges": pa.array([0], pa.int64()),
            "n_recip": pa.array([0], pa.int64()),
            "reciprocity": pa.array([0.0], pa.float64())}))
    n_recip = semi_join_auto(e.select_columns(["k"]), "k",
                             e.select_columns(["rk"]), key_col="rk").count()
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_recip": pa.array([n_recip], pa.int64()),
        "reciprocity": pa.array(
            [round_half_up_scalar(n_recip / n_edges, 6)], pa.float64())}))


def sql_frontier_urls(links_src: str, pages_src: str) -> str:
    """DuckDB twin of frontier_urls (counts over ALL internal links,
    distinct-src counts, crawled urls anti-joined out)."""
    return f"""
        SELECT dst AS url, count(*) AS n_inlinks,
               count(DISTINCT src) AS n_src
        FROM ({links_src})
        WHERE dst LIKE '{URL_PREFIX}%'
          AND dst NOT IN (SELECT url FROM ({pages_src}))
        GROUP BY dst
    """


def sql_degree_histogram(links_src: str) -> str:
    return f"""
        WITH e AS (SELECT DISTINCT src, dst FROM ({links_src})
                   WHERE dst LIKE '{URL_PREFIX}%'),
        od AS (SELECT src, count(*) AS degree FROM e GROUP BY 1),
        id AS (SELECT dst, count(*) AS degree FROM e GROUP BY 1)
        SELECT 'out' AS direction, degree, count(*) AS n_nodes
        FROM od GROUP BY degree
        UNION ALL
        SELECT 'in' AS direction, degree, count(*) AS n_nodes
        FROM id GROUP BY degree
    """


def sql_reciprocity(links_src: str) -> str:
    return f"""
        WITH e AS (SELECT DISTINCT src, dst FROM ({links_src})
                   WHERE dst LIKE '{URL_PREFIX}%' AND src <> dst),
        r AS (SELECT count(*) AS c FROM e
              JOIN e e2 ON e.src = e2.dst AND e.dst = e2.src),
        n AS (SELECT count(*) AS c FROM e)
        SELECT CAST(n.c AS BIGINT) AS n_edges,
               CAST(r.c AS BIGINT) AS n_recip,
               floor(r.c * 1.0 / n.c * 1000000 + 0.5) / 1000000
                 AS reciprocity
        FROM n, r
    """


def _reach_driver(rows, pivot: str, key: str, other: str):
    """Dict-adjacency BFS to fixpoint (driver fast path)."""
    adj: dict = {}
    for r in rows:
        adj.setdefault(r[key], []).append(r[other])
    seen = {pivot}
    frontier = [pivot]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    nxt.append(v)
        frontier = nxt
    return seen


def _reach_distributed(edges, pivot: str, key: str, other: str, *,
                       broadcast_limit: int, max_rounds: int):
    """Frontier-expansion BFS to fixpoint over a materialized edge
    Dataset (hop_distances' loop, directed and uncapped): each round
    broadcasts the CURRENT frontier (one hop's reach, never the
    visited set), expands with one streaming semi-join over the edge
    list, subtracts visited with the stats-gated anti-join.  Rounds =
    graph diameter (web graphs: ~tens), bounded by ``max_rounds``."""
    import ray.data as rd

    from octoray.query import distinct_values, semi_join_auto

    visited = rd.from_arrow(pa.table({
        "node": pa.array([pivot], pa.string())})).materialize()
    frontier = visited
    for _ in range(max_rounds):
        reached = distinct_values(
            semi_join_auto(edges, key, frontier, key_col="node",
                           broadcast_limit=broadcast_limit)
            .map_batches(lambda t, _o=other: t.select([_o])
                         .rename_columns(["node"]),
                         batch_format="pyarrow"),
            ["node"])
        frontier = semi_join_auto(reached, "node", visited, key_col="node",
                                  anti=True,
                                  broadcast_limit=broadcast_limit
                                  ).materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).materialize()
    return visited


def bowtie(links, *, driver_limit: int = plan.WEB_DRIVER_EDGES,
           broadcast_limit: int = plan.BROADCAST_ROWS, max_rounds: int = 64):
    """Bow-tie decomposition of the internal link graph [Broder et
    al. 2000, "Graph structure in the web"]: every node labeled
    core / in / out / other relative to the component of a
    deterministic pivot (the max-in-degree node, ties to the
    lexicographically smallest url — the same rule the SQL twin
    runs).  core = reaches the pivot AND is reachable from it;
    in = reaches it only; out = reachable only; other = neither
    (tendrils + disconnected).

    Scale shape: pivot via per-block partial top-1 over the slim
    in-degree table (driver sees one row per block); two
    frontier-broadcast BFS fixpoints (forward / backward — per-round
    exchange bounded by one hop's adjacency); classification is two
    node-sized left joins.  Below ``driver_limit`` edges the whole
    thing folds into one collected BFS pass, pinned equal in pytest."""
    import pyarrow.compute as pc
    import ray.data as rd

    from octoray.query import hash_join, sorted_groupby_count

    e = internal_edges(links).materialize()
    if e.count() == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "part": pa.array([], pa.string())}))

    from octoray.query import semi_join_auto

    # pivot candidates need >=1 outlink, else the forward closure is
    # {pivot} and the decomposition degenerates (the synthesis's top
    # in-degree hub happens to be a no-outlink page)
    ind = semi_join_auto(
        sorted_groupby_count(e.select_columns(["dst"]), ["dst"], alias="c"),
        "dst", e.select_columns(["src"]), key_col="src",
        broadcast_limit=broadcast_limit)

    def block_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"dst": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        mx = pc.max(t.column("c")).as_py()
        sub = t.filter(pc.equal(t.column("c"), mx))
        return pa.table({"dst": pa.array(
            [pc.min(sub.column("dst")).as_py()], pa.string()),
            "c": pa.array([mx], pa.int64())})

    cands = ind.map_batches(block_top, batch_format="pyarrow").take_all()
    if not cands:
        # no node has both an in- and an out-link: no pivot, so both
        # closures are empty and everything is 'other' (the SQL twin's
        # empty-piv behavior)
        def all_other(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column("node"),
                             "part": pa.array(["other"] * t.num_rows,
                                              pa.string())})

        from octoray.query import distinct_values as _dv

        def _both(t: pa.Table) -> pa.Table:
            return pa.table({"node": pa.concat_arrays(
                [t.column("src").combine_chunks().cast(pa.string()),
                 t.column("dst").combine_chunks().cast(pa.string())])})

        return _dv(e.map_batches(_both, batch_format="pyarrow"),
                   ["node"]).map_batches(all_other, batch_format="pyarrow")
    pivot = sorted(cands, key=lambda r: (-r["c"], r["dst"]))[0]["dst"]

    def classify(nodes_iter, fset, bset):
        nodes = []
        parts = []
        for n in nodes_iter:
            f, b = n in fset, n in bset
            nodes.append(n)
            parts.append("core" if f and b else
                         "in" if b else "out" if f else "other")
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "part": pa.array(parts, pa.string())}))

    if e.count() <= driver_limit:
        rows = e.take_all()
        fset = _reach_driver(rows, pivot, "src", "dst")
        bset = _reach_driver(rows, pivot, "dst", "src")
        allnodes = sorted({r["src"] for r in rows}
                          | {r["dst"] for r in rows})
        return classify(allnodes, fset, bset)

    from octoray.query import distinct_values

    def both(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("src").combine_chunks().cast(pa.string()),
             t.column("dst").combine_chunks().cast(pa.string())])})

    nodes = distinct_values(e.map_batches(both, batch_format="pyarrow"),
                            ["node"])
    fwd = _reach_distributed(e, pivot, "src", "dst",
                             broadcast_limit=broadcast_limit,
                             max_rounds=max_rounds)
    bwd = _reach_distributed(e, pivot, "dst", "src",
                             broadcast_limit=broadcast_limit,
                             max_rounds=max_rounds)

    def mark(ds, col):
        return ds.map_batches(
            lambda t, _c=col: t.append_column(
                _c, pa.array([True] * t.num_rows, pa.bool_())),
            batch_format="pyarrow")

    j = hash_join(hash_join(nodes, mark(fwd, "fh"), on="node",
                            how="left_outer"),
                  mark(bwd, "bh"), on="node", how="left_outer")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        f = df["fh"].fillna(False).astype(bool)
        b = df["bh"].fillna(False).astype(bool)
        part = np.where(f & b, "core",
                        np.where(b, "in", np.where(f, "out", "other")))
        return pd.DataFrame({"node": df["node"], "part": part})

    return j.map_batches(finish, batch_format="pandas")


def sql_bowtie(links_src: str) -> str:
    """DuckDB twin of bowtie: same pivot rule, recursive-CTE forward/
    backward closures, same labels.

    The two closures live in SEPARATE nested WITH RECURSIVE scopes:
    DuckDB 1.0 mis-evaluates two recursive CTEs declared in one
    top-level scope alongside non-recursive siblings (observed: the
    forward closure silently became the pivot's in-edge list and the
    final join fanned out 3546 nodes -> 5934 rows)."""
    return f"""
        WITH
        e AS (SELECT DISTINCT src, dst FROM ({links_src})
              WHERE dst LIKE '{URL_PREFIX}%'),
        piv AS (SELECT dst AS node FROM
                  (SELECT dst, count(*) AS c FROM e GROUP BY 1)
                WHERE dst IN (SELECT src FROM e)
                ORDER BY c DESC, dst LIMIT 1),
        fr AS (WITH RECURSIVE f(node) AS
                 (SELECT node FROM piv
                  UNION
                  SELECT e.dst FROM f JOIN e ON e.src = f.node)
               SELECT node FROM f),
        br AS (WITH RECURSIVE b(node) AS
                 (SELECT node FROM piv
                  UNION
                  SELECT e.src FROM b JOIN e ON e.dst = b.node)
               SELECT node FROM b),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
        SELECT n.node,
               CASE WHEN fm.node IS NOT NULL AND bm.node IS NOT NULL
                      THEN 'core'
                    WHEN bm.node IS NOT NULL THEN 'in'
                    WHEN fm.node IS NOT NULL THEN 'out'
                    ELSE 'other' END AS part
        FROM nodes n
        LEFT JOIN fr fm ON n.node = fm.node
        LEFT JOIN br bm ON n.node = bm.node
    """


_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)"


def host_graph(links):
    """Host-level collapse of the hyperlink graph: (src_host,
    dst_host, n_links) over ALL links, internal and external — the
    granularity cc-webgraph actually releases first (page graphs are
    derived; host/domain graphs are the headline product).  One
    C-level regex extraction per batch + a partial-combine count;
    the host-pair key space is tiny, so nothing heavy shuffles."""
    import pyarrow.compute as pc

    from octoray.query import sorted_groupby_count

    def hosts(t: pa.Table) -> pa.Table:
        def h(col):
            return pc.struct_field(
                pc.extract_regex(t.column(col).cast(pa.string()),
                                 _HOST_RE.replace("([^/]+)",
                                                  "(?P<host>[^/]+)")),
                "host")

        return pa.table({"src_host": h("src"), "dst_host": h("dst")})

    pairs = links.map_batches(hosts, batch_format="pyarrow")
    return sorted_groupby_count(pairs, ["src_host", "dst_host"],
                                alias="n_links")


def sql_host_graph(links_src: str) -> str:
    return f"""
        SELECT regexp_extract(src, '{_HOST_RE}', 1) AS src_host,
               regexp_extract(dst, '{_HOST_RE}', 1) AS dst_host,
               count(*) AS n_links
        FROM ({links_src})
        GROUP BY 1, 2
    """


def anchor_names(links, *, k: int = 1):
    """Canonical name per link target: the top-k anchor texts by
    in-link frequency (ties to the lexicographically smallest anchor)
    — the entity-naming signal search and KG pipelines mine from
    anchor text (the argmax view of anchor_summary's full index).
    Output: (dst, anchor, n_links).

    Scale shape: map-side (dst, anchor) partial counts, one slim
    combine, then grouped_top_k's partial-head + one group sort."""
    from octoray.query import grouped_top_k, sorted_groupby_count

    counts = sorted_groupby_count(links.select_columns(["dst", "anchor"]),
                                  ["dst", "anchor"], alias="n_links")
    return grouped_top_k(counts, ["dst"], "n_links", k,
                         tie_cols=["anchor"], descending=True)


def sql_anchor_names(links_src: str, *, k: int = 1) -> str:
    return f"""
        WITH c AS (SELECT dst, anchor, count(*) AS n_links
                   FROM ({links_src}) GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER
                (PARTITION BY dst ORDER BY n_links DESC, anchor) AS rn
              FROM c)
        SELECT dst, anchor, n_links FROM r WHERE rn <= {int(k)}
    """


def cocitation(links, *, k: int = 100, max_out: int = 64):
    """Top-k co-cited page pairs: pages that share a citing page
    (SALSA/'related pages' signal — two urls frequently linked from
    the same documents are topically related).  Output
    (url_a, url_b, n_cociting) with a < b canonical and the k cut
    deterministic (count desc, then url pair asc).

    Scale shape: within-group pair expansion per citing page via the
    shared wedge kernel, hub-capped at ``max_out`` outlinks (cap
    mirrored in the SQL twin so equality stays exact — the
    neighborhood_similarity convention); map-side partial pair counts
    before ONE slim combine; the final cut is a sort+limit over the
    counts table."""
    import pyarrow.compute as pc

    from octoray.query import sorted_groupby_count
    from octoray.stages.graphalgo import _within_group_pairs

    e = internal_edges(links)

    def pairs_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        df = df.sort_values(["src", "dst"], kind="mergesort")
        srcs, counts = np.unique(df["src"].to_numpy(), return_counts=True)
        keep = counts <= max_out
        if not keep.all():
            ok = set(srcs[keep])
            df = df[df["src"].isin(ok)]
            srcs, counts = np.unique(df["src"].to_numpy(),
                                     return_counts=True)
        a, b = _within_group_pairs(counts, df["dst"].to_numpy())
        return pd.DataFrame({"a": a, "b": b})

    pairs = colocated_sort(e, ["src"]).map_batches(pairs_block,
                                        batch_format="pandas",
                                        batch_size=None)
    counts = sorted_groupby_count(pairs, ["a", "b"], alias="n_cociting")
    cut = counts.sort(["n_cociting", "a", "b"],
                      descending=[True, False, False]).limit(k)
    return cut.map_batches(
        lambda t: pa.table({"url_a": t.column("a"),
                            "url_b": t.column("b"),
                            "n_cociting": t.column("n_cociting")}),
        batch_format="pyarrow")


def sql_cocitation(links_src: str, *, k: int = 100,
                   max_out: int = 64) -> str:
    return f"""
        WITH e AS (SELECT DISTINCT src, dst FROM ({links_src})
                   WHERE dst LIKE '{URL_PREFIX}%'),
        ok AS (SELECT src FROM e GROUP BY src
               HAVING count(*) <= {int(max_out)}),
        p AS (SELECT e1.dst AS a, e2.dst AS b
              FROM e e1 JOIN e e2
                ON e1.src = e2.src AND e1.dst < e2.dst
              WHERE e1.src IN (SELECT src FROM ok)),
        c AS (SELECT a, b, count(*) AS n FROM p GROUP BY 1, 2)
        SELECT a AS url_a, b AS url_b, n AS n_cociting FROM c
        ORDER BY n DESC, a, b LIMIT {int(k)}
    """


def salsa_authorities(links, *, max_out: int = 64,
                      broadcast_limit: int = plan.BROADCAST_ROWS):
    """SALSA authority scores [Lempel & Moran 2000] — the stochastic
    sibling of HITS whose stationary distribution has a CLOSED FORM
    (no power iteration): within each connected component C of the
    co-citation (authority-side) graph,
      salsa(p) = (|C| / |V_a|) * (d_in(p) / Σ_{q in C} d_in(q)),
    where V_a = all link targets.  Output (node, salsa) rounded
    half-up to 6 decimals; both engines evaluate the identical
    (csize/va)*(din/cdin) operand order so IEEE rounding agrees.

    Scale shape: in-degree = one slim combine count; co-citation
    pairs via the hub-capped wedge expansion (cap mirrored in the
    twin); components via the stats-gated dedup connectivity
    (driver union-find / distributed min-label propagation);
    singleton authorities (never co-cited) are their own component
    via a left join; two slim component-keyed aggregates finish."""
    import pyarrow.compute as pc

    from octoray.query import (distinct_values, hash_join,
                               sorted_groupby_count, sorted_groupby_sum)
    from octoray.stages.dedup import dup_components
    from octoray.stages.graphalgo import _within_group_pairs

    e = internal_edges(links).materialize()
    din = sorted_groupby_count(e.select_columns(["dst"]), ["dst"],
                               alias="din").materialize()
    va = din.count()
    if va == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "salsa": pa.array([], pa.float64())}))

    def pairs_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        df = df.sort_values(["src", "dst"], kind="mergesort")
        srcs, counts = np.unique(df["src"].to_numpy(), return_counts=True)
        keep = counts <= max_out
        if not keep.all():
            ok = set(srcs[keep])
            df = df[df["src"].isin(ok)]
            srcs, counts = np.unique(df["src"].to_numpy(),
                                     return_counts=True)
        a, b = _within_group_pairs(counts, df["dst"].to_numpy())
        return pd.DataFrame({"id_a": a, "id_b": b})

    pairs = distinct_values(
        colocated_sort(e, ["src"]).map_batches(pairs_block, batch_format="pandas",
                                    batch_size=None),
        ["id_a", "id_b"])
    comp = dup_components(pairs)

    cf = hash_join(din, comp.map_batches(
        lambda t: pa.table({"dst": t.column("id"),
                            "component": t.column("component")}),
        batch_format="pyarrow"), on="dst", how="left_outer")

    def fill(t: pa.Table) -> pa.Table:
        compc = pc.coalesce(t.column("component").cast(pa.string()),
                            t.column("dst").cast(pa.string()))
        return pa.table({"node": t.column("dst"), "component": compc,
                         "din": t.column("din")})

    cf = cf.map_batches(fill, batch_format="pyarrow").materialize()
    csize = sorted_groupby_count(cf.select_columns(["component"]),
                                 ["component"], alias="csize")
    cdin = sorted_groupby_sum(cf.select_columns(["component", "din"]),
                              ["component"], "din", alias="cdin")
    cstats = hash_join(csize, cdin, on="component")
    j = hash_join(cf, cstats, on="component")

    def score(df: "pd.DataFrame") -> "pd.DataFrame":
        from octoray.util import round_half_up_scalar

        v = ((df["csize"] * 1.0 / va) * (df["din"] * 1.0 / df["cdin"]))
        return pd.DataFrame({
            "node": df["node"],
            "salsa": [round_half_up_scalar(x, 6) for x in v]})

    return j.map_batches(score, batch_format="pandas")


def sql_salsa(links_src: str, *, max_out: int = 64) -> str:
    """DuckDB twin of salsa_authorities (recursive-closure
    components, identical operand order)."""
    return f"""
        WITH RECURSIVE
        e AS (SELECT DISTINCT src, dst FROM ({links_src})
              WHERE dst LIKE '{URL_PREFIX}%'),
        ok AS (SELECT src FROM e GROUP BY src
               HAVING count(*) <= {int(max_out)}),
        pr AS (SELECT DISTINCT e1.dst AS id_a, e2.dst AS id_b
               FROM e e1 JOIN e e2
                 ON e1.src = e2.src AND e1.dst < e2.dst
               WHERE e1.src IN (SELECT src FROM ok)),
        se AS (SELECT id_a AS s, id_b AS d FROM pr
               UNION SELECT id_b, id_a FROM pr),
        walk(id, comp) AS (
          SELECT s, s FROM se
          UNION
          SELECT se.d, walk.comp FROM walk JOIN se ON walk.id = se.s
          WHERE walk.comp < se.d),
        comp AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
        auth AS (SELECT dst AS node, count(*) AS din FROM e GROUP BY 1),
        cf AS (SELECT auth.node,
                      coalesce(c.component, auth.node) AS component,
                      auth.din
               FROM auth LEFT JOIN comp c ON auth.node = c.id),
        cs AS (SELECT component, count(*) AS csize, sum(din) AS cdin
               FROM cf GROUP BY 1),
        va AS (SELECT count(*) AS c FROM auth)
        SELECT cf.node,
               floor((cs.csize * 1.0 / va.c) * (cf.din * 1.0 / cs.cdin)
                     * 1000000 + 0.5) / 1000000 AS salsa
        FROM cf JOIN cs USING (component) CROSS JOIN va
    """


def salsa_hubs(links, *, max_in: int = 64,
               broadcast_limit: int = plan.BROADCAST_ROWS):
    """SALSA hub scores — the symmetric half of salsa_authorities:
    within each connected component C of the bibliographic-coupling
    graph (pages sharing a link TARGET),
      hub(p) = (|C| / |V_h|) * (d_out(p) / Σ_{q in C} d_out(q)),
    V_h = all pages with an outlink.  Coupling pairs come from the
    hub-capped wedge expansion over IN-neighbor lists (cap
    ``max_in`` mirrored in the twin: super-hub targets would
    otherwise fan out quadratically — the exact skew case the north
    rule names)."""
    import pyarrow.compute as pc

    import ray.data as rd

    from octoray.query import (distinct_values, hash_join,
                               sorted_groupby_count, sorted_groupby_sum)
    from octoray.stages.dedup import dup_components
    from octoray.stages.graphalgo import _within_group_pairs

    e = internal_edges(links).materialize()
    dout = sorted_groupby_count(e.select_columns(["src"]), ["src"],
                                alias="dout").materialize()
    vh = dout.count()
    if vh == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64())}))

    def pairs_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        df = df.sort_values(["dst", "src"], kind="mergesort")
        dsts, counts = np.unique(df["dst"].to_numpy(), return_counts=True)
        keep = counts <= max_in
        if not keep.all():
            ok = set(dsts[keep])
            df = df[df["dst"].isin(ok)]
            dsts, counts = np.unique(df["dst"].to_numpy(),
                                     return_counts=True)
        a, b = _within_group_pairs(counts, df["src"].to_numpy())
        return pd.DataFrame({"id_a": a, "id_b": b})

    pairs = distinct_values(
        colocated_sort(e, ["dst"]).map_batches(pairs_block, batch_format="pandas",
                                    batch_size=None),
        ["id_a", "id_b"])
    comp = dup_components(pairs)

    cf = hash_join(dout, comp.map_batches(
        lambda t: pa.table({"src": t.column("id"),
                            "component": t.column("component")}),
        batch_format="pyarrow"), on="src", how="left_outer")

    def fill(t: pa.Table) -> pa.Table:
        compc = pc.coalesce(t.column("component").cast(pa.string()),
                            t.column("src").cast(pa.string()))
        return pa.table({"node": t.column("src"), "component": compc,
                         "dout": t.column("dout")})

    cf = cf.map_batches(fill, batch_format="pyarrow").materialize()
    csize = sorted_groupby_count(cf.select_columns(["component"]),
                                 ["component"], alias="csize")
    cdout = sorted_groupby_sum(cf.select_columns(["component", "dout"]),
                               ["component"], "dout", alias="cdout")
    j = hash_join(cf, hash_join(csize, cdout, on="component"),
                  on="component")

    def score(df: "pd.DataFrame") -> "pd.DataFrame":
        from octoray.util import round_half_up_scalar

        v = ((df["csize"] * 1.0 / vh) * (df["dout"] * 1.0 / df["cdout"]))
        return pd.DataFrame({
            "node": df["node"],
            "hub": [round_half_up_scalar(x, 6) for x in v]})

    return j.map_batches(score, batch_format="pandas")


def sql_salsa_hubs(links_src: str, *, max_in: int = 64) -> str:
    return f"""
        WITH RECURSIVE
        e AS (SELECT DISTINCT src, dst FROM ({links_src})
              WHERE dst LIKE '{URL_PREFIX}%'),
        ok AS (SELECT dst FROM e GROUP BY dst
               HAVING count(*) <= {int(max_in)}),
        pr AS (SELECT DISTINCT e1.src AS id_a, e2.src AS id_b
               FROM e e1 JOIN e e2
                 ON e1.dst = e2.dst AND e1.src < e2.src
               WHERE e1.dst IN (SELECT dst FROM ok)),
        se AS (SELECT id_a AS s, id_b AS d FROM pr
               UNION SELECT id_b, id_a FROM pr),
        walk(id, comp) AS (
          SELECT s, s FROM se
          UNION
          SELECT se.d, walk.comp FROM walk JOIN se ON walk.id = se.s
          WHERE walk.comp < se.d),
        comp AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
        hub AS (SELECT src AS node, count(*) AS dout FROM e GROUP BY 1),
        cf AS (SELECT hub.node,
                      coalesce(c.component, hub.node) AS component,
                      hub.dout
               FROM hub LEFT JOIN comp c ON hub.node = c.id),
        cs AS (SELECT component, count(*) AS csize, sum(dout) AS cdout
               FROM cf GROUP BY 1),
        vh AS (SELECT count(*) AS c FROM hub)
        SELECT cf.node,
               floor((cs.csize * 1.0 / vh.c) * (cf.dout * 1.0 / cs.cdout)
                     * 1000000 + 0.5) / 1000000 AS hub
        FROM cf JOIN cs USING (component) CROSS JOIN vh
    """
