"""Iterative graph analytics over the triple store: PageRank.

Entity-importance ranking over the KG's uri->uri edges — the
canonical iterative join + aggregate workload (reference analogue:
octofludb has no ranking, but "which strains/clades are hubs" is the
first question its users ask of the graph; SURVEY §2.5 J1's skew
discussion is literally about these hub nodes).

Per iteration (the Pregel-shaped plan, one hash join + one small-row
combine sum):
  contrib = edges JOIN ranks ON src  ->  (dst, rank/out_degree)
  ranks'  = (1-d)/N + d * sum(contrib) per dst, 0 for no-inbound
The rank table is node-sized (far smaller than the corpus triples),
so hash_join's stats gate broadcasts it while it fits and falls back
to a merge join beyond that.  Simplified variant: dangling-node mass
is NOT redistributed (matches the SQL twin exactly).

Determinism: fixed iteration count, float64 throughout, final round
half-up to 6 decimals — cross-engine FP sum-order drift is ~1e-15,
far under the rounding grain.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from octoray.query import hash_join, sorted_groupby_count, sorted_groupby_sum
from octoray.util import round_half_up_scalar

from octoray.plan import colocated_sort

from octoray import plan

DT_URI = "uri"


def uri_edges(triples):
    """Distinct (src, dst) uri->uri edges from a deduped triple
    Dataset."""
    import pyarrow.compute as pc

    from octoray.query import distinct_values

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("object_datatype"),
                              pa.scalar(DT_URI)))
        return pa.table({"src": t.column("subject"),
                         "dst": t.column("object")})

    return distinct_values(triples.map_batches(f, batch_format="pyarrow"),
                           ["src", "dst"])


def pagerank(triples, *, damping: float = 0.85, n_iters: int = 5,
             driver_limit: int = plan.KCORE_DRIVER_EDGES):
    """(node, rank) over the uri->uri edge graph of ``triples``.

    Stats-gated two-path design (the dup_components pattern applied to
    ranking): the EDGE LIST is much smaller than the raw triple corpus
    (distinct uri->uri pairs), so when it fits (<= ``driver_limit``
    edges) a driver-side numpy power iteration answers with zero
    per-round pipeline executions; above the limit the distributed
    loop (broadcast join + combine sum per round) is the scale path.
    Both paths compute the identical float64 recurrence — equality is
    pinned in pytest."""
    return pagerank_edges(uri_edges(triples), damping=damping,
                          n_iters=n_iters, driver_limit=driver_limit)


def pagerank_edges(edges, *, damping: float = 0.85, n_iters: int = 5,
                   driver_limit: int = plan.KCORE_DRIVER_EDGES):
    """PageRank over an arbitrary DISTINCT (src, dst) edge dataset —
    the graph-agnostic core shared by the KG rank (pagerank) and the
    web link-graph rank (stages/webgraph.link_rank)."""
    edges = edges.materialize()

    if edges.count() <= driver_limit:
        return _pagerank_driver(edges, damping=damping, n_iters=n_iters)

    # node set = src ∪ dst (distinct of a 2-column stack)
    def both(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("src").combine_chunks().cast(pa.string()),
             t.column("dst").combine_chunks().cast(pa.string())])})

    from octoray.query import distinct_values

    nodes = distinct_values(edges.map_batches(both, batch_format="pyarrow"),
                            ["node"]).materialize()
    n = nodes.count()
    if n == 0:
        return nodes

    deg = sorted_groupby_count(edges.select_columns(["src"]), ["src"],
                               alias="deg")
    # edges with the source's out-degree attached (loop-invariant)
    edeg = hash_join(edges, deg, on="src").materialize()

    base = (1.0 - damping) / n
    ranks = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "rank": pa.array([1.0 / n] * t.num_rows,
                                             pa.float64())}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iters):
        r = ranks.map_batches(
            lambda t: t.rename_columns(["src", "rank"]),
            batch_format="pyarrow")
        contrib = hash_join(edeg, r, on="src").map_batches(
            lambda df: pd.DataFrame({
                "node": df["dst"], "c": df["rank"] / df["deg"]}),
            batch_format="pandas")
        summed = sorted_groupby_sum(contrib, ["node"], "c", alias="in_mass")
        joined = hash_join(nodes, summed, on="node", how="left_outer")

        def update(df: pd.DataFrame) -> pd.DataFrame:
            mass = df["in_mass"].fillna(0.0)
            return pd.DataFrame({"node": df["node"],
                                 "rank": base + damping * mass})

        ranks = joined.map_batches(update,
                                   batch_format="pandas").materialize()

    def finish(t: pa.Table) -> pa.Table:
        vals = [round_half_up_scalar(v, 6)
                for v in t.column("rank").to_pylist()]
        return pa.table({"node": t.column("node"),
                         "rank": pa.array(vals, pa.float64())})

    return ranks.map_batches(finish, batch_format="pyarrow")


def _pagerank_driver(edges, *, damping: float, n_iters: int):
    """Collected-edges numpy power iteration (the small-graph fast
    path).  Same recurrence as the distributed loop: rank0 = 1/N,
    rank' = (1-d)/N + d * sum(rank[src]/deg[src] over in-edges)."""
    import numpy as np
    import ray.data as rd

    rows = edges.take_all()
    if not rows:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64())}))
    src = [r["src"] for r in rows]
    dst = [r["dst"] for r in rows]
    names = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(names)}
    n = len(names)
    si = np.fromiter((idx[s] for s in src), np.int64, len(src))
    di = np.fromiter((idx[d] for d in dst), np.int64, len(dst))
    deg = np.bincount(si, minlength=n).astype(np.float64)
    base = (1.0 - damping) / n
    rank = np.full(n, 1.0 / n, np.float64)
    for _ in range(n_iters):
        mass = np.zeros(n, np.float64)
        np.add.at(mass, di, rank[si] / deg[si])
        rank = base + damping * mass
    return rd.from_arrow(pa.table({
        "node": pa.array(names, pa.string()),
        "rank": pa.array([round_half_up_scalar(v, 6) for v in rank],
                         pa.float64()),
    }))


def triangle_count(triples):
    """Global triangle count over the KG's undirected uri--uri graph —
    the second classic iterative-free graph analytic beside PageRank
    (clustering structure: how cliquish are the entity neighborhoods).

    Degree-oriented node-iterator (the distributed-friendly classic):
      1. canonical undirected edge set (min-id, max-id), self-loops
         dropped, distinct — two-phase distinct, slim rows
      2. per-node degree (map-side partial counts over the stacked
         endpoints)
      3. each edge oriented from its lower-(degree, id) endpoint: the
         out-degree of every node is then O(sqrt(m)), so the wedge
         fan-out is bounded even at hub nodes (no skew blow-up)
      4. wedges per source (one src-keyed sort + block-local pair
         expansion, jaccard-style np.triu) emitted in CANONICAL
         (min, max) form
      5. each wedge survives iff its closing edge exists: stats-gated
         broadcast semi-join against the edge set (merge-join fallback
         beyond the broadcast limit); every triangle is counted
         exactly once (by its lowest-(degree, id) corner)

    Returns a one-row (n_triangles) table."""
    import numpy as np
    import pyarrow.compute as pc

    from octoray.query import (
        combined_groupby_count,
        distinct_values,
        hash_join,
        merge_join,
    )

    edges = uri_edges(triples)

    def undirect(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t.column("src"), t.column("dst"))
        b = pc.max_element_wise(t.column("src"), t.column("dst"))
        tbl = pa.table({"a": a, "b": b})
        return tbl.filter(pc.not_equal(tbl.column("a"), tbl.column("b")))

    und = distinct_values(
        edges.map_batches(undirect, batch_format="pyarrow"), ["a", "b"]
    ).materialize()

    def stack(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("a").combine_chunks().cast(pa.string()),
             t.column("b").combine_chunks().cast(pa.string())])})

    deg = combined_groupby_count(
        und.map_batches(stack, batch_format="pyarrow"), ["node"], alias="deg")

    e1 = hash_join(und, deg.map_batches(
        lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"),
        on="a")
    e2 = hash_join(e1, deg.map_batches(
        lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"),
        on="b")

    def orient(t: pa.Table) -> pa.Table:
        da, db = t.column("da"), t.column("db")
        a, b = t.column("a"), t.column("b")
        lower = pc.or_(pc.less(da, db),
                       pc.and_(pc.equal(da, db), pc.less(a, b)))
        return pa.table({
            "src": pc.if_else(lower, a, b),
            "dst": pc.if_else(lower, b, a),
        })

    oriented = e2.map_batches(orient, batch_format="pyarrow")

    def wedges_block(df):
        import pandas as pd

        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        df = df.sort_values(["src", "dst"], kind="mergesort")
        _, counts = np.unique(df["src"].to_numpy(), return_counts=True)
        a, b = _within_group_pairs(counts, df["dst"].to_numpy())
        return pd.DataFrame({"a": a, "b": b})

    wedges = colocated_sort(oriented, ["src"]).map_batches(
        wedges_block, batch_format="pandas", batch_size=None)

    # closing-edge membership: broadcast the edge set when it fits
    n_edges = und.count()
    if n_edges <= plan.BROADCAST_ROWS:
        import ray

        eset = set()
        for blk in und.iter_batches(batch_format="pyarrow"):
            eset.update(zip(blk.column("a").to_pylist(),
                            blk.column("b").to_pylist()))
        ref = ray.put(frozenset(eset))

        def close_count(t: pa.Table) -> pa.Table:
            import ray as _ray

            es = _ray.get(ref)
            hits = sum((x, y) in es
                       for x, y in zip(t.column("a").to_pylist(),
                                       t.column("b").to_pylist()))
            return pa.table({"n": pa.array([hits], pa.int64())})

        partial = wedges.map_batches(close_count, batch_format="pyarrow")
        total = partial.sum("n") or 0
    else:
        marked = und.map_batches(
            lambda t: t.append_column(
                "_e", pa.array([1] * t.num_rows, pa.int8())),
            batch_format="pyarrow")
        joined = merge_join(wedges, marked, ["a", "b"], how="left_outer")
        total = joined.filter(
            lambda r: r["_e"] is not None).count()
    return pa.table({"n_triangles": pa.array([int(total)], pa.int64())})


def _within_group_pairs(group_sizes, values):
    """All within-group unordered pairs (i < j in stored order) over a
    group-contiguous value array — the vectorized wedge kernel shared
    by triangle counting and link prediction.  One pass per DISTINCT
    group size (bounded by the degree cap), each a single fancy-index
    + triu gather: no per-group Python loop."""
    import numpy as np

    group_sizes = np.asarray(group_sizes, np.int64)
    starts = np.r_[0, np.cumsum(group_sizes)[:-1]]
    out_a, out_b = [], []
    for m in np.unique(group_sizes):
        if m < 2:
            continue
        gs = starts[group_sizes == m]
        idx = gs[:, None] + np.arange(m)
        vals = values[idx]
        ia, ib = np.triu_indices(int(m), 1)
        out_a.append(vals[:, ia].ravel())
        out_b.append(vals[:, ib].ravel())
    if not out_a:
        e = np.array([], dtype=values.dtype)
        return e, e
    return np.concatenate(out_a), np.concatenate(out_b)


def _jaccard_driver(und, *, k: int, max_center_degree: int):
    """Collected-edges driver fast path (small-graph gate): identical
    wedge expansion, degree math and (jaccard desc, a, b) cut as the
    distributed plan — pinned equal in pytest."""
    import numpy as np
    import pandas as pd

    df = und.to_pandas()
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "common": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if not len(df):
        return empty
    stacked = pd.concat([
        df.rename(columns={"a": "node", "b": "nbr"}),
        df.rename(columns={"b": "node", "a": "nbr"})], ignore_index=True)
    stacked = stacked.sort_values(["node", "nbr"], kind="mergesort")
    nodes_s = stacked["node"].to_numpy()
    nbrs_s = stacked["nbr"].to_numpy()
    uniq, counts = np.unique(nodes_s, return_counts=True)
    deg = pd.Series(counts, index=uniq)
    ok = counts <= max_center_degree
    # keep only the allowed centers' contiguous runs
    keep = np.repeat(ok, counts)
    pa_, pb_ = _within_group_pairs(counts[ok], nbrs_s[keep])
    if not len(pa_):
        return empty
    pairs = pd.DataFrame({"a": pa_, "b": pb_})
    common = pairs.groupby(["a", "b"], sort=False).size().reset_index(
        name="common")
    eset = set(zip(df["a"], df["b"]))
    keep = [(x, y) not in eset for x, y in zip(common["a"], common["b"])]
    cand = common.loc[keep].copy()
    if not len(cand):
        return empty
    cn = cand["common"].to_numpy().astype(np.int64)
    un = (deg.reindex(cand["a"]).to_numpy().astype(np.int64)
          + deg.reindex(cand["b"]).to_numpy().astype(np.int64) - cn)
    cand["common"] = cn
    cand["jaccard"] = cn.astype(np.float64) / un.astype(np.float64)
    cand = cand.sort_values(["jaccard", "a", "b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k).reset_index(drop=True)
    return pa.Table.from_pandas(cand, preserve_index=False)


def neighborhood_similarity(triples, *, k: int = 100,
                            max_center_degree: int = 512,
                            broadcast_edge_limit: int = plan.BROADCAST_ROWS,
                            driver_limit: int = plan.GRAPH_DRIVER_EDGES):
    """Link prediction over the KG's undirected uri--uri graph: the
    top-k NON-adjacent node pairs by neighborhood Jaccard similarity
    |N(u) ∩ N(v)| / |N(u) ∪ N(v)| (common-neighbors machinery — the
    classic Liben-Nowell/Kleinberg predictor family), with the common
    count emitted alongside so Adamic-Adar-style reweighting composes
    downstream.

    Plan (all slim rows, one sort, no all-pairs anywhere):
      1. canonical undirected distinct edge set (a < b), self-loops
         dropped — same base as :func:`triangle_count`
      2. true per-node degrees (map-side partial counts over the
         stacked endpoints)
      3. wedge expansion per CENTER node: one node-keyed range sort
         co-locates each adjacency list (equal keys share a block —
         the pinned invariant), then block-local np.triu pair
         expansion.  Skew guard: centers with degree above
         ``max_center_degree`` emit no wedges (a hub everyone links
         to certifies nothing about pairwise similarity; the cap
         bounds per-center fan-out at max_center_degree^2/2 and is
         MIRRORED IN THE ORACLE, so equality stays exact) — the same
         stop-key discipline as jaccard_pairs' max_df
      4. common-neighbor counts per candidate pair: map-side partial
         count + one groupby exchange over (a, b)
      5. existing edges drop out: stats-gated broadcast membership
         filter (vectorized np.isin over joined keys) below
         ``broadcast_edge_limit``, merge-join anti fallback above
      6. degrees join in (node-sized table), jaccard = common /
         (deg_a + deg_b - common) in float64 — int64-sourced IEEE
         division, bit-identical to the SQL twin
      7. exact global top-k by (jaccard desc, a, b): per-block
         partial head-k prunes before ONE constant-key exchange —
         at most k rows per block move

    Below ``driver_limit`` edges the whole plan folds into one local
    pass (:func:`_jaccard_driver` — identical math and cut, pinned
    equal), the same stats-gate discipline as pagerank/kcore/walks.

    Returns a k-row (a, b, common, jaccard) Table; ties at the
    boundary are broken by (a, b) so membership is deterministic."""
    import numpy as np
    import pyarrow.compute as pc

    from octoray.query import (
        combined_groupby_count,
        distinct_values,
        hash_join,
        merge_join,
    )

    edges = uri_edges(triples)

    def undirect(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t.column("src"), t.column("dst"))
        b = pc.max_element_wise(t.column("src"), t.column("dst"))
        tbl = pa.table({"a": a, "b": b})
        return tbl.filter(pc.not_equal(tbl.column("a"), tbl.column("b")))

    und = distinct_values(
        edges.map_batches(undirect, batch_format="pyarrow"), ["a", "b"]
    ).materialize()
    if und.count() <= driver_limit:
        return _jaccard_driver(und, k=k,
                               max_center_degree=max_center_degree)

    def stack(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("a").combine_chunks().cast(pa.string()),
             t.column("b").combine_chunks().cast(pa.string())])})

    deg = combined_groupby_count(
        und.map_batches(stack, batch_format="pyarrow"),
        ["node"], alias="deg").materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks().cast(pa.string())
        b = t.column("b").combine_chunks().cast(pa.string())
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    nb = und.map_batches(both_dirs, batch_format="pyarrow")
    nb = hash_join(nb, deg, on="node")
    nb = nb.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("deg"),
                                         pa.scalar(max_center_degree)))
        .select(["node", "nbr"]),
        batch_format="pyarrow")

    def wedges_block(df):
        import pandas as pd

        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        df = df.sort_values(["node", "nbr"], kind="mergesort")
        _, counts = np.unique(df["node"].to_numpy(), return_counts=True)
        a, b = _within_group_pairs(counts, df["nbr"].to_numpy())
        return pd.DataFrame({"a": a, "b": b})

    wedges = colocated_sort(nb, ["node"]).map_batches(
        wedges_block, batch_format="pandas", batch_size=None)

    common = combined_groupby_count(wedges, ["a", "b"], alias="common")

    n_edges = und.count()
    if n_edges <= broadcast_edge_limit:
        import ray

        keys = []
        for blk in und.iter_batches(batch_format="pyarrow"):
            keys.append(pc.binary_join_element_wise(
                blk.column("a").cast(pa.string()),
                blk.column("b").cast(pa.string()), "\x1f").to_numpy(
                    zero_copy_only=False))
        ref = ray.put(np.sort(np.concatenate(keys)) if keys
                      else np.array([], dtype=object))

        def drop_edges(t: pa.Table) -> pa.Table:
            import ray as _ray

            eset = _ray.get(ref)
            ks = pc.binary_join_element_wise(
                t.column("a").cast(pa.string()),
                t.column("b").cast(pa.string()), "\x1f").to_numpy(
                    zero_copy_only=False)
            return t.filter(pa.array(~np.isin(ks, eset)))

        cand = common.map_batches(drop_edges, batch_format="pyarrow")
    else:
        marked = und.map_batches(
            lambda t: t.append_column(
                "_e", pa.array([1] * t.num_rows, pa.int8())),
            batch_format="pyarrow")
        joined = merge_join(common, marked, ["a", "b"], how="left_outer")
        cand = joined.map_batches(
            lambda t: t.filter(pc.is_null(t.column("_e")))
            .select(["a", "b", "common"]),
            batch_format="pyarrow")

    cand = hash_join(cand, deg.map_batches(
        lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"),
        on="a")
    cand = hash_join(cand, deg.map_batches(
        lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"),
        on="b")

    def score(t: pa.Table) -> pa.Table:
        c = t.column("common").combine_chunks().cast(pa.int64())
        da = t.column("da").combine_chunks().cast(pa.int64())
        db = t.column("db").combine_chunks().cast(pa.int64())
        cn = c.to_numpy(zero_copy_only=False).astype(np.int64)
        un = (da.to_numpy(zero_copy_only=False).astype(np.int64)
              + db.to_numpy(zero_copy_only=False).astype(np.int64) - cn)
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "common": c,
                         "jaccard": pa.array(cn.astype(np.float64)
                                             / un.astype(np.float64),
                                             pa.float64())})

    scored = cand.map_batches(score, batch_format="pyarrow")

    def head_k(df):
        if len(df) == 0:
            return df
        return df.sort_values(
            ["jaccard", "a", "b"], ascending=[False, True, True],
            kind="mergesort").head(k)

    parts = scored.map_batches(head_k, batch_format="pandas")
    final = parts.to_pandas()
    final = head_k(final).reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def adjacency_export(triples):
    """Materialize the KG's directed uri->uri graph as adjacency
    lists: (node, neighbors '+'-joined sorted-distinct, out_degree) —
    the hand-off shape GNN/embedding trainers consume (each row is one
    node's full neighborhood; partition by node range for resumable
    sharded output).  ONE src-keyed range sort co-locates each
    adjacency list (the pinned equal-keys-share-a-block invariant),
    then a block-local vectorized group-concat — the same plan and
    '+'-join convention as the subject pivot (query.pivot_subjects),
    so the SQL twin is a plain string_agg."""
    import numpy as np
    import pandas as pd

    edges = uri_edges(triples)

    def concat_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({"node": pd.Series([], dtype=object),
                                 "neighbors": pd.Series([], dtype=object),
                                 "out_degree": pd.Series([], dtype="int64")})
        df = df.sort_values(["src", "dst"], kind="mergesort")
        g = df.groupby("src", sort=False)["dst"]
        out = g.agg("+".join).reset_index()
        out.columns = ["node", "neighbors"]
        out["out_degree"] = g.size().to_numpy().astype(np.int64)
        return out

    return colocated_sort(edges, ["src"]).map_batches(
        concat_block, batch_format="pandas", batch_size=None)


def sql_adjacency_export(src: str) -> str:
    """DuckDB twin of :func:`adjacency_export` over a raw triple
    dump."""
    return f"""
        WITH raw AS (SELECT DISTINCT subject, object FROM {src}
                     WHERE object_datatype = 'uri'),
        e AS (SELECT subject AS node, object AS nbr FROM raw)
        SELECT node,
               string_agg(nbr, '+' ORDER BY nbr) AS neighbors,
               CAST(count(*) AS BIGINT) AS out_degree
        FROM e GROUP BY node
    """


def label_propagation(triples, *, n_rounds: int = 3):
    """Community detection by SYNCHRONOUS label propagation over the
    KG's undirected uri--uri graph (Raghavan et al. 2007, made
    deterministic): every node starts labeled by its own id; each
    round, every node adopts the most frequent label among its
    neighbors, ties broken by the LEXICALLY SMALLEST label.  Fixed
    ``n_rounds`` synchronous rounds — no order-dependence, no random
    tie coin, so the result is reproducible at any parallelism and a
    generated per-round CTE twin re-derives it exactly (the same
    determinism discipline as random_walks).

    Per round: one node-keyed hash join ships the label table (node-
    sized, never the corpus) onto the edge list, map-side partial
    counts collapse (node, label) pairs before ONE groupby exchange,
    and the majority cut is the exact grouped top-1 (partial head-k
    before a group-keyed range sort).  Returns (node, label) sorted
    by node."""
    import pyarrow.compute as pc

    from octoray.query import (
        combined_groupby_count,
        distinct_values,
        grouped_top_k,
        hash_join,
    )

    edges = uri_edges(triples)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("src").combine_chunks().cast(pa.string())
        b = t.column("dst").combine_chunks().cast(pa.string())
        tbl = pa.table({"node": pa.concat_arrays([a, b]),
                        "nbr": pa.concat_arrays([b, a])})
        return tbl.filter(pc.not_equal(tbl.column("node"),
                                       tbl.column("nbr")))

    nb = distinct_values(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        ["node", "nbr"]).materialize()

    labels = distinct_values(
        nb.map_batches(lambda t: t.select(["node"]),
                       batch_format="pyarrow"), ["node"]).map_batches(
        lambda t: t.append_column("lbl", t.column("node")),
        batch_format="pyarrow")

    for _ in range(n_rounds):
        j = hash_join(
            nb,
            labels.map_batches(lambda t: t.rename_columns(["nbr", "lbl"]),
                               batch_format="pyarrow"),
            on="nbr")
        cnt = combined_groupby_count(
            j.map_batches(lambda t: t.select(["node", "lbl"]),
                          batch_format="pyarrow"),
            ["node", "lbl"], alias="cnt")
        labels = grouped_top_k(cnt, ["node"], "cnt", 1,
                               tie_cols=["lbl"], descending=True
                               ).map_batches(
            lambda t: t.select(["node", "lbl"]),
            batch_format="pyarrow").materialize()

    return labels.map_batches(
        lambda t: t.rename_columns(["node", "label"]),
        batch_format="pyarrow").sort("node")


def sql_label_propagation(src: str, *, n_rounds: int = 3) -> str:
    """DuckDB twin of :func:`label_propagation` over a raw triple
    dump: one majority-vote CTE per synchronous round, identical
    (count DESC, label ASC) tie-break."""
    rounds = []
    prev = "l0"
    for r in range(1, n_rounds + 1):
        rounds.append(f"""
        c{r} AS (SELECT nb.node, l.lbl, count(*) AS cnt
                 FROM nb JOIN {prev} l ON nb.nbr = l.node
                 GROUP BY nb.node, l.lbl),
        l{r} AS (SELECT node, lbl FROM (
                   SELECT node, lbl, row_number() OVER (
                     PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
                   FROM c{r}) WHERE rn = 1)""")
        prev = f"l{r}"
    return f"""
        WITH raw AS (SELECT DISTINCT subject, object FROM {src}
                     WHERE object_datatype = 'uri' AND subject <> object),
        e AS (SELECT DISTINCT least(subject, object) AS a,
                     greatest(subject, object) AS b FROM raw),
        nb AS (SELECT a AS node, b AS nbr FROM e
               UNION SELECT b, a FROM e),
        l0 AS (SELECT DISTINCT node, node AS lbl FROM nb),
        {','.join(rounds)}
        SELECT node, lbl AS label FROM {prev}
    """


def sql_neighborhood_similarity(src: str, *, k: int = 100,
                                max_center_degree: int = 512) -> str:
    """DuckDB twin of :func:`neighborhood_similarity` over a raw triple
    dump: orientation-free wedge self-join with the identical center
    degree cap, NOT-EXISTS edge drop, identical int64->double jaccard."""
    return f"""
        WITH raw AS (SELECT DISTINCT subject, object FROM {src}
                     WHERE object_datatype = 'uri' AND subject <> object),
        e AS (SELECT DISTINCT least(subject, object) AS a,
                     greatest(subject, object) AS b FROM raw),
        nb AS (SELECT a AS node, b AS nbr FROM e
               UNION ALL SELECT b, a FROM e),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
                FROM nb GROUP BY node),
        ctr AS (SELECT nb.node, nb.nbr FROM nb JOIN deg USING (node)
                WHERE deg.d <= {max_center_degree}),
        w AS (SELECT n1.nbr AS a, n2.nbr AS b,
                     CAST(count(*) AS BIGINT) AS common
              FROM ctr n1 JOIN ctr n2
                ON n1.node = n2.node AND n1.nbr < n2.nbr
              GROUP BY n1.nbr, n2.nbr),
        cand AS (SELECT w.* FROM w
                 WHERE NOT EXISTS (SELECT 1 FROM e
                                   WHERE e.a = w.a AND e.b = w.b))
        SELECT c.a, c.b, c.common,
               CAST(c.common AS DOUBLE) / (da.d + db.d - c.common)
                   AS jaccard
        FROM cand c JOIN deg da ON da.node = c.a
                    JOIN deg db ON db.node = c.b
        ORDER BY jaccard DESC, c.a, c.b
        LIMIT {k}
    """


def kcore(triples, *, k: int = 2, n_iters: int = 32,
          driver_limit: int = plan.KCORE_DRIVER_EDGES, broadcast_limit: int = plan.BROADCAST_ROWS):
    """Nodes of the k-core of the KG's UNDIRECTED uri--uri graph: the
    maximal subgraph where every node keeps degree >= k.  Output: one
    ``node`` column, the classic peel fixpoint.

    Iteration count is CAPPED at ``n_iters`` on BOTH engine and oracle
    (the generated-CTE-chain trick the GD classifier pinned): the
    engine early-breaks at the true fixpoint, which is identical to
    running all n_iters rounds because peeling is idempotent once
    stable — so the two sides are equal by construction even if some
    pathological graph hasn't converged by the cap.

    Stats-gated two-path design (pagerank's): collected numpy peel
    under ``driver_limit`` edges; above it, each round is ONE
    degree count over the surviving subgraph (block pre-combined)
    plus two stats-gated semi-joins trimming the edge list — the edge
    list only shrinks, so per-round cost is monotone non-increasing.
    """
    import pyarrow.compute as pc

    import ray.data as rd

    from octoray.query import semi_join_auto

    base = uri_edges(triples)

    # undirected, self-loop-free: emit both directions, distinct
    def sym(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))
        s = t.column("src").combine_chunks().cast(pa.string())
        d = t.column("dst").combine_chunks().cast(pa.string())
        return pa.table({"src": pa.concat_arrays([s, d]),
                         "dst": pa.concat_arrays([d, s])})

    from octoray.query import distinct_values

    edges = distinct_values(base.map_batches(sym, batch_format="pyarrow"),
                            ["src", "dst"]).materialize()
    n_edges = edges.count()
    empty = rd.from_arrow(pa.table({"node": pa.array([], pa.string())}))
    if n_edges == 0:
        return empty

    if n_edges <= driver_limit:
        return _kcore_driver(edges, k=k, n_iters=n_iters)

    def degree(e):
        def pre(t: pa.Table) -> pa.Table:
            g = t.group_by(["src"], use_threads=False).aggregate(
                [([], "count_all")])
            return g.rename_columns(["src", "c"])

        from octoray.query import sorted_groupby_sum

        return sorted_groupby_sum(
            e.map_batches(pre, batch_format="pyarrow"), ["src"], "c",
            alias="deg")

    prev_alive = None
    for _ in range(n_iters):
        deg = degree(edges)

        def keep_deg(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t.column("deg"),
                                             pa.scalar(k))).select(["src"])

        alive = deg.map_batches(keep_deg, batch_format="pyarrow").materialize()
        n_alive = alive.count()
        if n_alive == 0:
            return empty
        if prev_alive is not None and n_alive == prev_alive:
            break  # fixpoint: another round reproduces the same set
        prev_alive = n_alive
        edges = semi_join_auto(
            semi_join_auto(edges, "src", alive, key_col="src",
                           broadcast_limit=broadcast_limit),
            "dst", alive, key_col="src",
            broadcast_limit=broadcast_limit).materialize()

    return alive.map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow")


def hop_distances(triples, source: str, *, max_hops: int = 4,
                  driver_limit: int = plan.KCORE_DRIVER_EDGES,
                  broadcast_limit: int = plan.BROADCAST_ROWS):
    """BFS hop distances from ``source`` over the KG's UNDIRECTED
    uri--uri graph, capped at ``max_hops``.  Output: (node, hops) with
    hops = the minimum undirected distance — the neighborhood-radius
    primitive behind "everything within k hops of this entity"
    exploration queries (reference analogue: the 2-hop geography
    expansion J4, generalized to any anchor and depth).

    Stats-gated two-path design (kcore's): a collected numpy BFS under
    ``driver_limit`` edges; above it, each round broadcasts the
    CURRENT FRONTIER (never the visited set — frontiers are bounded by
    one hop's reach), expands it with one streaming semi-join over the
    edge list, and subtracts the visited set with the stats-gated
    anti-join (broadcast below ``broadcast_limit``, distributed hash
    join above).  Per-round exchange is bounded by the frontier's
    adjacency, never the graph."""
    import pyarrow.compute as pc

    import ray.data as rd

    from octoray.query import distinct_values, semi_join_auto

    base = uri_edges(triples)

    def sym(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))
        s = t.column("src").combine_chunks().cast(pa.string())
        d = t.column("dst").combine_chunks().cast(pa.string())
        return pa.table({"src": pa.concat_arrays([s, d]),
                         "dst": pa.concat_arrays([d, s])})

    edges = distinct_values(base.map_batches(sym, batch_format="pyarrow"),
                            ["src", "dst"]).materialize()

    def result(pairs):
        nodes = [n for n, _ in pairs]
        hops = [h for _, h in pairs]
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "hops": pa.array(hops, pa.int64())}))

    if edges.count() <= driver_limit:
        adj: dict = {}
        for r in edges.take_all():
            adj.setdefault(r["src"], []).append(r["dst"])
        dist = {source: 0}
        frontier = [source]
        for d in range(1, max_hops + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            if not nxt:
                break
            frontier = nxt
        return result(sorted(dist.items()))

    # distributed frontier expansion
    visited = rd.from_arrow(pa.table({
        "node": pa.array([source], pa.string()),
        "hops": pa.array([0], pa.int64())})).materialize()
    frontier = visited
    for d in range(1, max_hops + 1):
        reached = distinct_values(
            semi_join_auto(edges, "src", frontier, key_col="node",
                           broadcast_limit=broadcast_limit)
            .map_batches(lambda t: t.select(["dst"])
                         .rename_columns(["node"]),
                         batch_format="pyarrow"),
            ["node"])
        fresh = semi_join_auto(reached, "node", visited, key_col="node",
                               anti=True,
                               broadcast_limit=broadcast_limit)
        frontier = fresh.map_batches(
            lambda t, _d=d: t.append_column(
                "hops", pa.array([_d] * t.num_rows, pa.int64())),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).materialize()
    return visited


def harmonic_centrality(edges, *, n_sources: int = 12, max_hops: int = 4,
                        driver_limit: int = plan.KCORE_DRIVER_EDGES,
                        broadcast_limit: int = plan.BROADCAST_ROWS,
                        _return_visited: bool = False):
    """Sampled harmonic centrality over an UNDIRECTED view of a
    (src, dst) edge list: for each node, the number of sampled
    sources that reach it within ``max_hops`` and the harmonic sum
    Σ 1/dist — the centrality Common Crawl publishes as its host
    rank (cc-webgraph harmonic releases; Boldi & Vigna 2014 "Axioms
    for centrality" is the sampling justification: harmonic sums are
    plain means over source BFS trees, so a uniform source sample is
    an unbiased estimator whose error shrinks with the sample).

    Determinism (and oracle exactness): sources are the bottom-k
    nodes by (md5_number_lower(node), node) — the KMV/approx_quantiles
    sampling key — so DuckDB re-derives the IDENTICAL sample; BFS min
    distances are exact; the harmonic sum rounds half-up to 6
    decimals like pagerank.

    Scale shape: the multi-source BFS keeps (source, node) labeled
    frontiers — per round ONE hash join of the edge list against the
    frontier (bounded by one hop's reach x n_sources, never the
    graph) and one stats-gated anti-join against the visited set on
    the composite key; the final per-node reduce is one node-range
    sort over |visited| <= n_sources x |V| slim rows.  Below
    ``driver_limit`` edges a collected numpy BFS computes the same
    thing (pinned equal in pytest)."""
    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from octoray.query import distinct_values, semi_join_auto
    from octoray.stages.sketch import _md5_lower64

    def sym(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))
        s = t.column("src").combine_chunks().cast(pa.string())
        d = t.column("dst").combine_chunks().cast(pa.string())
        return pa.table({"src": pa.concat_arrays([s, d]),
                         "dst": pa.concat_arrays([d, s])})

    und = distinct_values(edges.map_batches(sym, batch_format="pyarrow"),
                          ["src", "dst"]).materialize()

    def both(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("src")})  # sym emitted both dirs

    nodes = distinct_values(und.map_batches(both, batch_format="pyarrow"),
                            ["node"])

    # deterministic bottom-k source sample: per-block partial bottom-k
    # (slim k rows leave each block), global cut on the driver
    def partial_bottom(t: pa.Table) -> pa.Table:
        vals = t.column("node").to_pylist()
        hv = _md5_lower64(vals)
        order = np.lexsort((np.asarray(vals, object), hv))[:n_sources]
        return pa.table({"node": pa.array([vals[i] for i in order],
                                          pa.string()),
                         "hv": pa.array(hv[order], pa.uint64())})

    cand = nodes.map_batches(partial_bottom,
                             batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (int(r["hv"]), r["node"]))
    sources = [r["node"] for r in cand[:n_sources]]

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df[df["hops"] > 0]
        if not len(df):
            return pd.DataFrame({"node": pd.Series([], dtype=object),
                                 "n_reached": pd.Series([], dtype="int64"),
                                 "harmonic": pd.Series([], dtype="float64")})
        g = df.groupby("node", sort=False)
        inv = (1.0 / df["hops"]).groupby(df["node"], sort=False).sum()
        out = pd.DataFrame({
            "n_reached": g.size().astype("int64"),
            "harmonic": [round_half_up_scalar(v, 6) for v in inv],
        }).reset_index()
        return out[["node", "n_reached", "harmonic"]]

    if und.count() <= driver_limit:
        adj: dict = {}
        for r in und.take_all():
            adj.setdefault(r["src"], []).append(r["dst"])
        rows = []
        for s in sources:
            dist = {s: 0}
            frontier = [s]
            for d in range(1, max_hops + 1):
                nxt = []
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v not in dist:
                            dist[v] = d
                            nxt.append(v)
                if not nxt:
                    break
                frontier = nxt
            rows += [(s, n, h) for n, h in dist.items()]
        vis = pd.DataFrame(rows, columns=["source", "node", "hops"])
        if _return_visited:
            return rd.from_arrow(pa.table({
                "source": pa.array(vis["source"], pa.string()),
                "node": pa.array(vis["node"], pa.string()),
                "hops": pa.array(vis["hops"], pa.int64())}))
        return rd.from_pandas(finish(vis)) if len(vis) else rd.from_pandas(
            finish(pd.DataFrame(columns=["source", "node", "hops"])))

    # distributed multi-source frontier expansion
    def skey(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("source").cast(pa.string()),
            t.column("node").cast(pa.string()), "\x00")
        return t.append_column("skey", k)

    visited = rd.from_arrow(skey(pa.table({
        "source": pa.array(sources, pa.string()),
        "node": pa.array(sources, pa.string()),
        "hops": pa.array([0] * len(sources), pa.int64())}))).materialize()
    frontier = visited
    for d in range(1, max_hops + 1):
        fr = frontier.map_batches(
            lambda t: t.select(["source", "node"]).rename_columns(
                ["source", "src"]), batch_format="pyarrow")
        reached = distinct_values(
            hash_join(und, fr, on="src").map_batches(
                lambda t: t.select(["source", "dst"]).rename_columns(
                    ["source", "node"]), batch_format="pyarrow"),
            ["source", "node"])
        fresh = semi_join_auto(
            reached.map_batches(skey, batch_format="pyarrow"),
            "skey", visited, key_col="skey", anti=True,
            broadcast_limit=broadcast_limit)
        frontier = fresh.map_batches(
            lambda t, _d=d: t.append_column(
                "hops", pa.array([_d] * t.num_rows, pa.int64())),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).materialize()

    if _return_visited:
        return visited.select_columns(["source", "node", "hops"])
    return visited.select_columns(["source", "node", "hops"]).sort(
        ["node"]).map_batches(finish, batch_format="pandas",
                              batch_size=None)


def sql_harmonic(edges_src: str, *, n_sources: int = 12,
                 max_hops: int = 4) -> str:
    """DuckDB twin of harmonic_centrality over the same directed edge
    rows: identical symmetrization, identical md5 bottom-k source
    sample, recursive-CTE BFS min distances, identical rounding."""
    return f"""
        WITH RECURSIVE
        base AS (SELECT src, dst FROM ({edges_src}) WHERE src <> dst),
        e AS (SELECT DISTINCT src, dst FROM
              (SELECT src, dst FROM base UNION ALL
               SELECT dst, src FROM base)),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        srcs AS (SELECT node AS s FROM nodes
                 ORDER BY md5_number_lower(CAST(node AS VARCHAR)), node
                 LIMIT {n_sources}),
        walk(s, node, d) AS (
          SELECT s, s, 0 FROM srcs
          UNION
          SELECT w.s, e.dst, w.d + 1
          FROM walk w JOIN e ON e.src = w.node
          WHERE w.d < {max_hops}),
        md AS (SELECT s, node, min(d) AS d FROM walk GROUP BY 1, 2)
        SELECT node, CAST(count(*) AS BIGINT) AS n_reached,
               floor(sum(1.0 / d) * 1000000 + 0.5) / 1000000 AS harmonic
        FROM md WHERE d > 0 GROUP BY node
    """


def _walks_driver(edges, *, n_walks: int, walk_len: int, seed: int):
    """Collected-edges driver fast path (small-graph gate): the
    IDENTICAL md5 neighbor picks over the dst-sorted adjacency as the
    distributed loop — pinned equal in pytest.  Collapses the
    per-step join executions (the toy-scale cost is execution count,
    not data) into one local pass."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from octoray.stages.sketch import _md5_lower64

    df = edges.to_pandas()
    schema = pa.schema([("start", pa.string()), ("walk", pa.int64()),
                        ("step", pa.int64()), ("node", pa.string())])
    if not len(df):
        return rd.from_arrow(schema.empty_table())
    df = df.sort_values(["src", "dst"], kind="mergesort")
    adj = {s: g["dst"].to_numpy()
           for s, g in df.groupby("src", sort=True)}
    starts = sorted(adj)
    start_arr = np.repeat(np.asarray(starts, object), n_walks)
    walk_arr = np.tile(np.arange(n_walks, dtype=np.int64), len(starts))
    node = start_arr.copy()
    cols = [pd.DataFrame({"start": start_arr, "walk": walk_arr,
                          "step": np.int64(0), "node": node})]
    alive = np.ones(len(node), bool)
    for t in range(1, walk_len + 1):
        mask = alive & np.fromiter((u in adj for u in node),
                                   bool, len(node))
        idx = np.flatnonzero(mask)
        if idx.size == 0:
            break
        nodes_t = node[idx]
        walks_t = walk_arr[idx]
        hv = _md5_lower64([f"{seed}:{w}:{t}:{u}"
                           for w, u in zip(walks_t, nodes_t)])
        degs = np.fromiter((len(adj[u]) for u in nodes_t),
                           np.uint64, len(nodes_t))
        rn = (hv % degs).astype(np.int64)
        nxt = np.array([adj[u][r] for u, r in zip(nodes_t, rn)], object)
        cols.append(pd.DataFrame({"start": start_arr[idx],
                                  "walk": walks_t,
                                  "step": np.int64(t), "node": nxt}))
        node = node.copy()
        node[idx] = nxt
        alive = mask
    out = pd.concat(cols, ignore_index=True)
    return rd.from_arrow(pa.Table.from_pandas(out, schema=schema,
                                              preserve_index=False))


def random_walks(triples, *, n_walks: int = 2, walk_len: int = 3,
                 seed: int = 1, broadcast_limit: int = plan.BROADCAST_ROWS,
                 driver_limit: int = plan.GRAPH_DRIVER_EDGES):
    """DeepWalk-style random-walk corpus over the KG's DIRECTED
    uri->uri graph [Perozzi et al. 2014] — the export that feeds
    skip-gram graph embeddings.  Every node with out-edges starts
    ``n_walks`` walks of up to ``walk_len`` steps; a walk stops early
    at a sink.  Output: (start, walk, step, node) rows including
    step 0.

    The "randomness" is the house content hash — step t from node u
    on walk w picks neighbor index md5(f"{seed}:{w}:{t}:{u}") mod
    out-degree over the dst-SORTED adjacency — so the corpus is
    deterministic, partition-independent, and the DuckDB twin walks
    the identical paths (§2.10: no wall-clock RNG).

    Plan: adjacency ranks come from ONE src-keyed range sort (equal
    keys co-locate; rn/deg are block-local window computations); each
    of the ``walk_len`` rounds is two stats-gated hash joins (degree
    lookup, then (src, rn) edge lookup) over a frontier bounded by
    starts x n_walks — the walk NEVER fans out.  Below
    ``driver_limit`` edges the whole loop folds into one driver pass
    (:func:`_walks_driver` — identical picks, pinned equal), the same
    stats-gate discipline as pagerank/kcore."""
    import pyarrow.compute as pc  # noqa: F401

    import ray.data as rd

    from octoray.query import distinct_values, hash_join
    from octoray.stages.sketch import _md5_lower64

    SEP = "\x1f"
    edges = uri_edges(triples).materialize()
    if edges.count() <= driver_limit:
        return _walks_driver(edges, n_walks=n_walks, walk_len=walk_len,
                             seed=seed)

    def rank_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return df.assign(rn=pd.Series([], dtype="int64"),
                             deg=pd.Series([], dtype="int64"))
        df = df.sort_values(["src", "dst"], kind="mergesort")
        g = df.groupby("src", sort=False)
        df["rn"] = g.cumcount() + 1
        df["deg"] = g["dst"].transform("size")
        return df

    import pandas as pd

    adj = colocated_sort(edges, ["src"]).map_batches(
        rank_block, batch_format="pandas", batch_size=None).materialize()

    def keyed(t: pa.Table) -> pa.Table:
        src = t.column("src").to_pylist()
        rn = t.column("rn").to_pylist()
        k = pa.array([f"{s}{SEP}{r}" for s, r in zip(src, rn)], pa.string())
        return pa.table({"_k": k, "dst": t.column("dst")})

    adj_keyed = adj.map_batches(keyed, batch_format="pyarrow").materialize()

    def deg_block(t: pa.Table) -> pa.Table:
        g = t.select(["src", "deg"]).group_by(
            ["src"], use_threads=False).aggregate([("deg", "max")])
        return g.rename_columns(["src", "deg"])

    deg = distinct_values(adj.map_batches(deg_block, batch_format="pyarrow"),
                          ["src", "deg"]).materialize()

    def seed_walks(t: pa.Table) -> pa.Table:
        import numpy as np

        starts = t.column("src").to_pylist()
        n = len(starts)
        return pa.table({
            "start": pa.array(np.repeat(np.asarray(starts, object), n_walks),
                              pa.string()),
            "walk": pa.array(np.tile(np.arange(n_walks), n), pa.int64()),
            "node": pa.array(np.repeat(np.asarray(starts, object), n_walks),
                             pa.string()),
        })

    frontier = deg.map_batches(seed_walks, batch_format="pyarrow")

    def zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "start": t.column("start"), "walk": t.column("walk"),
            "step": pa.array([0] * t.num_rows, pa.int64()),
            "node": t.column("node")})

    out = [frontier.map_batches(zero, batch_format="pyarrow").materialize()]
    for t_step in range(1, walk_len + 1):
        fd = hash_join(frontier, deg, on="node", right_on="src",
                       broadcast_limit=broadcast_limit)

        def pick(t: pa.Table, _t=t_step) -> pa.Table:
            import numpy as np

            nodes = t.column("node").to_pylist()
            walks = t.column("walk").to_pylist()
            degs = np.asarray(t.column("deg").to_pylist(), np.uint64)
            hv = _md5_lower64([f"{seed}:{w}:{_t}:{u}"
                               for w, u in zip(walks, nodes)])
            rn = (hv % degs).astype(np.int64) + 1
            k = pa.array([f"{u}{SEP}{r}" for u, r in zip(nodes, rn)],
                         pa.string())
            return pa.table({"start": t.column("start"),
                             "walk": t.column("walk"), "_k": k})

        stepped = hash_join(
            fd.map_batches(pick, batch_format="pyarrow"), adj_keyed,
            on="_k", broadcast_limit=broadcast_limit)

        def emit(t: pa.Table, _t=t_step) -> pa.Table:
            return pa.table({
                "start": t.column("start"), "walk": t.column("walk"),
                "step": pa.array([_t] * t.num_rows, pa.int64()),
                "node": t.column("dst")})

        frontier = stepped.map_batches(
            lambda t: pa.table({"start": t.column("start"),
                                "walk": t.column("walk"),
                                "node": t.column("dst")}),
            batch_format="pyarrow").materialize()
        out.append(stepped.map_batches(emit,
                                       batch_format="pyarrow").materialize())
        if frontier.count() == 0:
            break
    res = out[0]
    for o in out[1:]:
        res = res.union(o)
    return res


def walk_skipgrams(walks, *, window: int = 2):
    """Random-walk corpus -> skip-gram training pairs
    (center, context, n): co-occurrence counts of nodes within
    ``window`` steps on the same walk — the second half of the
    DeepWalk/node2vec recipe (the pairs feed any word2vec trainer).

    ONE (start, walk) range sort co-locates each walk (equal leading
    keys share a block — the pinned invariant), then a block-local
    vectorized shift emits pairs per offset (walks are walk_len+1
    rows, so the within-block work is trivial) with map-side counts;
    ONE further (center, context) range sort collapses the partials
    globally (``sorted_groupby_sum`` — the task-based plan; Ray
    2.49's hash-aggregate operator measured 100x slower on
    few-block inputs, the same aggregator pathology hash_join
    documents).  Exchange rows are bounded by distinct
    (center, context) pairs."""
    import pandas as pd

    from octoray.query import sorted_groupby_sum

    def pairs_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return pd.DataFrame({"center": pd.Series([], dtype=object),
                                 "context": pd.Series([], dtype=object),
                                 "_n": pd.Series([], dtype="int64")})
        df = df.sort_values(["start", "walk", "step"], kind="mergesort")
        outs = []
        for d in range(1, window + 1):
            g = df.groupby(["start", "walk"], sort=False)
            nxt = g["node"].shift(-d)
            ok = nxt.notna()
            if ok.any():
                c = df.loc[ok, "node"].to_numpy()
                x = nxt[ok].to_numpy()
                # symmetric pairs: center->context both directions
                outs.append(pd.DataFrame({"center": c, "context": x}))
                outs.append(pd.DataFrame({"center": x, "context": c}))
        if not outs:
            return pd.DataFrame({"center": pd.Series([], dtype=object),
                                 "context": pd.Series([], dtype=object),
                                 "_n": pd.Series([], dtype="int64")})
        allp = pd.concat(outs)
        g = allp.groupby(["center", "context"], sort=False).size()
        return g.reset_index(name="_n")

    pre = colocated_sort(walks, ["start", "walk"]).map_batches(
        pairs_block, batch_format="pandas", batch_size=None)
    return sorted_groupby_sum(pre, ["center", "context"], "_n", alias="n")


def sql_walk_skipgrams(src: str, *, window: int = 2) -> str:
    """DuckDB twin of :func:`walk_skipgrams` over the dumped walk
    table: window self-join, symmetric, counted."""
    return f"""
        WITH w AS (SELECT start, walk, step, node FROM {src}),
        p AS (SELECT a.node AS center, b.node AS context
              FROM w a JOIN w b
                ON a.start = b.start AND a.walk = b.walk
               AND b.step > a.step AND b.step <= a.step + {window}
              UNION ALL
              SELECT b.node, a.node
              FROM w a JOIN w b
                ON a.start = b.start AND a.walk = b.walk
               AND b.step > a.step AND b.step <= a.step + {window})
        SELECT center, context, CAST(count(*) AS BIGINT) AS n
        FROM p GROUP BY center, context
    """


def sql_random_walks(src: str, *, n_walks: int = 2, walk_len: int = 3,
                     seed: int = 1) -> str:
    """DuckDB twin of :func:`random_walks` over the raw triple dump:
    identical dst-sorted adjacency ranks, identical md5 neighbor
    picks, one CTE per step."""
    steps = []
    prev = "w0"
    for t in range(1, walk_len + 1):
        steps.append(f"""
            s{t} AS (
                SELECT {prev}.start, {prev}.walk, {t} AS step,
                       a.dst AS node
                FROM {prev}
                JOIN dg ON dg.src = {prev}.node
                JOIN adj a ON a.src = {prev}.node
                 AND a.rn = CAST(md5_number_lower(
                         concat('{seed}', ':', {prev}.walk, ':', {t},
                                ':', {prev}.node)) % dg.deg
                     AS BIGINT) + 1)""")
        prev = f"s{t}"
    unions = "\n            UNION ALL ".join(
        f"SELECT * FROM s{t}" for t in range(1, walk_len + 1))
    return f"""
        WITH e AS (SELECT DISTINCT subject AS src, object AS dst
                   FROM {src} WHERE object_datatype = 'uri'),
        adj AS (SELECT src, dst,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY dst) AS rn,
                       count(*) OVER (PARTITION BY src) AS deg
                FROM e),
        dg AS (SELECT src, max(deg) AS deg FROM adj GROUP BY src),
        w0 AS (SELECT src AS start, w.walk, 0 AS step, src AS node
               FROM dg CROSS JOIN (
                   SELECT unnest(generate_series(
                       0, {n_walks - 1})) AS walk) w),
        {','.join(steps)}
        SELECT * FROM w0
            UNION ALL {unions}
    """


def _kcore_driver(edges, *, k: int, n_iters: int):
    """Collected-edges numpy peel (small-graph fast path): identical
    fixpoint, pinned equal to the distributed loop in pytest."""
    import numpy as np
    import ray.data as rd

    rows = edges.take_all()
    names = sorted({r["src"] for r in rows})
    idx = {v: i for i, v in enumerate(names)}
    si = np.fromiter((idx[r["src"]] for r in rows), np.int64, len(rows))
    di = np.fromiter((idx[r["dst"]] for r in rows), np.int64, len(rows))
    alive = np.ones(len(names), dtype=bool)
    ekeep = np.ones(len(rows), dtype=bool)
    prev = -1
    for _ in range(n_iters):
        deg = np.bincount(si[ekeep], minlength=len(names))
        alive = deg >= k
        n_alive = int(alive.sum())
        if n_alive == 0:
            return rd.from_arrow(pa.table({"node": pa.array([], pa.string())}))
        if n_alive == prev:
            break
        prev = n_alive
        ekeep = alive[si] & alive[di]
    keep = [names[i] for i in np.flatnonzero(alive)]
    return rd.from_arrow(pa.table({"node": pa.array(keep, pa.string())}))


def hits_edges(edges, *, n_iters: int = 5, driver_limit: int = plan.KCORE_DRIVER_EDGES):
    """HITS hubs & authorities [Kleinberg 1999, "Authoritative
    sources in a hyperlinked environment"] over a DISTINCT (src, dst)
    edge dataset — the classic complement to PageRank in web-graph
    releases (reference analogue: none; this generalizes the KG's
    ranking machinery to the mutually-recursive hub/authority
    recurrence).

    Per iteration (the standard coupled power iteration):
      a' = L2-normalize(E^T h)   — authority = sum of in-neighbour hubs
      h' = L2-normalize(E a')    — hub = sum of out-neighbour authorities

    Stats-gated two-path design (the pagerank_edges pattern): below
    ``driver_limit`` edges a collected numpy iteration answers with
    zero per-round pipeline executions; above it, each half-step is
    one hash join (score table is node-sized, far smaller than the
    corpus, so hash_join's stats gate broadcasts it while it fits)
    + one small-row combine sum + one scalar sum-of-squares reduce
    for the norm.  Both paths run the identical float64 recurrence;
    equality is pinned in pytest.

    Determinism: fixed iteration count, float64, final half-up
    rounding to 6 decimals — cross-engine FP sum-order drift is
    ~1e-15, far under the rounding grain (the pagerank precedent).
    """
    edges = edges.materialize()

    if edges.count() <= driver_limit:
        return _hits_driver(edges, n_iters=n_iters)

    import math

    import pyarrow.compute as pc

    from octoray.query import distinct_values

    def both(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("src").combine_chunks().cast(pa.string()),
             t.column("dst").combine_chunks().cast(pa.string())])})

    nodes = distinct_values(edges.map_batches(both, batch_format="pyarrow"),
                            ["node"]).materialize()
    if nodes.count() == 0:
        return nodes

    def half_step(scores, key_in: str, key_out: str):
        """One normalized half-step: sum scores over edges keyed on
        ``key_in``, grouped to ``key_out``, L2-normalized."""
        r = scores.map_batches(
            lambda t: t.rename_columns([key_in, "s"]),
            batch_format="pyarrow")
        moved = hash_join(edges, r, on=key_in).map_batches(
            lambda t: pa.table({"node": t.column(key_out),
                                "s": t.column("s")}),
            batch_format="pyarrow")
        summed = sorted_groupby_sum(moved, ["node"], "s",
                                    alias="v").materialize()
        ss = summed.map_batches(
            lambda t: pa.table({"ss": pc.multiply(t.column("v"),
                                                  t.column("v"))}),
            batch_format="pyarrow").sum("ss")
        z = math.sqrt(ss) if ss else 1.0

        joined = hash_join(nodes, summed, on="node", how="left_outer")

        def norm(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"],
                                 "s": df["v"].fillna(0.0) / z})

        return joined.map_batches(norm, batch_format="pandas").materialize()

    hubs = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "s": pa.array([1.0] * t.num_rows,
                                          pa.float64())}),
        batch_format="pyarrow").materialize()
    auths = hubs
    for _ in range(n_iters):
        auths = half_step(hubs, "src", "dst")
        hubs = half_step(auths, "dst", "src")

    a = auths.map_batches(
        lambda t: t.rename_columns(["node", "authority"]),
        batch_format="pyarrow")
    out = hash_join(hubs.map_batches(
        lambda t: t.rename_columns(["node", "hub"]),
        batch_format="pyarrow"), a, on="node")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "hub": pa.array([round_half_up_scalar(v, 6)
                             for v in t.column("hub").to_pylist()],
                            pa.float64()),
            "authority": pa.array(
                [round_half_up_scalar(v, 6)
                 for v in t.column("authority").to_pylist()],
                pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _hits_driver(edges, *, n_iters: int):
    """Collected-edges numpy HITS (small-graph fast path): identical
    coupled recurrence, pinned equal to the distributed loop."""
    import numpy as np
    import ray.data as rd

    rows = edges.take_all()
    if not rows:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64())}))
    src = [r["src"] for r in rows]
    dst = [r["dst"] for r in rows]
    names = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(names)}
    n = len(names)
    si = np.fromiter((idx[s] for s in src), np.int64, len(src))
    di = np.fromiter((idx[d] for d in dst), np.int64, len(dst))
    h = np.ones(n, np.float64)
    a = np.ones(n, np.float64)
    for _ in range(n_iters):
        a = np.bincount(di, weights=h[si], minlength=n)
        z = np.sqrt((a * a).sum())
        a = a / (z if z != 0.0 else 1.0)
        h = np.bincount(si, weights=a[di], minlength=n)
        z = np.sqrt((h * h).sum())
        h = h / (z if z != 0.0 else 1.0)
    return rd.from_arrow(pa.table({
        "node": pa.array(names, pa.string()),
        "hub": pa.array([round_half_up_scalar(v, 6) for v in h],
                        pa.float64()),
        "authority": pa.array([round_half_up_scalar(v, 6) for v in a],
                              pa.float64()),
    }))


def sql_hits_edges(edges_src: str, *, n_iters: int = 5) -> str:
    """DuckDB twin of hits_edges — a generated CTE chain re-deriving
    every normalized half-step (same L2 norm over the raw grouped
    sums; zeros contribute nothing, so the norm over the nonzero set
    equals the norm over all nodes), identical final rounding.

    Every CTE is MATERIALIZED: unlike the pagerank chain (each level
    referenced once → linear after inlining), each HITS level is
    referenced ~3× (raw sums feed both the norm and the normalized
    table), so DuckDB's default CTE inlining re-expands the chain
    exponentially — 5 iterations on a 100-node graph ran minutes
    inlined vs 0.04 s materialized."""
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_src}))",
        "nodes AS MATERIALIZED"
        " (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS MATERIALIZED (SELECT node, 1.0 AS s FROM nodes)",
    ]
    for t in range(1, n_iters + 1):
        p = t - 1
        parts += [
            f"ar{t} AS MATERIALIZED (SELECT e.dst AS node, sum(h.s) AS v"
            f" FROM e JOIN h{p} h ON e.src = h.node GROUP BY 1)",
            f"az{t} AS MATERIALIZED (SELECT sqrt(sum(v * v)) AS z FROM ar{t})",
            f"a{t} AS MATERIALIZED (SELECT nodes.node, coalesce(ar.v, 0.0) /"
            f" (CASE WHEN az{t}.z = 0 OR az{t}.z IS NULL THEN 1.0"
            f" ELSE az{t}.z END) AS s"
            f" FROM nodes CROSS JOIN az{t} LEFT JOIN ar{t} ar"
            f" ON nodes.node = ar.node)",
            f"hr{t} AS MATERIALIZED (SELECT e.src AS node, sum(a.s) AS v"
            f" FROM e JOIN a{t} a ON e.dst = a.node GROUP BY 1)",
            f"hz{t} AS MATERIALIZED (SELECT sqrt(sum(v * v)) AS z FROM hr{t})",
            f"h{t} AS MATERIALIZED (SELECT nodes.node, coalesce(hr.v, 0.0) /"
            f" (CASE WHEN hz{t}.z = 0 OR hz{t}.z IS NULL THEN 1.0"
            f" ELSE hz{t}.z END) AS s"
            f" FROM nodes CROSS JOIN hz{t} LEFT JOIN hr{t} hr"
            f" ON nodes.node = hr.node)",
        ]
    n = n_iters
    return ("WITH " + ", ".join(parts) +
            f" SELECT h.node,"
            f" floor(h.s * 1000000 + 0.5) / 1000000 AS hub,"
            f" floor(a.s * 1000000 + 0.5) / 1000000 AS authority"
            f" FROM h{n} h JOIN a{n} a ON h.node = a.node")


def distance_histogram(edges, *, n_sources: int = 12, max_hops: int = 4,
                       driver_limit: int = plan.KCORE_DRIVER_EDGES,
                       broadcast_limit: int = plan.BROADCAST_ROWS):
    """Sampled shortest-distance distribution over the UNDIRECTED
    view of an edge list: (hops, n_pairs) for the BFS trees of the
    same deterministic md5 bottom-k source sample harmonic_centrality
    uses — the effective-diameter / small-world profile every
    webgraph release reports (HyperANF's product, here exact over a
    source sample instead of approximate over all pairs).

    One slim combine-count over harmonic's (source, node, hops)
    visited table; everything upstream (sampling, BFS fixpoints,
    stats gates) is shared code."""
    from octoray.query import sorted_groupby_count

    vis = harmonic_centrality(edges, n_sources=n_sources,
                              max_hops=max_hops,
                              driver_limit=driver_limit,
                              broadcast_limit=broadcast_limit,
                              _return_visited=True)
    import pyarrow.compute as pc

    pos = vis.map_batches(
        lambda t: t.select(["hops"]).filter(
            pc.greater(t.column("hops"), pa.scalar(0))),
        batch_format="pyarrow")
    return sorted_groupby_count(pos, ["hops"], alias="n_pairs")


def sql_distance_histogram(edges_src: str, *, n_sources: int = 12,
                           max_hops: int = 4) -> str:
    """DuckDB twin of distance_histogram (sql_harmonic's CTE chain,
    grouped by distance instead of node)."""
    return f"""
        WITH RECURSIVE
        base AS (SELECT src, dst FROM ({edges_src}) WHERE src <> dst),
        e AS (SELECT DISTINCT src, dst FROM
              (SELECT src, dst FROM base UNION ALL
               SELECT dst, src FROM base)),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        srcs AS (SELECT node AS s FROM nodes
                 ORDER BY md5_number_lower(CAST(node AS VARCHAR)), node
                 LIMIT {n_sources}),
        walk(s, node, d) AS (
          SELECT s, s, 0 FROM srcs
          UNION
          SELECT w.s, e.dst, w.d + 1
          FROM walk w JOIN e ON e.src = w.node
          WHERE w.d < {max_hops}),
        md AS (SELECT s, node, min(d) AS d FROM walk GROUP BY 1, 2)
        SELECT d AS hops, CAST(count(*) AS BIGINT) AS n_pairs
        FROM md WHERE d > 0 GROUP BY d
    """


def link_negatives(edges, *, k: int = 2):
    """Deterministic negative sampling over an edge list's node set —
    the third leg of the graph-embedding trainer hand-off (walks →
    skip-gram pairs → negatives): for each node, ``k`` pseudo-uniform
    picks neg_j = nodes[md5(node \\x1f j) mod N] in the word2vec
    convention (positives NOT excluded, self-picks kept — the sampler
    stays unbiased and exactly re-derivable on both engines).
    Output: (node, j, neg).

    Scale shape: ONE node sort through the distributed exclusive
    prefix sum gives every node its global index (driver reduce
    bounded by block count); a map-side expansion emits k slim
    (node, j, pick) rows; ONE stats-gated hash join on the integer
    index resolves picks to node names.  Nothing wider than the node
    table ever moves."""
    import numpy as np

    from octoray.query import distinct_values, hash_join, sorted_prefix_sum
    from octoray.stages.sketch import _md5_lower64

    def both(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("src").combine_chunks().cast(pa.string()),
             t.column("dst").combine_chunks().cast(pa.string())])})

    nodes = distinct_values(edges.map_batches(both, batch_format="pyarrow"),
                            ["node"])
    ones = nodes.map_batches(
        lambda t: t.append_column("_one", pa.array([1] * t.num_rows,
                                                   pa.int64())),
        batch_format="pyarrow")
    idx = sorted_prefix_sum(ones, "_one", order_col="node",
                            alias="i").materialize()
    n = idx.count()
    if n == 0:
        return idx.select_columns(["node"])

    def expand(t: pa.Table) -> pa.Table:
        names = t.column("node").to_pylist()
        out_node = []
        out_j = []
        keys = []
        for name in names:
            for j in range(1, k + 1):
                out_node.append(name)
                out_j.append(j)
                keys.append(f"{name}\x1f{j}")
        picks = (_md5_lower64(keys) % np.uint64(n)).astype(np.int64)
        return pa.table({"node": pa.array(out_node, pa.string()),
                         "j": pa.array(out_j, pa.int64()),
                         "pick": pa.array(picks, pa.int64())})

    picks = idx.map_batches(expand, batch_format="pyarrow")
    lookup = idx.map_batches(
        lambda t: pa.table({"pick": t.column("i"),
                            "neg": t.column("node")}),
        batch_format="pyarrow")
    out = hash_join(picks, lookup, on="pick")
    return out.map_batches(
        lambda t: t.select(["node", "j", "neg"]), batch_format="pyarrow")


def sql_link_negatives(edges_src: str, *, k: int = 2) -> str:
    """DuckDB twin of link_negatives (row_number index, identical
    md5 pick rule)."""
    return f"""
        WITH e AS (SELECT src, dst FROM ({edges_src})),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        idx AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS i
                FROM nodes),
        nn AS (SELECT count(*) AS c FROM idx),
        p AS (SELECT idx.node, r.j,
                     CAST(md5_number_lower(idx.node || chr(31) ||
                          CAST(r.j AS VARCHAR)) % nn.c AS BIGINT) AS pick
              FROM idx CROSS JOIN range(1, {int(k)} + 1) r(j)
              CROSS JOIN nn)
        SELECT p.node, p.j, l.node AS neg
        FROM p JOIN idx l ON p.pick = l.i
    """


def clustering_coefficients(triples, *, broadcast_limit: int = plan.BROADCAST_ROWS):
    """Per-node local clustering coefficient over the undirected
    uri--uri graph: (node, deg, n_triangles, coeff) with coeff =
    2T(v) / (deg(v) (deg(v)-1)), 0 below degree 2 — the node-level
    refinement of triangle_count (how cliquish each entity's
    neighborhood is; the Watts-Strogatz small-world statistic).

    Same degree-oriented node-iterator as triangle_count (each
    triangle discovered exactly once at its lowest-(degree, id)
    corner, wedge fan-out bounded O(sqrt(m)) at hubs), except each
    surviving wedge (c, a, b) credits ALL THREE corners: explode to
    3 slim node rows, partial-combine count, one left join against
    the degree table.  Closing-edge membership is the same
    stats-gated broadcast-set / merge-join switch."""
    import numpy as np
    import pyarrow.compute as pc

    from octoray.query import (combined_groupby_count, distinct_values,
                               hash_join, merge_join)
    from octoray.util import round_half_up_scalar

    edges = uri_edges(triples)

    def undirect(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t.column("src"), t.column("dst"))
        b = pc.max_element_wise(t.column("src"), t.column("dst"))
        tbl = pa.table({"a": a, "b": b})
        return tbl.filter(pc.not_equal(tbl.column("a"), tbl.column("b")))

    und = distinct_values(
        edges.map_batches(undirect, batch_format="pyarrow"), ["a", "b"]
    ).materialize()

    def stack(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("a").combine_chunks().cast(pa.string()),
             t.column("b").combine_chunks().cast(pa.string())])})

    deg = combined_groupby_count(
        und.map_batches(stack, batch_format="pyarrow"), ["node"],
        alias="deg").materialize()

    e1 = hash_join(und, deg.map_batches(
        lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"),
        on="a")
    e2 = hash_join(e1, deg.map_batches(
        lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"),
        on="b")

    def orient(t: pa.Table) -> pa.Table:
        da, db = t.column("da"), t.column("db")
        a, b = t.column("a"), t.column("b")
        lower = pc.or_(pc.less(da, db),
                       pc.and_(pc.equal(da, db), pc.less(a, b)))
        return pa.table({
            "src": pc.if_else(lower, a, b),
            "dst": pc.if_else(lower, b, a),
        })

    oriented = e2.map_batches(orient, batch_format="pyarrow")

    def wedges_block(df):
        if not len(df):
            return pd.DataFrame({"c": pd.Series([], dtype=object),
                                 "a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        df = df.sort_values(["src", "dst"], kind="mergesort")
        srcs, counts = np.unique(df["src"].to_numpy(), return_counts=True)
        a, b = _within_group_pairs(counts, df["dst"].to_numpy())
        # _within_group_pairs emits pairs ordered by SIZE CLASS (one
        # pass per distinct group size), NOT by group position — the
        # center column must follow the same order or wedges credit
        # the wrong node (caught by the kg_clustering oracle: brute
        # 13 triangles vs 16 misattributed)
        ctr = []
        for m in np.unique(counts):
            if m < 2:
                continue
            ctr.append(np.repeat(srcs[counts == m],
                                 int(m) * (int(m) - 1) // 2))
        centers = (np.concatenate(ctr) if ctr
                   else np.array([], dtype=object))
        return pd.DataFrame({"c": centers, "a": a, "b": b})

    wedges = colocated_sort(oriented, ["src"]).map_batches(
        wedges_block, batch_format="pandas", batch_size=None)

    if und.count() <= broadcast_limit:
        import ray

        eset = set()
        for blk in und.iter_batches(batch_format="pyarrow"):
            eset.update(zip(blk.column("a").to_pylist(),
                            blk.column("b").to_pylist()))
        ref = ray.put(frozenset(eset))

        def survivors(t: pa.Table) -> pa.Table:
            import ray as _ray

            es = _ray.get(ref)
            keep = [(x, y) in es
                    for x, y in zip(t.column("a").to_pylist(),
                                    t.column("b").to_pylist())]
            return t.filter(pa.array(keep, pa.bool_()))

        closed = wedges.map_batches(survivors, batch_format="pyarrow")
    else:
        marked = und.map_batches(
            lambda t: t.append_column(
                "_e", pa.array([1] * t.num_rows, pa.int8())),
            batch_format="pyarrow")
        joined = merge_join(wedges, marked, ["a", "b"], how="left_outer")
        closed = joined.map_batches(
            lambda t: t.filter(pc.is_valid(t.column("_e")))
            .select(["c", "a", "b"]),
            batch_format="pyarrow")

    def corners(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column(c).combine_chunks().cast(pa.string())
             for c in ("c", "a", "b")])})

    tri = combined_groupby_count(
        closed.map_batches(corners, batch_format="pyarrow"), ["node"],
        alias="n_triangles").materialize()

    if tri.count() == 0:
        # triangle-free graph: the left join's empty right side would
        # reach the pandas merge with an untyped column — short-circuit
        out = deg.map_batches(
            lambda t: t.append_column(
                "n_triangles", pa.array([0] * t.num_rows, pa.int64())),
            batch_format="pyarrow")
    else:
        out = hash_join(deg, tri, on="node", how="left_outer")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        t = df["n_triangles"].fillna(0).astype("int64")
        d = df["deg"].astype("int64")
        denom = (d * (d - 1)).where(d >= 2, 1)
        coeff = (2.0 * t / denom).where(d >= 2, 0.0)
        return pd.DataFrame({
            "node": df["node"], "deg": d, "n_triangles": t,
            "coeff": [round_half_up_scalar(v, 6) for v in coeff]})

    return out.map_batches(finish, batch_format="pandas")


def sql_clustering(src: str) -> str:
    """DuckDB twin of clustering_coefficients; boundary: raw emitted
    triples (dedup + undirected canonicalization re-derived).  The
    canonical a<b pair set enumerates each triangle exactly once as
    (x<y<z)."""
    return f"""
        WITH d AS (SELECT DISTINCT subject, object FROM {src}
                   WHERE object_datatype = 'uri'),
        und AS (SELECT DISTINCT least(subject, object) AS a,
                       greatest(subject, object) AS b FROM d
                WHERE subject <> object),
        tr AS (SELECT u1.a AS x, u1.b AS y, u2.b AS z
               FROM und u1
               JOIN und u2 ON u2.a = u1.b
               JOIN und u3 ON u3.a = u1.a AND u3.b = u2.b),
        tn AS (SELECT x AS node FROM tr UNION ALL
               SELECT y FROM tr UNION ALL SELECT z FROM tr),
        tc AS (SELECT node, count(*) AS n_triangles FROM tn GROUP BY 1),
        dg AS (SELECT node, count(*) AS deg FROM
                 (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
               GROUP BY 1)
        SELECT dg.node, dg.deg,
               coalesce(tc.n_triangles, 0) AS n_triangles,
               floor((CASE WHEN dg.deg < 2 THEN 0.0
                      ELSE 2.0 * coalesce(tc.n_triangles, 0)
                           / (dg.deg * (dg.deg - 1.0)) END)
                     * 1000000 + 0.5) / 1000000 AS coeff
        FROM dg LEFT JOIN tc ON dg.node = tc.node
    """


def trustrank_edges(edges, *, damping: float = 0.85, n_iters: int = 5,
                    n_seeds: int = 8, driver_limit: int = plan.KCORE_DRIVER_EDGES):
    """TrustRank [Gyöngyi, Garcia-Molina & Pedersen 2004] — PageRank
    with teleportation restricted to a trusted seed set, the classic
    link-spam / quality-propagation rank: pages reachable from seeds
    in few hops keep mass, spam farms far from any seed starve.

    Determinism: seeds are the bottom-``n_seeds`` nodes by
    (md5_number_lower(node), node) — the engine's standard sampling
    key, so the SQL twin re-derives the IDENTICAL set.  Recurrence
    (simplified like pagerank_edges: dangling mass not redistributed):
      r0(v)   = 1/|S| if v in S else 0
      r'(v)   = (1-d)/|S| [v in S] + d * Σ r(u)/outdeg(u) over in-edges
    Final half-up rounding to 6 decimals.

    Scale shape: identical to pagerank_edges — node-sized rank table,
    one stats-gated hash join + one combine sum per round; collected
    numpy fast path below ``driver_limit`` edges (pinned equal)."""
    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from octoray.query import distinct_values, hash_join
    from octoray.stages.sketch import _md5_lower64
    from octoray.util import round_half_up_scalar

    edges = edges.materialize()

    def both(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("src").combine_chunks().cast(pa.string()),
             t.column("dst").combine_chunks().cast(pa.string())])})

    nodes = distinct_values(edges.map_batches(both, batch_format="pyarrow"),
                            ["node"]).materialize()
    if nodes.count() == 0:
        return nodes

    def partial_bottom(t: pa.Table) -> pa.Table:
        vals = t.column("node").to_pylist()
        hv = _md5_lower64(vals)
        order = np.lexsort((np.asarray(vals, object), hv))[:n_seeds]
        return pa.table({"node": pa.array([vals[i] for i in order],
                                          pa.string()),
                         "hv": pa.array(hv[order], pa.uint64())})

    cand = nodes.map_batches(partial_bottom,
                             batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (int(r["hv"]), r["node"]))
    seeds = [r["node"] for r in cand[:n_seeds]]
    s = len(seeds)

    if edges.count() <= driver_limit:
        rows = edges.take_all()
        names = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
        idx = {v: i for i, v in enumerate(names)}
        n = len(names)
        si = np.fromiter((idx[r["src"]] for r in rows), np.int64, len(rows))
        di = np.fromiter((idx[r["dst"]] for r in rows), np.int64, len(rows))
        deg = np.bincount(si, minlength=n).astype(np.float64)
        tele = np.zeros(n, np.float64)
        for v in seeds:
            tele[idx[v]] = 1.0 / s
        rank = tele.copy()
        for _ in range(n_iters):
            contrib = np.where(deg[si] > 0, rank[si] / deg[si], 0.0)
            mass = np.bincount(di, weights=contrib, minlength=n)
            rank = (1.0 - damping) * tele + damping * mass
        return rd.from_arrow(pa.table({
            "node": pa.array(names, pa.string()),
            "rank": pa.array([round_half_up_scalar(v, 6) for v in rank],
                             pa.float64())}))

    from octoray.query import sorted_groupby_count, sorted_groupby_sum

    seed_set = set(seeds)
    base = (1.0 - damping) / s

    def init(t: pa.Table) -> pa.Table:
        vals = [1.0 / s if v in seed_set else 0.0
                for v in t.column("node").to_pylist()]
        return pa.table({"node": t.column("node"),
                         "rank": pa.array(vals, pa.float64())})

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()
    deg = sorted_groupby_count(edges.select_columns(["src"]), ["src"],
                               alias="deg")
    edeg = hash_join(edges, deg, on="src").materialize()

    for _ in range(n_iters):
        r = ranks.map_batches(
            lambda t: t.rename_columns(["src", "rank"]),
            batch_format="pyarrow")
        contrib = hash_join(edeg, r, on="src").map_batches(
            lambda df: pd.DataFrame({"node": df["dst"],
                                     "c": df["rank"] / df["deg"]}),
            batch_format="pandas")
        summed = sorted_groupby_sum(contrib, ["node"], "c", alias="m")
        joined = hash_join(nodes, summed, on="node", how="left_outer")

        def update(df: pd.DataFrame) -> pd.DataFrame:
            mass = df["m"].fillna(0.0)
            b = df["node"].isin(seed_set) * base
            return pd.DataFrame({"node": df["node"],
                                 "rank": b + damping * mass})

        ranks = joined.map_batches(update,
                                   batch_format="pandas").materialize()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "rank": pa.array([round_half_up_scalar(v, 6)
                              for v in t.column("rank").to_pylist()],
                             pa.float64())})

    return ranks.map_batches(finish, batch_format="pyarrow")


def sql_trustrank_edges(edges_src: str, *, damping: float = 0.85,
                        n_iters: int = 5, n_seeds: int = 8) -> str:
    """DuckDB twin of trustrank_edges — generated CTE chain, same
    md5 bottom-k seed rule, MATERIALIZED like the HITS twin."""
    d = repr(damping)
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_src}))",
        "nodes AS MATERIALIZED"
        " (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"seeds AS MATERIALIZED (SELECT node FROM nodes"
        f" ORDER BY md5_number_lower(CAST(node AS VARCHAR)), node"
        f" LIMIT {n_seeds})",
        "ns AS MATERIALIZED (SELECT count(*) AS s FROM seeds)",
        "deg AS MATERIALIZED"
        " (SELECT src, count(*) AS deg FROM e GROUP BY 1)",
        "r0 AS MATERIALIZED (SELECT nodes.node,"
        " CASE WHEN seeds.node IS NOT NULL THEN 1.0 / ns.s ELSE 0.0 END"
        " AS rank FROM nodes CROSS JOIN ns"
        " LEFT JOIN seeds ON nodes.node = seeds.node)",
    ]
    for t in range(1, n_iters + 1):
        p = t - 1
        parts += [
            f"c{t} AS MATERIALIZED (SELECT e.dst AS node,"
            f" sum(r.rank / deg.deg) AS m"
            f" FROM e JOIN r{p} r ON e.src = r.node"
            f" JOIN deg ON e.src = deg.src GROUP BY 1)",
            f"r{t} AS MATERIALIZED (SELECT nodes.node,"
            f" (CASE WHEN seeds.node IS NOT NULL"
            f" THEN (1.0 - {d}) / ns.s ELSE 0.0 END)"
            f" + {d} * coalesce(c.m, 0.0) AS rank"
            f" FROM nodes CROSS JOIN ns"
            f" LEFT JOIN seeds ON nodes.node = seeds.node"
            f" LEFT JOIN c{t} c ON nodes.node = c.node)",
        ]
    return ("WITH " + ", ".join(parts) +
            f" SELECT node, floor(rank * 1000000 + 0.5) / 1000000 AS rank"
            f" FROM r{n_iters}")


def katz_edges(edges, *, beta: float = 0.05, n_iters: int = 4,
               driver_limit: int = plan.KCORE_DRIVER_EDGES):
    """Katz centrality (truncated): katz(v) = Σ_{l=1..L} β^l ·
    (# walks of length l ending at v) — the attenuated path-count
    centrality completing the rank family (degree < katz < pagerank
    in how much global structure each sees).  Fixed L iterations of
    m' = β · Aᵀ m starting from the all-ones vector, accumulated;
    final half-up rounding to 6 decimals.

    Scale shape: identical to pagerank_edges (node-sized message
    table, one stats-gated hash join + combine sum per round; numpy
    fast path below the edge gate, pinned equal)."""
    import numpy as np

    import ray.data as rd

    from octoray.query import (distinct_values, hash_join,
                               sorted_groupby_sum)
    from octoray.util import round_half_up_scalar

    edges = edges.materialize()

    if edges.count() <= driver_limit:
        rows = edges.take_all()
        if not rows:
            return rd.from_arrow(pa.table({
                "node": pa.array([], pa.string()),
                "katz": pa.array([], pa.float64())}))
        names = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
        idx = {v: i for i, v in enumerate(names)}
        n = len(names)
        si = np.fromiter((idx[r["src"]] for r in rows), np.int64, len(rows))
        di = np.fromiter((idx[r["dst"]] for r in rows), np.int64, len(rows))
        m = np.ones(n, np.float64)
        katz = np.zeros(n, np.float64)
        for _ in range(n_iters):
            m = beta * np.bincount(di, weights=m[si], minlength=n)
            katz += m
        return rd.from_arrow(pa.table({
            "node": pa.array(names, pa.string()),
            "katz": pa.array([round_half_up_scalar(v, 6) for v in katz],
                             pa.float64())}))

    def both(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("src").combine_chunks().cast(pa.string()),
             t.column("dst").combine_chunks().cast(pa.string())])})

    nodes = distinct_values(edges.map_batches(both, batch_format="pyarrow"),
                            ["node"]).materialize()

    msg = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "m": pa.array([1.0] * t.num_rows,
                                          pa.float64())}),
        batch_format="pyarrow").materialize()
    acc = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "katz": pa.array([0.0] * t.num_rows,
                                             pa.float64())}),
        batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        r = msg.map_batches(lambda t: t.rename_columns(["src", "m"]),
                            batch_format="pyarrow")
        moved = hash_join(edges, r, on="src").map_batches(
            lambda t, _b=beta: pa.table({
                "node": t.column("dst"),
                "m": pa.array([v * _b for v in
                               t.column("m").to_pylist()], pa.float64())}),
            batch_format="pyarrow")
        summed = sorted_groupby_sum(moved, ["node"], "m", alias="mm")
        msg = hash_join(nodes, summed, on="node",
                        how="left_outer").map_batches(
            lambda df: pd.DataFrame({"node": df["node"],
                                     "m": df["mm"].fillna(0.0)}),
            batch_format="pandas").materialize()
        a = acc.map_batches(lambda t: t.rename_columns(["node", "katz"]),
                            batch_format="pyarrow")
        acc = hash_join(a, msg, on="node").map_batches(
            lambda df: pd.DataFrame({"node": df["node"],
                                     "katz": df["katz"] + df["m"]}),
            batch_format="pandas").materialize()

    return acc.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "katz": pa.array([round_half_up_scalar(v, 6)
                              for v in t.column("katz").to_pylist()],
                             pa.float64())}),
        batch_format="pyarrow")


def sql_katz_edges(edges_src: str, *, beta: float = 0.05,
                   n_iters: int = 4) -> str:
    """DuckDB twin of katz_edges (MATERIALIZED generated chain — the
    accumulator references each level twice)."""
    b = repr(beta)
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_src}))",
        "nodes AS MATERIALIZED"
        " (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "m0 AS MATERIALIZED (SELECT node, 1.0 AS m FROM nodes)",
        "k0 AS MATERIALIZED (SELECT node, 0.0 AS katz FROM nodes)",
    ]
    for t in range(1, n_iters + 1):
        p = t - 1
        parts += [
            f"mr{t} AS MATERIALIZED (SELECT e.dst AS node,"
            f" {b} * sum(m.m) AS mm"
            f" FROM e JOIN m{p} m ON e.src = m.node GROUP BY 1)",
            f"m{t} AS MATERIALIZED (SELECT nodes.node,"
            f" coalesce(mr.mm, 0.0) AS m FROM nodes"
            f" LEFT JOIN mr{t} mr ON nodes.node = mr.node)",
            f"k{t} AS MATERIALIZED (SELECT k.node, k.katz + m.m AS katz"
            f" FROM k{p} k JOIN m{t} m ON k.node = m.node)",
        ]
    return ("WITH " + ", ".join(parts) +
            f" SELECT node, floor(katz * 1000000 + 0.5) / 1000000 AS katz"
            f" FROM k{n_iters}")


def assortativity(edges):
    """One-row degree-assortativity summary [Newman 2002]: the
    Pearson correlation between the (undirected) degrees at the two
    ends of every undirected edge — positive = hubs link to hubs
    (social nets), negative = hubs link to leaves (the web's
    signature shape).  Output (n_edges, assortativity) rounded
    half-up to 6 decimals, using the explicit sum formula (both ends
    of every edge enter the x/y samples symmetrically), NULL-safe 0
    for degenerate graphs.

    Scale shape: degree table (slim combine count), two stats-gated
    hash joins to attach end degrees, map-side partial moment sums
    (Σx Σx² Σxy per block), driver combine of block partials — the
    edge list never shuffles for the statistic itself."""
    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from octoray.query import distinct_values, hash_join
    from octoray.query import combined_groupby_count
    from octoray.util import round_half_up_scalar

    def undirect(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t.column("src"), t.column("dst"))
        b = pc.max_element_wise(t.column("src"), t.column("dst"))
        tbl = pa.table({"a": a, "b": b})
        return tbl.filter(pc.not_equal(tbl.column("a"), tbl.column("b")))

    und = distinct_values(
        edges.map_batches(undirect, batch_format="pyarrow"),
        ["a", "b"]).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "n_edges": pa.array([0], pa.int64()),
            "assortativity": pa.array([0.0], pa.float64())}))

    def stack(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("a").combine_chunks().cast(pa.string()),
             t.column("b").combine_chunks().cast(pa.string())])})

    deg = combined_groupby_count(
        und.map_batches(stack, batch_format="pyarrow"), ["node"],
        alias="deg")
    e1 = hash_join(und, deg.map_batches(
        lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"),
        on="a")
    e2 = hash_join(e1, deg.map_batches(
        lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"),
        on="b")

    def moments(t: pa.Table) -> pa.Table:
        da = np.asarray(t.column("da").to_pylist(), np.float64)
        db = np.asarray(t.column("db").to_pylist(), np.float64)
        # both orientations of each undirected edge enter the sample
        x = np.concatenate([da, db])
        y = np.concatenate([db, da])
        return pa.table({
            "n": pa.array([float(len(x))], pa.float64()),
            "sx": pa.array([float(x.sum())], pa.float64()),
            "sxx": pa.array([float((x * x).sum())], pa.float64()),
            "sxy": pa.array([float((x * y).sum())], pa.float64()),
        })

    parts = e2.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    sx = sum(p["sx"] for p in parts)
    sxx = sum(p["sxx"] for p in parts)
    sxy = sum(p["sxy"] for p in parts)
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = 0.0 if den == 0 else num / den
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "assortativity": pa.array([round_half_up_scalar(r, 6)],
                                  pa.float64())}))


def sql_assortativity(edges_src: str) -> str:
    """DuckDB twin of assortativity — same symmetric sample and
    explicit sum formula (x and y marginals coincide, so Σy = Σx and
    Σy² = Σx²)."""
    return f"""
        WITH base AS (SELECT src, dst FROM ({edges_src})
                      WHERE src <> dst),
        und AS (SELECT DISTINCT least(src, dst) AS a,
                       greatest(src, dst) AS b FROM base),
        deg AS (SELECT node, count(*) AS deg FROM
                  (SELECT a AS node FROM und UNION ALL
                   SELECT b FROM und) GROUP BY 1),
        j AS (SELECT d1.deg AS da, d2.deg AS db FROM und
              JOIN deg d1 ON und.a = d1.node
              JOIN deg d2 ON und.b = d2.node),
        s AS (SELECT CAST(2 * count(*) AS DOUBLE) AS n,
                     CAST(sum(da + db) AS DOUBLE) AS sx,
                     CAST(sum(da * da + db * db) AS DOUBLE) AS sxx,
                     CAST(sum(2 * da * db) AS DOUBLE) AS sxy
              FROM j),
        ne AS (SELECT count(*) AS c FROM und)
        SELECT CAST(ne.c AS BIGINT) AS n_edges,
               CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                    ELSE floor((n * sxy - sx * sx)
                               / (n * sxx - sx * sx)
                               * 1000000 + 0.5) / 1000000 END
                 AS assortativity
        FROM s, ne
    """


def transe_export(triples):
    """KG-embedding trainer export (TransE/DistMult input shape):
    every uri->uri triple integer-encoded as (h_id, r_id, t_id)
    against deterministic dense vocabularies — entities indexed 0..N-1
    in lexicographic order, relations likewise (the row_number
    convention, so any engine re-derives identical ids).  Output
    columns: (h_id, r_id, t_id, head, rel, tail) — ids for the
    trainer, names kept so shards stay self-describing.

    Scale shape: entity vocabulary via ONE node sort through the
    distributed exclusive prefix sum (driver reduce bounded by block
    count); the relation vocabulary is predicate-sized (collected —
    it IS the schema); triples take two stats-gated hash joins to
    attach entity ids and a broadcast map for relation ids."""
    import pyarrow.compute as pc

    from octoray.query import (distinct_values, hash_join,
                               sorted_prefix_sum)

    def uri_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("object_datatype"),
                              pa.scalar("uri")))
        return pa.table({"head": t.column("subject"),
                         "rel": t.column("predicate"),
                         "tail": t.column("object")})

    rows = triples.map_batches(uri_rows,
                               batch_format="pyarrow").materialize()

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("head").combine_chunks().cast(pa.string()),
             t.column("tail").combine_chunks().cast(pa.string())])})

    nodes = distinct_values(rows.map_batches(ends, batch_format="pyarrow"),
                            ["node"])
    ones = nodes.map_batches(
        lambda t: t.append_column("_one", pa.array([1] * t.num_rows,
                                                   pa.int64())),
        batch_format="pyarrow")
    ent = sorted_prefix_sum(ones, "_one", order_col="node",
                            alias="eid").materialize()

    rels = sorted(set(
        r["rel"] for r in distinct_values(
            rows.select_columns(["rel"]), ["rel"]).take_all()))
    rmap = {r: i for i, r in enumerate(rels)}

    j1 = hash_join(rows, ent.map_batches(
        lambda t: pa.table({"head": t.column("node"),
                            "h_id": t.column("eid")}),
        batch_format="pyarrow"), on="head")
    j2 = hash_join(j1, ent.map_batches(
        lambda t: pa.table({"tail": t.column("node"),
                            "t_id": t.column("eid")}),
        batch_format="pyarrow"), on="tail")

    def finish(t: pa.Table) -> pa.Table:
        r_ids = [rmap[r] for r in t.column("rel").to_pylist()]
        return pa.table({
            "h_id": t.column("h_id").cast(pa.int64()),
            "r_id": pa.array(r_ids, pa.int64()),
            "t_id": t.column("t_id").cast(pa.int64()),
            "head": t.column("head").cast(pa.string()),
            "rel": t.column("rel").cast(pa.string()),
            "tail": t.column("tail").cast(pa.string()),
        })

    return j2.map_batches(finish, batch_format="pyarrow")


def sql_transe_export(src: str) -> str:
    """DuckDB twin of transe_export; boundary: raw emitted triples
    (dedup is NOT applied — the export keeps the deduped stream it is
    given; the query layer passes dedup_triples output, so the twin
    dedups the raw dump first)."""
    return f"""
        WITH d AS (SELECT DISTINCT subject, predicate, object,
                          object_datatype FROM {src}),
        r AS (SELECT subject AS head, predicate AS rel,
                     object AS tail FROM d
              WHERE object_datatype = 'uri'),
        n AS (SELECT head AS node FROM r UNION SELECT tail FROM r),
        ei AS (SELECT node, row_number() OVER (ORDER BY node) - 1
                 AS eid FROM n),
        ri AS (SELECT rel, row_number() OVER (ORDER BY rel) - 1
                 AS rid FROM (SELECT DISTINCT rel FROM r))
        SELECT e1.eid AS h_id, ri.rid AS r_id, e2.eid AS t_id,
               r.head, r.rel, r.tail
        FROM r JOIN ei e1 ON r.head = e1.node
        JOIN ei e2 ON r.tail = e2.node
        JOIN ri ON r.rel = ri.rel
    """


def comention_graph(triples_with_src, *, min_pages: int = 2,
                    max_mentions: int = 64):
    """Entity co-mention graph — the relation-candidate discovery
    step of KG construction: entities whose triples share a source
    page are candidate relation pairs, weighted by how many distinct
    pages co-mention them.  Input: triples WITH the ``src`` lineage
    column (pipelines/kg.build_triples(keep_src=True)); output:
    (entity_a, entity_b, n_pages) canonical a < b, kept when
    co-mentioned on >= ``min_pages`` distinct pages.

    Scale shape: ONE distinct exchange over slim (src, subject)
    pairs, per-page wedge expansion through the shared kernel
    (hub-capped at ``max_mentions`` entities per page, mirrored in
    the twin), map-side pair counts, one slim combine, vectorized
    threshold."""
    import numpy as np
    import pyarrow.compute as pc

    from octoray.query import distinct_values, sorted_groupby_count

    pairs_src = distinct_values(
        triples_with_src.map_batches(
            lambda t: pa.table({"src": t.column("src"),
                                "subject": t.column("subject")}),
            batch_format="pyarrow"),
        ["src", "subject"])

    def pairs_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        df = df.sort_values(["src", "subject"], kind="mergesort")
        srcs, counts = np.unique(df["src"].to_numpy(), return_counts=True)
        keep = counts <= max_mentions
        if not keep.all():
            ok = set(srcs[keep])
            df = df[df["src"].isin(ok)]
            srcs, counts = np.unique(df["src"].to_numpy(),
                                     return_counts=True)
        a, b = _within_group_pairs(counts, df["subject"].to_numpy())
        return pd.DataFrame({"a": a, "b": b})

    pairs = colocated_sort(pairs_src, ["src"]).map_batches(
        pairs_block, batch_format="pandas", batch_size=None)
    counts = sorted_groupby_count(pairs, ["a", "b"], alias="n_pages")
    return counts.map_batches(
        lambda t: pa.table({
            "entity_a": t.column("a"), "entity_b": t.column("b"),
            "n_pages": t.column("n_pages")}).filter(
            pc.greater_equal(t.column("n_pages"),
                             pa.scalar(int(min_pages)))),
        batch_format="pyarrow")


def sql_comention_graph(src: str, *, min_pages: int = 2,
                        max_mentions: int = 64) -> str:
    """DuckDB twin of comention_graph; boundary: the raw keep-src
    triple dump."""
    return f"""
        WITH m AS (SELECT DISTINCT src, subject FROM {src}),
        ok AS (SELECT src FROM m GROUP BY src
               HAVING count(*) <= {int(max_mentions)}),
        p AS (SELECT m1.subject AS a, m2.subject AS b
              FROM m m1 JOIN m m2
                ON m1.src = m2.src AND m1.subject < m2.subject
              WHERE m1.src IN (SELECT src FROM ok)),
        c AS (SELECT a, b, count(*) AS n FROM p GROUP BY 1, 2)
        SELECT a AS entity_a, b AS entity_b, n AS n_pages FROM c
        WHERE n >= {int(min_pages)}
    """
