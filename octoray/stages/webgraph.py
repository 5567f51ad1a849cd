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

__all__ = ["links_dataset", "anchor_summary", "internal_edges",
           "link_rank", "hits_rank", "sql_extract_links",
           "sql_anchor_summary", "sql_internal_edges"]


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

    return links.sort(["dst"]).map_batches(
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
              driver_limit: int = 5_000_000):
    """PageRank over the internal page-level link graph (the
    cc-webgraph rank release, page granularity).  Hub-skewed
    in-degree (the synthesis plants 64 super-hub targets) exercises
    the hot-key path the north rule names."""
    from octoray.stages.graphalgo import pagerank_edges

    return pagerank_edges(internal_edges(links), damping=damping,
                          n_iters=n_iters, driver_limit=driver_limit)


def harmonic_rank(links, *, n_sources: int = 12, max_hops: int = 4,
                  driver_limit: int = 5_000_000):
    """Sampled harmonic centrality over the internal link graph —
    cc-webgraph's harmonic-rank release at page granularity."""
    from octoray.stages.graphalgo import harmonic_centrality

    return harmonic_centrality(internal_edges(links), n_sources=n_sources,
                               max_hops=max_hops, driver_limit=driver_limit)


def hits_rank(links, *, n_iters: int = 5, driver_limit: int = 5_000_000):
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
