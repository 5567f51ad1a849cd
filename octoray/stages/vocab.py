"""Corpus-wide n-gram vocabulary: global top-k most frequent token
n-grams — the counting core of tokenizer/vocab training and of
stop-phrase mining.

Plan (one small-row shuffle, no full sort of the raw gram stream):
  per batch: hash-count grams locally -> (gram, n) partial rows
             [map-side combiner: moves one row per DISTINCT gram per
              block, not one per occurrence]
  one range sort on gram + block-local sum  -> exact global counts
  per-block top-k -> tiny (blocks x k) table -> global sort + limit k

The final total order (count DESC, gram ASC) is unique per gram, so
the k-boundary is deterministic across partitionings and reruns.
Tokenization is whitespace, identical to textops/decontam and the
DuckDB twin.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from octoray.query import sorted_groupby_sum


def ngram_partial_counts(batch: pa.Table, *, n: int,
                         text_col: str = "text") -> pa.Table:
    c: Counter = Counter()
    for text in batch.column(text_col).to_pylist():
        toks = text.split()
        c.update(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
    return pa.table({
        "gram": pa.array(list(c.keys()), pa.string()),
        "n": pa.array(list(c.values()), pa.int64()),
    })


def top_ngrams(docs, *, n: int = 2, k: int = 100,
               text_col: str = "text"):
    """(gram, count) of the k most frequent token n-grams corpus-wide."""
    partial = docs.map_batches(
        lambda t: ngram_partial_counts(t, n=n, text_col=text_col),
        batch_format="pyarrow",
    )
    counts = sorted_groupby_sum(partial, ["gram"], "n", alias="count")

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pa.compute.sort_indices(
            t, sort_keys=[("count", "descending"), ("gram", "ascending")])
        return t.take(idx[:k])

    pruned = counts.map_batches(block_topk, batch_format="pyarrow",
                                batch_size=None)
    return pruned.sort(["count", "gram"], descending=[True, False]).limit(k)


def inverted_index(docs, *, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 1):
    """Token -> '+'-joined sorted posting list (the search-index build;
    list serialization follows the engine's pivot convention so the
    SQL twin is a string_agg).  Plan: per-doc DISTINCT tokens -> one
    row per (token, doc) -> one token-keyed sort -> block-local
    vectorized group-concat.  ``min_df`` drops hapax tokens before
    emission to keep the index small (logged effect visible in the
    df column)."""
    import pandas as pd

    def explode(t: pa.Table) -> pa.Table:
        ids: list = []
        toks: list = []
        for i, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            for tok in set(text.split()):
                ids.append(i)
                toks.append(tok)
        return pa.table({"token": pa.array(toks, pa.string()),
                         id_col: pa.array(ids, t.schema.field(id_col).type)})

    pairs = docs.map_batches(explode, batch_format="pyarrow")

    def concat_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"token": [], "df": [], "postings": []})
        df = df.sort_values(["token", id_col], kind="mergesort")
        g = df.groupby("token", sort=False)
        out = pd.DataFrame({
            "df": g.size().astype("int64"),
            "postings": g[id_col].agg(
                lambda s: "+".join(str(v) for v in s)),
        }).reset_index()
        return out[out["df"] >= min_df]

    return pairs.sort(["token"]).map_batches(
        concat_block, batch_format="pandas", batch_size=None)
