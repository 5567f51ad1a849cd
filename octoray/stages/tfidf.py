"""TF-IDF keyword extraction: top-k scoring tokens per document.

The classic corpus-statistics op (doc tagging / retrieval features):
term frequency per (doc, token), document frequency per token over
the whole corpus, score = tf * ln(N / df), keep each document's k
best (score DESC, token ASC — a unique total order, so the k-boundary
is deterministic).

Plan: one explode pass (per-doc Counter -> one row per (doc, token)),
one small-row shuffle for df (the (doc,token) rows are ALREADY
distinct per token-doc, so df is a row count), a stats-gated
broadcast join of the vocab-sized df table back onto the tf rows, and
one doc-keyed sort for the per-group top-k.  N comes from a metadata
count, not a scan.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pyarrow as pa

from octoray.query import hash_join, sorted_groupby_count
from octoray.util import round_half_up_scalar


def doc_term_freqs(batch: pa.Table, *, id_col: str,
                   text_col: str) -> pa.Table:
    ids_out: list = []
    toks: list = []
    tfs: list = []
    for i, text in zip(batch.column(id_col).to_pylist(),
                       batch.column(text_col).to_pylist()):
        for tok, n in Counter(text.split()).items():
            ids_out.append(i)
            toks.append(tok)
            tfs.append(n)
    return pa.table({
        id_col: pa.array(ids_out, batch.schema.field(id_col).type),
        "token": pa.array(toks, pa.string()),
        "tf": pa.array(tfs, pa.int64()),
    })


def tfidf_keywords(docs, *, k: int = 3, id_col: str = "doc_id",
                   text_col: str = "text"):
    """(id, token, tfidf) — each doc's k highest-scoring tokens."""
    n_docs = docs.count()
    tf = docs.map_batches(
        lambda t: doc_term_freqs(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    df_tbl = sorted_groupby_count(
        tf.select_columns(["token"]), ["token"], alias="df")
    joined = hash_join(tf, df_tbl, on="token")

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        s = pdf["tf"].to_numpy(float) * np.log(float(n_docs)
                                               / pdf["df"].to_numpy(float))
        return pd.DataFrame({
            id_col: pdf[id_col], "token": pdf["token"], "_s": s})

    scored = joined.map_batches(score, batch_format="pandas")

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-block top-k: one sort + cumcount, no per-group
        # DataFrame dispatch (docs co-locate per the sorted-block
        # invariant — sort key == group key)
        if not len(df):
            return pd.DataFrame({id_col: [], "token": [], "tfidf": []})
        df = df.sort_values([id_col, "_s", "token"],
                            ascending=[True, False, True], kind="mergesort")
        df = df[df.groupby(id_col, sort=False).cumcount() < k]
        return pd.DataFrame({
            id_col: df[id_col], "token": df["token"],
            "tfidf": [round_half_up_scalar(v, 6) for v in df["_s"]],
        })

    return scored.sort([id_col]).map_batches(
        topk_block, batch_format="pandas", batch_size=None)
