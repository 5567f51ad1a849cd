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
import pyarrow.compute as pc

from octoray.query import hash_join, sorted_groupby_count
from octoray.util import round_half_up_scalar

from octoray.plan import colocated_sort


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

    return colocated_sort(scored, [id_col]).map_batches(
        topk_block, batch_format="pandas", batch_size=None)


def bm25_topk(docs, terms, *, k: int = 10, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text"):
    """BM25 ranked retrieval: the corpus's top-k documents for a fixed
    query-term set.  Output: (id, score) — score DESC, id ASC.

    Plan (one pass + two tiny exchanges): a combiner pass yields the
    corpus stats (N, total token length -> avgdl) as ONE row per block;
    the tf explode is restricted to the query terms INSIDE the batch
    (rows out are bounded by |terms| x docs-containing-a-term, never
    the vocabulary); df per term is an aggregate over those already
    (doc,term)-distinct rows, bounded by |terms| — broadcast back as a
    plain dict.  Scores are quantized to integer micro-units BEFORE the
    per-doc sum so the reduction is order-free and exactly matches the
    SQL twin regardless of summation order.  The final top-k prunes
    per block before one small sort+limit.

    Scale note: everything that shuffles is either O(|terms|) (df) or
    O(matching (doc,term) rows) (per-doc sum) — the corpus itself is
    read once and never re-keyed.
    """
    import numpy as np

    terms = sorted(set(terms))
    term_set = frozenset(terms)

    # corpus stats: one partial row per block
    def stats(t: pa.Table) -> pa.Table:
        dls = [len(x.split()) for x in t.column(text_col).to_pylist()]
        return pa.table({"n": pa.array([len(dls)], pa.int64()),
                         "sdl": pa.array([int(sum(dls))], pa.int64())})

    parts = docs.map_batches(stats, batch_format="pyarrow",
                             batch_size=None).take_all()
    n_docs = sum(r["n"] for r in parts)
    sum_dl = sum(r["sdl"] for r in parts)
    if n_docs == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    avgdl = float(sum_dl) / float(n_docs)

    def term_freqs(t: pa.Table) -> pa.Table:
        ids_out, toks, tfs, dls = [], [], [], []
        for i, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            ws = text.split()
            cnt = Counter(w for w in ws if w in term_set)
            for tok, n in cnt.items():
                ids_out.append(i)
                toks.append(tok)
                tfs.append(n)
                dls.append(len(ws))
        return pa.table({
            id_col: pa.array(ids_out, t.schema.field(id_col).type),
            "term": pa.array(toks, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
        })

    tf = docs.map_batches(term_freqs, batch_format="pyarrow").materialize()

    # df per term: rows are already (doc, term)-distinct, and the
    # result is bounded by |terms| — a driver dict is the broadcast
    from octoray.query import sorted_groupby_count, sorted_groupby_sum

    df_rows = sorted_groupby_count(
        tf.select_columns(["term"]), ["term"], alias="df").take_all()
    dfmap = {r["term"]: r["df"] for r in df_rows}

    nd = float(n_docs)

    def score(t: pa.Table) -> pa.Table:
        tfv = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = np.array([dfmap[x] for x in t.column("term").to_pylist()],
                       dtype=np.float64)
        # parenthesization mirrors the SQL twin exactly (IEEE-identical)
        idf = np.log(1.0 + (nd - dfv + 0.5) / (dfv + 0.5))
        s = (idf * (tfv * (k1 + 1.0))) / (
            tfv + k1 * (1.0 - b + b * (dl / avgdl)))
        micros = np.floor(s * 1000000.0 + 0.5).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "micros": pa.array(micros, pa.int64())})

    per_doc = sorted_groupby_sum(
        tf.map_batches(score, batch_format="pyarrow"), [id_col], "micros",
        alias="micros")

    def finish(t: pa.Table) -> pa.Table:
        sv = pc.divide(pc.cast(t.column("micros"), pa.float64()), 1000000.0)
        out = pa.table({id_col: t.column(id_col), "score": sv})
        # per-block prune before the global top-k sort
        order = pc.sort_indices(out, sort_keys=[("score", "descending"),
                                                (id_col, "ascending")])
        return out.take(order[:k])

    pruned = per_doc.map_batches(finish, batch_format="pyarrow",
                                 batch_size=None)
    return pruned.sort(["score", id_col], descending=[True, False]).limit(k)


def sql_bm25_topk(table: str, terms, *, k: int = 10, k1: float = 1.2,
                  b: float = 0.75, id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """DuckDB twin of ``bm25_topk`` — identical formula shape, integer
    micro-unit summation, identical tie order."""
    tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return rf"""
        WITH tk AS (SELECT {id_col},
                           regexp_extract_all({text_col}, '\S+') AS t
                    FROM {table}),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      CAST(sum(len(t)) AS BIGINT) AS sdl FROM tk),
        tok AS (SELECT {id_col}, len(t) AS dl, unnest(t) AS term FROM tk),
        tf AS (SELECT {id_col}, term, dl, CAST(count(*) AS BIGINT) AS tf
               FROM tok WHERE term IN ({tl}) GROUP BY 1, 2, 3),
        dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        sc AS (SELECT {id_col},
                 CAST(floor(((ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
                      * (CAST(tf.tf AS DOUBLE) * ({k1} + 1.0)))
                      / (CAST(tf.tf AS DOUBLE)
                         + {k1} * (1.0 - {b} + {b} * (CAST(tf.dl AS DOUBLE)
                                  / (CAST(st.sdl AS DOUBLE) / st.n)))))
                      * 1000000.0 + 0.5) AS BIGINT) AS micros
               FROM tf JOIN dfq USING (term) CROSS JOIN st)
        SELECT {id_col}, CAST(sum(micros) AS DOUBLE) / 1000000.0 AS score
        FROM sc GROUP BY 1 ORDER BY score DESC, {id_col} LIMIT {k}
    """
