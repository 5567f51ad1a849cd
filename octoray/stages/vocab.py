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

from octoray.plan import colocated_sort


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

    return colocated_sort(pairs, ["token"]).map_batches(
        concat_block, batch_format="pandas", batch_size=None)


def heavy_hitters(docs, *, phi: float = 0.001, text_col: str = "text",
                  slack: int = 4):
    """Exact frequent-token discovery WITHOUT a full-vocabulary
    shuffle: tokens whose corpus frequency is at least ``phi * N``
    (N = total token count), via block-frequent candidate generation —
    the Misra-Gries heavy-hitters guarantee with exact block counts.

    The 100-TB shape:

      1. Per block, ONE vectorized count (shared Arrow tokenizer +
         np.unique) keeps the tokens with block frequency
         > n_block / k, k = slack/phi.  At most k tokens can exceed
         n_b/k, so each summary is <= k rows and the driver union is
         bounded by k x blocks.  Completeness: a token with global
         frequency F >= phi*N must exceed n_b/k in SOME block (if
         f_b <= n_b/k everywhere, summing gives F <= N/k = phi*N/slack
         < F for slack > 1) — so every phi-heavy token is a candidate.
      2. ONE exact counting pass restricted to the broadcast candidate
         set (np.isin per block + a small groupby over candidates
         only) — the final (token, count) output is EXACT and the SQL
         oracle is a plain HAVING count >= ceil(phi * N).

    The full-vocabulary ``sorted_groupby_sum`` this replaces shuffles
    every distinct token; here only |candidates| <= k x blocks rows
    move, bounded regardless of corpus size.  Returns (token, count)
    for count >= ceil(phi * N), sorted by (count desc, token)."""
    import math as _math

    import numpy as np

    from octoray.query import sorted_groupby_sum
    from octoray.stages.dedup import _flat_tokens

    k = max(2, int(_math.ceil(slack / phi)))

    def block_frequent(t: pa.Table) -> pa.Table:
        _, flat = _flat_tokens(t.column(text_col))
        toks = flat.to_numpy(zero_copy_only=False)
        n_b = len(toks)
        if n_b == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "_n_tok": pa.array([], pa.int64())})
        uniq, counts = np.unique(toks, return_counts=True)
        keep = counts > n_b / k
        out = uniq[keep]
        n_col = np.zeros(len(out), np.int64)
        if len(out):
            n_col[0] = n_b
            return pa.table({"token": pa.array(out, pa.string()),
                             "_n_tok": pa.array(n_col, pa.int64())})
        return pa.table({"token": pa.array(["\x00none"], pa.string()),
                         "_n_tok": pa.array([n_b], pa.int64())})

    summaries = docs.map_batches(block_frequent, batch_format="pyarrow"
                                 ).take_all()  # bounded: <= k rows/block
    candidates = np.array(sorted({r["token"] for r in summaries}
                                 - {"\x00none"}))
    total = sum(r["_n_tok"] for r in summaries)
    thresh = max(1, int(_math.ceil(phi * total)))
    if not len(candidates):
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "token": pa.array([], pa.string()),
            "count": pa.array([], pa.int64())}))

    import ray

    cand_ref = ray.put(candidates)

    def exact_counts(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        _, flat = _flat_tokens(t.column(text_col))
        toks = flat.to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        hit = toks[np.isin(toks, cand)]
        uniq, counts = np.unique(hit, return_counts=True)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    exact = sorted_groupby_sum(
        docs.map_batches(exact_counts, batch_format="pyarrow"),
        ["token"], "n", alias="count")

    def keep_heavy(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.greater_equal(
            t.column("count"), pa.scalar(thresh)))

    return exact.map_batches(keep_heavy, batch_format="pyarrow").sort(
        ["count", "token"], descending=[True, False])


def oov_rate(docs, *, vocab_size: int = 1000, id_col: str = "doc_id",
             text_col: str = "text"):
    """Per-document out-of-vocabulary rate against the corpus-global
    top-``vocab_size`` unigram vocabulary — the classic cheap
    language-quality signal (gibberish / non-language / wrong-corpus
    docs score high OOV even when length and punctuation look fine).

    Two passes, zero corpus shuffle: pass 1 is :func:`top_ngrams`
    (n=1) — exact global counts via the map-side-combiner sort plan,
    deterministic (count DESC, token ASC) boundary — whose k-row
    result broadcasts ONCE via ray.put; pass 2 streams documents
    through one vectorized np.isin per batch (sorted-vocab binary
    search).  Whitespace tokenization is the house ``_flat_tokens``
    (identical to the '\\S+' SQL twin).  Documents with zero tokens
    emit no row (mirrors the twin's token-CTE join semantics).

    Output: (doc_id, n_tokens, n_oov, oov_rate float64)."""
    import numpy as np
    import ray

    from octoray.stages.dedup import _flat_tokens

    vocab_rows = top_ngrams(docs, n=1, k=vocab_size,
                            text_col=text_col).take_all()
    vocab = np.sort(np.array([r["gram"] for r in vocab_rows], object))
    ref = ray.put(vocab)

    def f(t: pa.Table) -> pa.Table:
        import ray as _ray

        v = _ray.get(ref)
        lens, flat = _flat_tokens(t.column(text_col))
        oov = ~np.isin(flat.to_numpy(zero_copy_only=False), v)
        idx = np.repeat(np.arange(len(lens)), lens)
        n_oov = np.bincount(idx, weights=oov,
                            minlength=len(lens)).astype(np.int64)
        mask = lens > 0
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[mask]
        nt = lens[mask]
        no = n_oov[mask]
        return pa.table({
            id_col: pa.array(ids, t.schema.field(id_col).type),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_oov": pa.array(no, pa.int64()),
            "oov_rate": pa.array(no.astype(np.float64)
                                 / nt.astype(np.float64), pa.float64()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def sql_oov_rate(*, vocab_size: int = 1000) -> str:
    """DuckDB twin of :func:`oov_rate` over the ``documents`` view:
    identical top-V vocabulary boundary and int64->double division."""
    return f"""
        WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
                     FROM documents),
        cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        voc AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT {vocab_size}),
        per AS (SELECT t.doc_id, count(*) AS n_tokens,
                       sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
                FROM tok t LEFT JOIN voc v ON t.w = v.w
                GROUP BY t.doc_id)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_oov AS BIGINT) AS n_oov,
               CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
        FROM per
    """


def zipf_fit(docs, *, top_n: int = 1000, text_col: str = "text"):
    """One-row Zipf-law fit of the corpus unigram distribution: OLS
    slope of ln(count) against ln(rank) over the top-``top_n`` tokens
    (natural text sits near -1; a corpus drifting far off is
    boilerplate-heavy or synthetic — the quickest corpus-health
    number there is).  Output: (n_top, zipf_slope) with the slope in
    the explicit sum formula (n·Σxy - Σx·Σy) / (n·Σxx - Σx²), the
    same operand order as the SQL twin, rounded half-up to 6.

    Pass 1 is top_ngrams' exact global count (map-side combiners,
    deterministic count-desc/token-asc boundary); the regression runs
    on the driver over ``top_n`` rows."""
    import numpy as np

    import ray.data as rd

    rows = top_ngrams(docs, n=1, k=top_n, text_col=text_col).take_all()
    rows.sort(key=lambda r: (-r["count"], r["gram"]))
    n = len(rows)
    if n < 2:
        return rd.from_arrow(pa.table({
            "n_top": pa.array([n], pa.int64()),
            "zipf_slope": pa.array([0.0], pa.float64())}))
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(np.array([r["count"] for r in rows], np.float64))
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    import math

    return rd.from_arrow(pa.table({
        "n_top": pa.array([n], pa.int64()),
        "zipf_slope": pa.array(
            [math.floor(slope * 1e6 + 0.5) / 1e6], pa.float64())}))


def sql_zipf_fit(*, top_n: int = 1000) -> str:
    """DuckDB twin of zipf_fit (same top-N boundary, same explicit
    sum formula and operand order)."""
    return rf"""
        WITH tokens AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                          AS t FROM documents),
        cnt AS (SELECT t, count(*) AS c FROM tokens GROUP BY t),
        top AS (SELECT c, row_number() OVER (ORDER BY c DESC, t)
                  AS rnk FROM cnt
                ORDER BY c DESC, t LIMIT {int(top_n)}),
        v AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x,
                     ln(CAST(c AS DOUBLE)) AS y FROM top),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
                     sum(y) AS sy, sum(x * x) AS sxx,
                     sum(x * y) AS sxy FROM v)
        SELECT CAST(n AS BIGINT) AS n_top,
               floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                     * 1000000 + 0.5) / 1000000 AS zipf_slope
        FROM s
    """
