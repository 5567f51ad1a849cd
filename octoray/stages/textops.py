"""Text analysis operators for large-scale corpus processing.

Beyond the reference's operator set (SURVEY.md 'training-data ops'):
language-ID, quality scoring, token counting, document fingerprinting.
All are stateless vectorized ``map_batches`` stages over the
``documents`` table schema (doc_id, text, lang, source, n_chars); the
stopword profiles / compiled regexes are module-level (built once per
worker process).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from octoray.plan import colocated_sort

from octoray import plan

_TOKEN_RE = r"\S+"
_WORD_RE = r"[A-Za-z]+"
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
# (the GPT-2 pattern family, simplified to ASCII classes)
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny stopword profiles for n-gram-free language ID (heuristic)
_LANG_PROFILES: Dict[str, frozenset] = {
    "en": frozenset("the of and to in a is that it for on with as are was".split()),
    "es": frozenset("el la de que y en los se del las un por con no una".split()),
    "fr": frozenset("le la de et les des en un du que pour dans ce une".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist".split()),
}


def token_counts(batch: pa.Table) -> pa.Table:
    """doc_id + n_tokens (whitespace tokens) + n_bpe (BPE-ish pieces).
    Pure pyarrow kernels — no Python loop."""
    toks = pc.count_substring_regex(batch.column("text"), _TOKEN_RE)
    bpe = pc.count_substring_regex(batch.column("text"), _BPE_RE)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(toks, pa.int64()),
            "n_bpe": pc.cast(bpe, pa.int64()),
        }
    )


def quality_scores(batch: pa.Table) -> pa.Table:
    """Length / character-class / stopword quality signals, vectorized."""
    text = batch.column("text")
    n_chars = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, _TOKEN_RE)
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]")
    n_digit = pc.count_substring_regex(text, r"[0-9]")
    n_upper = pc.count_substring_regex(text, r"[A-Z]")
    n_punct = pc.count_substring_regex(text, r"[.,;:!?]")
    denom = pc.max_element_wise(pc.cast(n_chars, pa.float64()), 1.0)
    tok_denom = pc.max_element_wise(pc.cast(n_tokens, pa.float64()), 1.0)
    # stopword ratio needs tokenization; do it with one regex count per
    # stopword alternation (still a C-level scan)
    stop_alt = "|".join(sorted(_LANG_PROFILES["en"]))
    n_stop = pc.count_substring_regex(text, rf"(?i)\b(?:{stop_alt})\b")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "alpha_ratio": pc.divide(pc.cast(n_alpha, pa.float64()), denom),
            "digit_ratio": pc.divide(pc.cast(n_digit, pa.float64()), denom),
            "upper_ratio": pc.divide(pc.cast(n_upper, pa.float64()), denom),
            "punct_per_token": pc.divide(pc.cast(n_punct, pa.float64()), tok_denom),
            "stop_per_token": pc.divide(pc.cast(n_stop, pa.float64()), tok_denom),
        }
    )


_LANG_ORDER = list(_LANG_PROFILES)  # priority order on exact ties


def lang_pattern(lang: str) -> str:
    """The per-language stopword alternation (shared with the DuckDB
    oracle so both engines count the identical regex)."""
    return rf"(?i)\b(?:{'|'.join(sorted(_LANG_PROFILES[lang]))})\b"


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stateless language ID (stopword-profile voting) for the plain
    TASK pool: the patterns are module-level strings and the scans are
    Arrow C-level regex counts, so there is no per-actor state to
    justify an actor pool — a fixed pool of 2 actors was measured to
    STARVE this stage while sibling task-pool stages scaled (VERDICT
    r1 #9)."""
    return _lang_id(batch, {lang: lang_pattern(lang) for lang in _LANG_ORDER})


def _lang_id(batch: pa.Table, patterns: Dict[str, str]) -> pa.Table:
    text = batch.column("text")
    counts = np.stack(
        [
            np.asarray(pc.count_substring_regex(text, pat).combine_chunks())
            for pat in patterns.values()
        ]
    )  # (n_langs, n_docs)
    best_idx = counts.argmax(axis=0)  # first max wins
    best_n = counts.max(axis=0)
    n_tok = np.maximum(
        np.asarray(pc.count_substring_regex(text, _TOKEN_RE).combine_chunks()), 1
    )
    langs = np.where(best_n > 0, np.array(_LANG_ORDER)[best_idx], "unknown")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(langs.tolist(), pa.string()),
            "lang_score": pa.array((best_n / n_tok).tolist(), pa.float64()),
        }
    )


class LangId:
    """Actor-pool language ID: stopword-profile voting.

    Vectorized: one Arrow regex-count scan per language over the whole
    batch, then a numpy argmax (first max wins — the profile priority
    order).  The alternation strings are built once per actor."""

    def __init__(self):
        self.patterns = {lang: lang_pattern(lang) for lang in _LANG_ORDER}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _lang_id(batch, self.patterns)


def train_val_split(docs, *, val_frac: float = 0.1, id_col: str = "doc_id"):
    """Deterministic hash-based train/val assignment — the export-side
    op a training pipeline runs before writing shards.  split = 'val'
    iff md5(str(id))[:8] as a 32-bit fraction < val_frac; stable under
    any partitioning/parallelism and reproducible in SQL (the DuckDB
    oracle computes the identical expression)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        fracs = [
            int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) / 4294967296.0
            for v in ids.to_pylist()
        ]
        split = ["val" if x < val_frac else "train" for x in fracs]
        return pa.table(
            {id_col: ids, "split": pa.array(split, pa.string())}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def mixture_resample(docs, rates: Dict[str, float], *,
                     key_col: str = "source", id_col: str = "doc_id",
                     default_rate: float = 1.0):
    """Deterministic domain-mixture resampling — the data-mixing step
    a training pipeline runs to hit target per-source proportions
    (DoReMi / Pile-style source reweighting at export time): keep a
    row iff md5-frac(id) < rates[source] (default_rate for sources
    not in the table).

    Same md5(str(id))[:8]/2^32 convention as train_val_split, so the
    decision is stable under any partitioning/parallelism, composes
    with the hash split (independent bits), and the DuckDB oracle
    reproduces it exactly.  The rates table is one row per SOURCE
    (dozens, not corpus-scale) and ships in the task closure — no
    broadcast, no shuffle; the op is a streaming filter."""

    def f(df):
        fr = df[id_col].map(
            lambda v: int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
            / 4294967296.0
        )
        r = df[key_col].map(rates).fillna(default_rate)
        return df[fr < r]

    return docs.map_batches(f, batch_format="pandas")


def sql_mixture_resample(rates: Dict[str, float], *,
                         table: str = "documents", key_col: str = "source",
                         id_col: str = "doc_id",
                         default_rate: float = 1.0) -> str:
    """DuckDB twin generated from the SAME rates table (the redact.py
    rule-table convention)."""
    whens = " ".join(
        f"WHEN '{k}' THEN {v!r}" for k, v in sorted(rates.items())
    )
    return f"""
        SELECT {id_col}, {key_col} FROM {table}
        WHERE CAST(CONCAT('0x', substring(md5(CAST({id_col} AS VARCHAR)), 1, 8))
                   AS UBIGINT) / 4294967296.0
              < CASE {key_col} {whens} ELSE {default_rate!r} END
        ORDER BY {id_col}
    """


def shuffle_rank(docs, *, seed: int = 0, id_col: str = "doc_id"):
    """Deterministic global shuffle for training export: every row gets
    ``shuffle_pos`` = its rank under ascending md5(seed:id) — the
    reproducible permutation an epoch reader consumes in order, stable
    under any partitioning/parallelism (unlike ds.random_shuffle, whose
    layout depends on the block structure).

    Plan: one md5 key per row (the train_val_split convention, so the
    DuckDB twin is exact), then query.sorted_prefix_sum of ones over
    the key — ONE sort, driver reduce bounded by block count.  md5
    keys of distinct ids are unique at any real scale, satisfying the
    prefix sum's unique-order-col contract; the oracle orders by the
    same expression."""
    from octoray.query import sorted_prefix_sum

    def key(df):
        import pandas as pd

        return pd.DataFrame({
            id_col: df[id_col],
            "_sk": df[id_col].map(
                lambda v: hashlib.md5(f"{seed}:{v}".encode()).hexdigest()),
            "_one": 1,
        })

    keyed = docs.map_batches(key, batch_format="pandas")
    ranked = sorted_prefix_sum(keyed, "_one", order_col="_sk",
                               alias="shuffle_pos")
    return ranked.map_batches(
        lambda t: t.select([id_col, "shuffle_pos"]), batch_format="pyarrow")


def sql_shuffle_rank(*, seed: int = 0, table: str = "documents",
                     id_col: str = "doc_id") -> str:
    """DuckDB twin: row_number over the same md5 ordering."""
    return f"""
        SELECT {id_col},
               CAST(row_number() OVER (
                   ORDER BY md5(concat('{seed}:',
                                CAST({id_col} AS VARCHAR)))) - 1
                    AS BIGINT) AS shuffle_pos
        FROM {table}
    """


def _norm_ws(batch_text: pa.Array) -> pa.Array:
    """Whitespace-collapse + lowercase normalization (shared with the
    DuckDB oracle: lower(regexp_replace(text, '\\s+', ' ', 'g')))."""
    collapsed = pc.replace_substring_regex(batch_text, r"\s+", " ")
    return pc.utf8_lower(collapsed)


def fingerprints(batch: pa.Table) -> pa.Table:
    """Content fingerprints: md5 of normalized text (exact-dup key,
    the chksum analogue — reference hash.py:7-13) + a 64-bit rolling
    polynomial hash (rabin-style) over the same normalization."""
    norm = _norm_ws(batch.column("text")).to_pylist()
    md5s: List[str] = []
    rolling: List[int] = []
    B = 1000003
    M = (1 << 61) - 1
    for t in norm:
        md5s.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        h = 0
        for ch in t.encode("utf-8"):
            h = (h * B + ch) % M
        rolling.append(h)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "md5": pa.array(md5s, pa.string()),
            "rolling64": pa.array(rolling, pa.int64()),
        }
    )


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document (the standard
    LLM-corpus quality filters beyond length/ratio scores):

      n_lines          non-blank lines
      dup_line_frac    1 - distinct_lines / lines
      top_bigram_frac  occurrences of the most frequent word bigram
                       over all bigram occurrences
      dup_5gram_frac   1 - distinct 5-grams / total 5-grams

    Tokenization is whitespace (str.split == regex \\S+ — identical to
    token_counts and the DuckDB twin).  Distinct-counting per doc is
    inherently a per-doc hash aggregation; docs are a few hundred
    tokens, so the per-batch Python loop is O(total tokens) with small
    constants (same asymptotics as any vectorization of a ragged
    nested distinct)."""
    from collections import Counter

    from octoray.util import round_half_up_scalar as r6

    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    n_tok: list = []
    n_lines: list = []
    dlf: list = []
    top2: list = []
    d5f: list = []
    for text in texts:
        toks = text.split()
        lines = [ln for ln in text.split("\n") if ln.strip()]
        n_tok.append(len(toks))
        n_lines.append(len(lines))
        dlf.append(r6(1.0 - len(set(lines)) / len(lines), 6) if lines else 0.0)
        n_bi = len(toks) - 1
        if n_bi > 0:
            c = Counter(zip(toks, toks[1:]))
            top2.append(r6(max(c.values()) / n_bi, 6))
        else:
            top2.append(0.0)
        n_g5 = len(toks) - 4
        if n_g5 > 0:
            g5 = {tuple(toks[i:i + 5]) for i in range(n_g5)}
            d5f.append(r6(1.0 - len(g5) / n_g5, 6))
        else:
            d5f.append(0.0)
    return pa.table(
        {
            "doc_id": ids,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "dup_line_frac": pa.array(dlf, pa.float64()),
            "top_bigram_frac": pa.array(top2, pa.float64()),
            "dup_5gram_frac": pa.array(d5f, pa.float64()),
        }
    )


def stratified_sample(docs, *, rates: Dict[str, float],
                      default_rate: float = 0.0,
                      id_col: str = "doc_id", stratum_col: str = "lang"):
    """Deterministic per-stratum subsampling — the data-mixing op
    (downweight overrepresented languages/sources when composing a
    training mix).  keep iff md5(str(id))[:8] as a 32-bit fraction <
    rate(stratum); the same hash convention as train_val_split, so
    mixing and splitting are consistent and reproducible in SQL.
    Stateless streaming filter: no shuffle, stable under any
    partitioning."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        strata = batch.column(stratum_col).to_pylist()
        keep = []
        for v, s in zip(ids.to_pylist(), strata):
            r = rates.get(s, default_rate)
            x = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) / 4294967296.0
            keep.append(x < r)
        return batch.filter(pa.array(keep)).select([id_col, stratum_col])

    return docs.map_batches(f, batch_format="pyarrow")


def length_quantiles(docs, *, probs=(0.5, 0.9, 0.99),
                     value_col: str = "n_chars", stratum_col: str = "lang"):
    """Exact per-stratum quantiles of a bounded-domain value via the
    counting-sort plan: one (stratum, value) count shuffle (small —
    bounded by distinct value levels, NOT corpus rows), then the
    cumulative pick on the driver.  quantile(p) = smallest v with
    cum_count >= ceil(p * total), the inverted-CDF definition the SQL
    twin replicates with window functions.  Returns a pandas frame
    (one row per stratum) — a driver-sized result by construction."""
    import math as _math

    import pandas as _pd

    from octoray.query import sorted_groupby_count

    counts = sorted_groupby_count(
        docs.select_columns([stratum_col, value_col]),
        [stratum_col, value_col], alias="n").take_all()
    by_stratum: Dict[str, list] = {}
    for r in counts:
        by_stratum.setdefault(r[stratum_col], []).append(
            (r[value_col], r["n"]))
    rows = []
    for s in sorted(by_stratum):
        vals = sorted(by_stratum[s])
        total = sum(n for _, n in vals)
        row = {stratum_col: s}
        for p in probs:
            target = _math.ceil(p * total)
            cum = 0
            q = vals[-1][0]
            for v, n in vals:
                cum += n
                if cum >= target:
                    q = v
                    break
            row[f"p{int(p * 100)}"] = q
        rows.append(row)
    return _pd.DataFrame(rows)


def chunk_documents(docs, *, chunk_tokens: int = 64, overlap: int = 8,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Split documents into overlapping fixed-token chunks — the
    context-window preparation step before training/embedding.  Chunks
    start at offsets 0, stride, 2*stride, ... (stride = chunk_tokens -
    overlap) while the offset is inside the doc; the final chunk may be
    short.  Stateless streaming map — no shuffle; a 100 TB corpus
    chunks at read speed."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def f(batch: pa.Table) -> pa.Table:
        ids: list = []
        cids: list = []
        texts: list = []
        ntoks: list = []
        for i, text in zip(batch.column(id_col).to_pylist(),
                           batch.column(text_col).to_pylist()):
            toks = text.split()
            for k, start in enumerate(range(0, len(toks), stride)):
                piece = toks[start:start + chunk_tokens]
                ids.append(i)
                cids.append(k)
                texts.append(" ".join(piece))
                ntoks.append(len(piece))
        return pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            "chunk_id": pa.array(cids, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
            "n_tokens": pa.array(ntoks, pa.int64()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def pack_sequences(docs, *, window_tokens: int = 512,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Sequential context-window packing: documents in id order are
    laid end-to-end by token count; each doc is assigned the training
    bin its first token falls in (offset // window).  Built on the
    distributed exclusive prefix sum (query.sorted_prefix_sum — the
    two-pass scan), so no driver-side row iteration.  Deterministic
    under any partitioning: the scan is keyed by doc id, not block
    layout."""
    from octoray.query import sorted_prefix_sum

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column(text_col), _TOKEN_RE)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pc.cast(n, pa.int64()),
        })

    with_off = sorted_prefix_sum(
        docs.map_batches(counts, batch_format="pyarrow"),
        "n_tokens", order_col=id_col, alias="offset")

    def binify(t: pa.Table) -> pa.Table:
        import numpy as np

        off = np.asarray(t.column("offset").to_numpy(zero_copy_only=False))
        return t.append_column(
            "bin", pa.array(off // window_tokens, pa.int64()))

    return with_off.map_batches(binify, batch_format="pyarrow")


def unigram_logprob(docs, *, id_col: str = "doc_id", text_col: str = "text",
                    broadcast_limit: int = plan.BROADCAST_ROWS):
    """Per-document mean unigram log-probability — the KenLM-style
    perplexity quality filter of CCNet/Gopher pipelines, with the
    language model replaced by the corpus's own unigram distribution
    (self-contained: no external model, deterministic).

    Pass 1 builds the model: block-local token Counters (map-side
    combine, one partial row per distinct token per block) -> one
    token-keyed sort-sum -> (token, n) vocabulary.  Pass 2 scores:
    when the vocabulary fits it is broadcast once via ray.put and each
    doc's tokens are scored in a single vectorized numpy lookup; a
    too-large vocabulary falls back to the fully distributed path
    (explode (doc, token), merge-join the model, per-doc sorted
    sum/count) — same outputs, one extra shuffle.

    Output: (doc_id, n_tokens, mean_logprob) with mean_logprob =
    avg over tokens of ln(count(token) / total_tokens), rounded
    half-up to 6 (the engine/SQL float convention).  Tokenization is
    whitespace, shared with vocab/decontam and the DuckDB twin."""
    from collections import Counter

    import numpy as np

    from octoray.query import sorted_groupby_sum
    from octoray.util import round_half_up

    def partials(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(text.split())
        return pa.table({
            "token": pa.array(list(c.keys()), pa.string()),
            "_n": pa.array(list(c.values()), pa.int64()),
        })

    model = sorted_groupby_sum(
        docs.map_batches(partials, batch_format="pyarrow"),
        ["token"], "_n", alias="n",
    ).materialize()
    vocab_size = model.count()
    total = int(model.sum("n")) if vocab_size else 0

    if vocab_size <= broadcast_limit:
        import ray

        counts: Dict[str, int] = {}
        for b in model.iter_batches(batch_format="pyarrow"):
            counts.update(zip(b.column("token").to_pylist(),
                              b.column("n").to_pylist()))
        ref = ray.put(counts)

        def score(t: pa.Table) -> pa.Table:
            cmap = ray.get(ref)
            keep: List[bool] = []
            n_toks: List[int] = []
            means: List[float] = []
            for text in t.column(text_col).to_pylist():
                toks = text.split()
                keep.append(bool(toks))
                if toks:
                    n_toks.append(len(toks))
                    lp = np.log(
                        np.array([cmap[w] for w in toks], dtype=np.float64)
                        / total
                    )
                    means.append(float(lp.mean()))
            # token-less docs are dropped (both paths and the SQL twin
            # derive rows from the token stream)
            return pa.table({
                id_col: t.column(id_col).filter(pa.array(keep)),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "mean_logprob": round_half_up(
                    pa.array(means, pa.float64()), 6),
            })

        return docs.map_batches(score, batch_format="pyarrow")

    # distributed fallback: vocabulary too big to broadcast
    from octoray.query import merge_join

    def explode(t: pa.Table) -> pa.Table:
        ids: List = []
        toks: List[str] = []
        for i, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            for w in text.split():
                ids.append(i)
                toks.append(w)
        return pa.table({
            id_col: pa.array(ids, t.schema.field(id_col).type),
            "token": pa.array(toks, pa.string()),
        })

    pairs = docs.map_batches(explode, batch_format="pyarrow")
    joined = merge_join(pairs, model, ["token"])

    def lp_partial(t: pa.Table) -> pa.Table:
        lp = pc.ln(pc.divide(pc.cast(t.column("n"), pa.float64()),
                             pa.scalar(float(total))))
        slim = pa.table({id_col: t.column(id_col), "_lp": lp})
        g = slim.group_by([id_col], use_threads=False).aggregate(
            [("_lp", "sum"), ([], "count_all")])
        return g.rename_columns([id_col, "_s", "_c"])

    per_block = joined.map_batches(lp_partial, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by([id_col], use_threads=False).aggregate(
            [("_s", "sum"), ("_c", "sum")])
        g = g.rename_columns([id_col, "_s", "_c"])
        mean = pc.divide(g.column("_s"), pc.cast(g.column("_c"), pa.float64()))
        return pa.table({
            id_col: g.column(id_col),
            "n_tokens": g.column("_c"),
            "mean_logprob": round_half_up(mean, 6),
        })

    return colocated_sort(per_block, [id_col]).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def bigram_logprob(docs, *, id_col: str = "doc_id", text_col: str = "text",
                   broadcast_limit: int = plan.BROADCAST_ROWS):
    """Per-document mean BIGRAM log-probability — the KenLM-style
    perplexity quality filter one order up from
    :func:`unigram_logprob`: position 0 scores against the corpus
    unigram distribution, every later position against the bigram MLE
    p(w_i | w_{i-1}) = c(w_{i-1}, w_i) / c_left(w_{i-1}), where
    c_left counts the left token's non-final occurrences.  (Training
    corpus == scored corpus, so every in-document bigram is in the
    model and no backoff branch is needed.)

    Pass 1 builds both models with map-side combiners (one partial
    row per distinct token/bigram per block) -> one sort-sum each; the
    left-count table derives from the bigram model with a second tiny
    aggregation.  Pass 2 scores: models at or below
    ``broadcast_limit`` rows broadcast once via ray.put with
    vectorized numpy lookups per batch; larger models fall back to
    the fully distributed path (explode (doc, key) rows, merge-join
    each model, per-doc sorted sum/count) — identical outputs, two
    extra shuffles.

    Output: (doc_id, n_tokens, mean_logprob) with the mean over ALL
    positions (first-token unigram term included), rounded half-up to
    6 (the engine/SQL float convention).  Token-less docs drop, as in
    the unigram scorer."""
    from collections import Counter

    import numpy as np

    from octoray.query import merge_join, sorted_groupby_sum
    from octoray.util import round_half_up

    SEP = "\x1f"

    def uni_partials(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(text.split())
        return pa.table({
            "token": pa.array(list(c.keys()), pa.string()),
            "_n": pa.array(list(c.values()), pa.int64()),
        })

    def bi_partials(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            toks = text.split()
            c.update(a + SEP + b for a, b in zip(toks, toks[1:]))
        return pa.table({
            "bigram": pa.array(list(c.keys()), pa.string()),
            "_n": pa.array(list(c.values()), pa.int64()),
        })

    uni = sorted_groupby_sum(
        docs.map_batches(uni_partials, batch_format="pyarrow"),
        ["token"], "_n", alias="n1").materialize()
    big = sorted_groupby_sum(
        docs.map_batches(bi_partials, batch_format="pyarrow"),
        ["bigram"], "_n", alias="n2").materialize()
    total = int(uni.sum("n1")) if uni.count() else 0

    def left_counts(t: pa.Table) -> pa.Table:
        lw = pc.split_pattern(t.column("bigram"), SEP)
        lefts = pc.list_element(lw, 0)
        s = pa.table({"token": lefts, "_n": t.column("n2")})
        g = s.group_by(["token"], use_threads=False).aggregate(
            [("_n", "sum")])
        return g.rename_columns(["token", "_n"])

    lefts = sorted_groupby_sum(
        big.map_batches(left_counts, batch_format="pyarrow"),
        ["token"], "_n", alias="nl").materialize()

    if big.count() <= broadcast_limit:
        import ray

        c1: dict = {}
        for b in uni.iter_batches(batch_format="pyarrow"):
            c1.update(zip(b.column("token").to_pylist(),
                          b.column("n1").to_pylist()))
        c2: dict = {}
        for b in big.iter_batches(batch_format="pyarrow"):
            c2.update(zip(b.column("bigram").to_pylist(),
                          b.column("n2").to_pylist()))
        cl: dict = {}
        for b in lefts.iter_batches(batch_format="pyarrow"):
            cl.update(zip(b.column("token").to_pylist(),
                          b.column("nl").to_pylist()))
        ref = ray.put((c1, c2, cl))

        def score(t: pa.Table) -> pa.Table:
            m1, m2, ml = ray.get(ref)
            keep, n_toks, means = [], [], []
            for text in t.column(text_col).to_pylist():
                toks = text.split()
                keep.append(bool(toks))
                if not toks:
                    continue
                numer = np.fromiter(
                    (m2[a + SEP + b_] for a, b_ in zip(toks, toks[1:])),
                    np.float64, len(toks) - 1)
                denom = np.fromiter((ml[a] for a in toks[:-1]),
                                    np.float64, len(toks) - 1)
                terms = np.empty(len(toks), np.float64)
                terms[0] = np.log(m1[toks[0]] / total)
                if len(toks) > 1:
                    terms[1:] = np.log(numer / denom)
                n_toks.append(len(toks))
                means.append(float(terms.mean()))
            return pa.table({
                id_col: t.column(id_col).filter(pa.array(keep)),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "mean_logprob": round_half_up(
                    pa.array(means, pa.float64()), 6),
            })

        return docs.map_batches(score, batch_format="pyarrow")

    # distributed fallback: models too big to broadcast
    def explode(t: pa.Table) -> pa.Table:
        ids, keys, kinds = [], [], []
        for i, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            toks = text.split()
            if not toks:
                continue
            ids.append(i)
            keys.append(toks[0])
            kinds.append(0)  # unigram term
            for a, b_ in zip(toks, toks[1:]):
                ids.append(i)
                keys.append(a + SEP + b_)
                kinds.append(1)
        return pa.table({
            id_col: pa.array(ids, t.schema.field(id_col).type),
            "key": pa.array(keys, pa.string()),
            "kind": pa.array(kinds, pa.int8()),
        })

    rows = docs.map_batches(explode, batch_format="pyarrow")
    uni_terms = rows.map_batches(
        lambda t: (lambda sel: pa.table({
            id_col: sel.column(id_col), "token": sel.column("key")}))(
            t.filter(pc.equal(t.column("kind"), pa.scalar(0, pa.int8())))),
        batch_format="pyarrow")
    uni_j = merge_join(uni_terms, uni, ["token"])

    def uni_lp(t: pa.Table) -> pa.Table:
        lp = pc.ln(pc.divide(pc.cast(t.column("n1"), pa.float64()),
                             pa.scalar(float(total))))
        return pa.table({id_col: t.column(id_col), "_lp": lp})

    bi_terms = rows.map_batches(
        lambda t: (lambda sel: pa.table({
            id_col: sel.column(id_col), "bigram": sel.column("key"),
            "token": pc.list_element(
                pc.split_pattern(sel.column("key"), SEP), 0)}))(
            t.filter(pc.equal(t.column("kind"), pa.scalar(1, pa.int8())))),
        batch_format="pyarrow")
    bi_j = merge_join(merge_join(bi_terms, big, ["bigram"]),
                      lefts, ["token"])

    def bi_lp(t: pa.Table) -> pa.Table:
        lp = pc.ln(pc.divide(pc.cast(t.column("n2"), pa.float64()),
                             pc.cast(t.column("nl"), pa.float64())))
        return pa.table({id_col: t.column(id_col), "_lp": lp})

    terms = uni_j.map_batches(uni_lp, batch_format="pyarrow").union(
        bi_j.map_batches(bi_lp, batch_format="pyarrow"))

    def part_sum(t: pa.Table) -> pa.Table:
        g = t.group_by([id_col], use_threads=False).aggregate(
            [("_lp", "sum"), ([], "count_all")])
        return g.rename_columns([id_col, "_s", "_c"])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by([id_col], use_threads=False).aggregate(
            [("_s", "sum"), ("_c", "sum")])
        g = g.rename_columns([id_col, "_s", "_c"])
        mean = pc.divide(g.column("_s"),
                         pc.cast(g.column("_c"), pa.float64()))
        return pa.table({
            id_col: g.column(id_col),
            "n_tokens": g.column("_c"),
            "mean_logprob": round_half_up(mean, 6),
        })

    return colocated_sort(
        terms.map_batches(part_sum, batch_format="pyarrow"), [id_col]) \
        .map_batches(finish, batch_format="pyarrow", batch_size=None)


def weighted_sample(docs, k: int, *, weight_col: str = "n_chars",
                    id_col: str = "doc_id"):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): each row draws u from its id's md5
    hash (the DuckDB-twin `md5_number_lower` / 2^64 uniform) and the k
    largest ln(u)/weight keys win — inclusion probability proportional
    to weight, reproducible run-to-run and engine-to-oracle because
    the randomness IS the content hash, never a wall-clock RNG
    (§2.10).  The curation use-case: quality- or length-weighted
    corpus subsampling.

    Plan: one streaming pass computes keys and keeps a block-local
    top-k (a row can only be in the global top-k if it is in its
    block's), then a k x blocks-row sort finishes — the corpus itself
    never shuffles."""
    import numpy as np

    from octoray.stages.sketch import _TWO64, _md5_lower64

    def keyed(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_pylist()
        pos = np.asarray(w, np.float64) > 0
        u = _md5_lower64([str(i) for i in ids]).astype(np.float64) / _TWO64
        with np.errstate(divide="ignore"):
            key = np.where(pos, np.log(u) / np.where(pos, w, 1.0), -np.inf)
        tb = t.select([id_col, weight_col]).append_column(
            "_key", pa.array(key, pa.float64()))
        tb = tb.filter(pa.array(pos))
        order = pc.sort_indices(tb, sort_keys=[("_key", "descending"),
                                               (id_col, "ascending")])
        return tb.take(order[:k])

    pruned = docs.map_batches(keyed, batch_format="pyarrow")
    top = pruned.sort(["_key", id_col], descending=[True, False]).limit(k)
    return top.map_batches(lambda t: t.drop_columns(["_key"]),
                           batch_format="pyarrow")


def normalize_text(docs, *, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Corpus text canonicalization: collapse whitespace runs to one
    space, trim, then Unicode NFC normalization — the standard prep
    before hashing/dedup so visually-identical strings (decomposed
    accents, stray control whitespace) hash identically.

    Streaming map, no shuffle, no state.  Whitespace collapse and trim
    are Arrow C kernels (RE2, same regex engine as DuckDB's); NFC runs
    through ``unicodedata.normalize`` ONLY on the non-ASCII rows
    (``string_is_ascii`` prefilter — ASCII is NFC-invariant, so the
    Python call is bounded by the non-ASCII fraction, not the corpus).
    pyarrow's own ``utf8_normalize(form='NFC')`` is NOT used: as of
    pyarrow 16 it fails to canonically compose (e + U+0301 stays
    decomposed), diverging from DuckDB's ``nfc_normalize`` and
    Python's ``unicodedata``.  Output:
    (doc_id, text_norm, n_chars_norm, changed)."""
    import unicodedata

    def f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        collapsed = pc.replace_substring_regex(txt, pattern=r"\s+",
                                               replacement=" ")
        trimmed = pc.utf8_trim(collapsed, characters=" ")
        ascii_mask = pc.string_is_ascii(trimmed)
        if pc.all(ascii_mask).as_py():
            norm = trimmed
        else:
            vals = trimmed.to_pylist()
            mask = ascii_mask.to_pylist()
            norm = pa.array(
                [v if ok else unicodedata.normalize("NFC", v)
                 for v, ok in zip(vals, mask)], pa.string())
        return pa.table({
            id_col: t.column(id_col),
            "text_norm": norm,
            "n_chars_norm": pc.cast(pc.utf8_length(norm), pa.int64()),
            "changed": pc.not_equal(norm, txt),
        })

    return docs.map_batches(f, batch_format="pyarrow")


SQL_NORMALIZE_TEXT = r"""
    SELECT doc_id,
           nfc_normalize(trim(regexp_replace(text, '\s+', ' ', 'g'), ' '))
               AS text_norm,
           CAST(length(nfc_normalize(trim(
               regexp_replace(text, '\s+', ' ', 'g'), ' '))) AS BIGINT)
               AS n_chars_norm,
           nfc_normalize(trim(regexp_replace(text, '\s+', ' ', 'g'), ' '))
               <> text AS changed
    FROM documents
"""


def ngram_novelty(docs, *, k: int = 8, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Per-document novelty: the fraction of a doc's overlapping
    k-token grams that are globally UNIQUE in the corpus (count == 1).
    Low novelty = the doc is largely assembled from text that occurs
    elsewhere — the memorization-risk / boilerplate signal that
    complements span dedup (Lee et al. 2022 report most duplicated
    text lives in near-identical gram runs).

    Plan (two slim exchanges, the corpus never shuffles):

    1. one streaming pass hashes every gram with the shared vectorized
       128-bit kernel (``dedup._window_hashes`` — no gram strings, no
       per-gram Python); the exchange rows are (h1, h2, doc_id);
    2. ONE range sort on (h1, h2) co-locates equal grams (Ray's range
       partition keeps equal keys in one block — the pinned
       block-colocation invariant, query.py:305); a block-local run
       scan marks count==1 grams and pre-combines to
       (doc_id, n_grams, n_novel) partial rows;
    3. a tiny groupby-sum on doc_id finishes.

    Gram identity is the 128-bit hash pair (collision odds ~1e-14 at
    10^12 grams); the DuckDB twin keys on the literal gram string.
    Docs with fewer than k tokens are dropped (no grams — both sides
    derive rows from the gram stream).  Output:
    (doc_id, n_grams, novelty)."""
    from ray.data.aggregate import Sum

    from octoray.stages.dedup import _window_hashes
    from octoray.util import round_half_up

    def grams(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        doc_idx, _, g1, g2 = _window_hashes(t.column(text_col), k,
                                            short_gram=False)
        return pa.table({
            "h1": pa.array(g1, pa.uint64()),
            "h2": pa.array(g2, pa.uint64()),
            id_col: pa.array(ids[doc_idx], t.schema.field(id_col).type),
        })

    g = docs.map_batches(grams, batch_format="pyarrow")

    def mark(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                             "n_grams": pa.array([], pa.int64()),
                             "n_novel": pa.array([], pa.int64())})
        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        h2 = t.column("h2").to_numpy(zero_copy_only=False)
        # equal grams are adjacent (sorted) and co-located (invariant)
        new_run = np.empty(len(h1), dtype=bool)
        new_run[0] = True
        np.not_equal(h1[1:], h1[:-1], out=new_run[1:])
        np.logical_or(new_run[1:], h2[1:] != h2[:-1], out=new_run[1:])
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        novel = run_len[run_id] == 1
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        uids, inv = np.unique(ids, return_inverse=True)
        return pa.table({
            id_col: pa.array(uids, t.schema.field(id_col).type),
            "n_grams": pa.array(np.bincount(inv), pa.int64()),
            "n_novel": pa.array(
                np.bincount(inv, weights=novel.astype(np.float64))
                .astype(np.int64), pa.int64()),
        })

    partials = colocated_sort(g, ["h1", "h2"]).map_batches(
        mark, batch_format="pyarrow", batch_size=None)
    sums = partials.groupby(id_col).aggregate(
        Sum("n_grams", alias_name="n_grams"),
        Sum("n_novel", alias_name="n_novel"))

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_grams"), pa.float64())
        nov = pc.divide(pc.cast(t.column("n_novel"), pa.float64()), n)
        return pa.table({
            id_col: t.column(id_col),
            "n_grams": t.column("n_grams"),
            "novelty": round_half_up(nov, 6),
        })

    return sums.map_batches(finish, batch_format="pyarrow")


def sql_ngram_novelty(*, k: int = 8, table: str = "documents") -> str:
    """DuckDB twin of :func:`ngram_novelty`, keyed on the literal gram
    string (the engine's 128-bit hash pair is collision-free at test
    scale by construction)."""
    return rf"""
        WITH l AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                   FROM {table}),
        g AS (SELECT doc_id,
                     array_to_string(t[wi:wi + {k - 1}], ' ') AS gram
              FROM (SELECT doc_id, t,
                           unnest(generate_series(
                               1, len(t) - {k} + 1)) AS wi
                    FROM l WHERE len(t) >= {k})),
        c AS (SELECT gram, count(*) AS cc FROM g GROUP BY gram)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               floor(sum(CASE WHEN c.cc = 1 THEN 1.0 ELSE 0.0 END)
                     / count(*) * 1000000 + 0.5) / 1000000 AS novelty
        FROM g JOIN c USING (gram)
        GROUP BY doc_id
    """


def token_entropy(docs, *, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Per-document Shannon entropy of the token distribution — the
    Gopher-family "unigram entropy" quality signal (near-zero entropy
    = keyword-stuffing / boilerplate repetition; natural prose sits in
    a characteristic band).

    Pure streaming map, no shuffle, no state: per block the token
    stream is flattened once, per-(doc, token) counts come from ONE
    np.unique over composite codes, and the entropy terms are summed
    per doc with np.bincount.  Terms use the exact float expression of
    the SQL twin ((c/n) * ln(c/n)) and the result lands on the house
    6-decimal grid.  Token-less docs are dropped (both sides derive
    rows from the token stream).  Output:
    (doc_id, n_tokens, token_entropy)."""
    from octoray.util import round_half_up

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        toks_all: List[str] = []
        doc_idx: List[int] = []
        for i, text in enumerate(t.column(text_col).to_pylist()):
            tt = text.split()
            toks_all.extend(tt)
            doc_idx.extend([i] * len(tt))
        if not toks_all:
            return pa.table({
                id_col: pa.array([], ids.type),
                "n_tokens": pa.array([], pa.int64()),
                "token_entropy": pa.array([], pa.float64()),
            })
        di = np.asarray(doc_idx, dtype=np.int64)
        # token -> dense code, then one unique over (doc, token) pairs
        _, tok_code = np.unique(np.asarray(toks_all, dtype=object),
                                return_inverse=True)
        pair = di * (tok_code.max() + 1) + tok_code
        upair, c = np.unique(pair, return_counts=True)
        pair_doc = upair // (tok_code.max() + 1)
        n_docs = len(ids)
        n = np.bincount(di, minlength=n_docs).astype(np.float64)
        p = c / n[pair_doc]
        ent = -np.bincount(pair_doc, weights=p * np.log(p),
                           minlength=n_docs)
        keep = n > 0
        return pa.table({
            id_col: ids.filter(pa.array(keep)),
            "n_tokens": pa.array(n[keep].astype(np.int64), pa.int64()),
            "token_entropy": round_half_up(
                pa.array(ent[keep], pa.float64()), 6),
        })

    return docs.map_batches(f, batch_format="pyarrow")


SQL_TOKEN_ENTROPY = r"""
    WITH tok AS (SELECT doc_id,
                        unnest(regexp_extract_all(text, '\S+')) AS t
                 FROM documents),
    c AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS c
          FROM tok GROUP BY doc_id, t),
    n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id)
    SELECT c.doc_id, CAST(n.n AS BIGINT) AS n_tokens,
           floor(-sum((c.c / n.n) * ln(c.c / n.n)) * 1000000 + 0.5)
               / 1000000 AS token_entropy
    FROM c JOIN n USING (doc_id)
    GROUP BY c.doc_id, n.n
"""


def dsir_weights(docs, *, target_source: str, n_buckets: int = 1024,
                 id_col: str = "doc_id", text_col: str = "text",
                 source_col: str = "source"):
    """DSIR-style importance weights for data selection [Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"]: score every document by how target-like its hashed
    unigram distribution is, log w(x) = sum over tokens of
    ln(p_target(b) / p_raw(b)) with b = hash(token) mod ``n_buckets``
    and add-1 smoothed bucket distributions.  Feed the weights to
    ``weighted_sample`` / ``mixture_resample`` to resample raw data
    toward the target domain.

    Plan (two corpus passes, zero corpus shuffle):

    1. block-local bucket counts for the target slice
       (source == target_source) and the raw corpus (= all docs) —
       at most ``n_buckets`` partial rows per block — then one tiny
       groupby-sum (exchange O(n_buckets x blocks));
    2. the per-bucket log ratios are rounded to the 6-decimal grid and
       fixed as INTEGER micro-units, broadcast once via ray.put; each
       doc's score is an integer sum over its tokens' buckets —
       order-free, so engine and SQL twin are exactly equal.

    The hash is DuckDB's ``md5_number_lower`` (mod n_buckets), computed
    once per DISTINCT token per block (np.unique first — token streams
    are Zipfian, so the md5 loop is vocabulary-bounded, not
    corpus-bounded).  Docs with no tokens are dropped (both sides
    derive rows from the token stream).  Output:
    (doc_id, n_tokens, dsir_logw)."""
    import ray
    from ray.data.aggregate import Sum

    from octoray.stages.sketch import _md5_lower64

    B = int(n_buckets)

    def bucket_partials(t: pa.Table) -> pa.Table:
        toks: List[str] = []
        is_tgt: List[bool] = []
        srcs = t.column(source_col).to_pylist()
        for text, src in zip(t.column(text_col).to_pylist(), srcs):
            tt = text.split()
            toks.extend(tt)
            is_tgt.extend([src == target_source] * len(tt))
        if not toks:
            return pa.table({"bkt": pa.array([], pa.int64()),
                             "nt": pa.array([], pa.int64()),
                             "nr": pa.array([], pa.int64())})
        uniq, inv = np.unique(np.asarray(toks, dtype=object),
                              return_inverse=True)
        bkt_u = (_md5_lower64(list(uniq)) % np.uint64(B)).astype(np.int64)
        bkt = bkt_u[inv]
        tgt = np.asarray(is_tgt)
        nt = np.bincount(bkt[tgt], minlength=B).astype(np.int64)
        nr = np.bincount(bkt, minlength=B).astype(np.int64)
        nz = np.flatnonzero(nr)
        return pa.table({"bkt": pa.array(nz, pa.int64()),
                         "nt": pa.array(nt[nz], pa.int64()),
                         "nr": pa.array(nr[nz], pa.int64())})

    counts = (docs.map_batches(bucket_partials, batch_format="pyarrow")
              .groupby("bkt")
              .aggregate(Sum("nt", alias_name="nt"),
                         Sum("nr", alias_name="nr"))
              .to_pandas())  # <= n_buckets rows — driver-bounded
    NT = float(counts["nt"].sum()) if len(counts) else 0.0
    NR = float(counts["nr"].sum()) if len(counts) else 0.0
    lam_micro = np.zeros(B, dtype=np.int64)
    if len(counts):
        bkt = counts["bkt"].to_numpy()
        pt = (counts["nt"].to_numpy(dtype=np.float64) + 1.0) / (NT + B)
        pr = (counts["nr"].to_numpy(dtype=np.float64) + 1.0) / (NR + B)
        lam = np.log(pt) - np.log(pr)  # same op order as the SQL twin
        lam_micro[bkt] = np.floor(lam * 1_000_000.0 + 0.5).astype(np.int64)
    ref = ray.put(lam_micro)

    def score(t: pa.Table) -> pa.Table:
        lm = ray.get(ref)
        ids = t.column(id_col).to_pylist()
        out_ids: List[object] = []
        n_toks: List[int] = []
        sums: List[int] = []
        toks_all: List[str] = []
        doc_idx: List[int] = []
        for i, text in enumerate(t.column(text_col).to_pylist()):
            tt = text.split()
            if tt:
                toks_all.extend(tt)
                doc_idx.extend([i] * len(tt))
        if toks_all:
            uniq, inv = np.unique(np.asarray(toks_all, dtype=object),
                                  return_inverse=True)
            bkt = (_md5_lower64(list(uniq)) % np.uint64(B)).astype(np.int64)
            per_tok = lm[bkt[inv]]
            di = np.asarray(doc_idx, dtype=np.int64)
            n_docs = len(ids)
            tot = np.bincount(di, weights=per_tok.astype(np.float64),
                              minlength=n_docs).astype(np.int64)
            cnt = np.bincount(di, minlength=n_docs)
            for i in range(n_docs):
                if cnt[i]:
                    out_ids.append(ids[i])
                    n_toks.append(int(cnt[i]))
                    sums.append(int(tot[i]))
        return pa.table({
            id_col: pa.array(out_ids, t.schema.field(id_col).type),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "dsir_logw": pa.array([s / 1_000_000.0 for s in sums],
                                  pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def sql_dsir_weights(*, target_source: str, n_buckets: int = 1024,
                     table: str = "documents") -> str:
    """DuckDB twin: identical md5 bucket hash, identical smoothed
    log-ratio expression, identical micro-integer rounding and sum."""
    B = int(n_buckets)
    return f"""
        WITH tok AS (
            SELECT doc_id, source,
                   unnest(regexp_extract_all(text, '\\S+')) AS t
            FROM {table}),
        b AS (SELECT doc_id, source,
                     CAST(md5_number_lower(t) % {B} AS BIGINT) AS bkt
              FROM tok),
        rc AS (SELECT bkt, count(*) AS nr FROM b GROUP BY bkt),
        tc AS (SELECT bkt, count(*) AS nt FROM b
               WHERE source = '{target_source}' GROUP BY bkt),
        tot AS (SELECT
                  (SELECT count(*) FROM b
                   WHERE source = '{target_source}') AS big_nt,
                  (SELECT count(*) FROM b) AS big_nr),
        lam AS (SELECT rc.bkt,
                       CAST(floor((ln((COALESCE(tc.nt, 0) + 1.0)
                                      / (tot.big_nt + {B}))
                                   - ln((rc.nr + 1.0)
                                        / (tot.big_nr + {B})))
                                  * 1000000 + 0.5) AS BIGINT) AS lmicro
                FROM rc LEFT JOIN tc USING (bkt) CROSS JOIN tot)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               sum(lmicro) / 1000000.0 AS dsir_logw
        FROM b JOIN lam USING (bkt)
        GROUP BY doc_id
    """


def top_pmi_bigrams(docs, *, k: int = 20, min_count: int = 5,
                    text_col: str = "text"):
    """Top-k collocations by pointwise mutual information:
    PMI(a,b) = ln(c(a,b) * N / (c(a) * c(b))) over adjacent token
    pairs, restricted to pairs seen >= ``min_count`` times (the
    classic low-count PMI blowup guard).  Output: (w1, w2, n12, pmi),
    ranked by the ROUNDED pmi (engine-stable boundary) with (w1, w2)
    ties.

    Plan: bigram and unigram counts are map-side-combined partials ->
    one sort-sum each (rows bounded by vocab, not corpus); two
    stats-gated joins attach the unigram counts; the ratio is computed
    in float64 (no int overflow at corpus scale) in the exact
    expression order the SQL twin uses; a per-block top-k prunes
    before the final small sort."""
    from collections import Counter

    import numpy as np

    from octoray.query import hash_join, sorted_groupby_sum

    SEP = "\x1f"

    def uni_partials(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(text.split())
        return pa.table({"w1": pa.array(list(c.keys()), pa.string()),
                         "_n": pa.array(list(c.values()), pa.int64())})

    def bi_partials(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            toks = text.split()
            c.update(a + SEP + b for a, b in zip(toks, toks[1:]))
        return pa.table({"bigram": pa.array(list(c.keys()), pa.string()),
                         "_n": pa.array(list(c.values()), pa.int64())})

    uni = sorted_groupby_sum(
        docs.map_batches(uni_partials, batch_format="pyarrow"),
        ["w1"], "_n", alias="c1").materialize()
    big = sorted_groupby_sum(
        docs.map_batches(bi_partials, batch_format="pyarrow"),
        ["bigram"], "_n", alias="n12")
    total = int(uni.sum("c1")) if uni.count() else 0
    if total == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
            "n12": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64())}))

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("bigram"), SEP)
        keep = pc.greater_equal(t.column("n12"), pa.scalar(min_count))
        out = pa.table({
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
            "n12": t.column("n12"),
        }).filter(keep)
        return out

    pairs = big.map_batches(split, batch_format="pyarrow")
    j1 = hash_join(pairs, uni, on="w1")
    j2 = hash_join(j1, uni.rename_columns({"w1": "w2", "c1": "c2"}),
                   on="w2")

    from octoray.util import round_half_up_scalar

    def score(t: pa.Table) -> pa.Table:
        c12 = t.column("n12").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log((c12 * float(total)) / (c1 * c2))
        p6 = np.array([round_half_up_scalar(v, 6) for v in pmi])
        out = pa.table({"w1": t.column("w1"), "w2": t.column("w2"),
                        "n12": t.column("n12"),
                        "pmi": pa.array(p6, pa.float64())})
        order = pc.sort_indices(out, sort_keys=[("pmi", "descending"),
                                                ("w1", "ascending"),
                                                ("w2", "ascending")])
        return out.take(order[:k])

    pruned = j2.map_batches(score, batch_format="pyarrow", batch_size=None)
    return pruned.sort(["pmi", "w1", "w2"],
                       descending=[True, False, False]).limit(k)


def ntile_tiers(docs, n_tiles: int = 4, *, order_col: str = "n_chars",
                id_col: str = "doc_id"):
    """Global quantile-bucket assignment (SQL ntile): rows ranked by
    (order_col, id) ascending are split into ``n_tiles`` buckets as
    evenly as possible, earlier buckets taking the remainder — the
    quality-tier split a curriculum or quality-mix pipeline cuts a
    corpus with.  Output: (id, order_col, tier) with 1-based tiers,
    exactly DuckDB's ntile.

    Plan: a composite zero-padded sort key makes the order unique;
    query.sorted_prefix_sum of ones gives every row its 0-based global
    rank with ONE sort and a block-count driver reduce; the
    rank->bucket map is closed-form integer math (no second pass)."""
    import numpy as np

    from octoray.query import sorted_prefix_sum

    def key(df):
        import pandas as pd

        return pd.DataFrame({
            id_col: df[id_col],
            order_col: df[order_col],
            "_sk": (df[order_col].astype(np.int64).astype(str).str.zfill(12)
                    + ":" +
                    df[id_col].astype(np.int64).astype(str).str.zfill(12)),
            "_one": 1,
        })

    keyed = docs.map_batches(key, batch_format="pandas")
    ranked = sorted_prefix_sum(keyed, "_one", order_col="_sk",
                               alias="_rank0")
    n = docs.count()
    size, big = divmod(n, n_tiles) if n else (0, 0)
    boundary = big * (size + 1)

    def tier(t: pa.Table) -> pa.Table:
        r = t.column("_rank0").to_numpy(zero_copy_only=False)
        if size == 0:
            tr = r + 1
        else:
            tr = np.where(r < boundary, r // (size + 1),
                          big + (r - boundary) // size) + 1
        return pa.table({
            id_col: t.column(id_col),
            order_col: t.column(order_col),
            "tier": pa.array(tr.astype(np.int64), pa.int64()),
        })

    return ranked.map_batches(tier, batch_format="pyarrow")


def lm_quality_select(docs, *, n_tiles: int = 4, drop_tiers: int = 1,
                      id_col: str = "doc_id", text_col: str = "text"):
    """LM-perplexity quality selection (the CCNet/KenLM curation cut):
    score every document with :func:`bigram_logprob`, split the corpus
    into ``n_tiles`` global quantile buckets by (mean_logprob, id)
    ascending — tier 1 = highest perplexity / worst — and DROP the
    lowest ``drop_tiers`` buckets.  Output: (doc_id, n_tokens,
    mean_logprob, tier) for every KEPT document; attaching text is one
    broadcast semi-join on doc_id for callers that need the payload.

    Ranking rides the same one-sort prefix-sum plan as
    :func:`ntile_tiers`, with an integer surrogate of the score
    (mean_logprob is exact at 6 decimals, so round(lp*1e6) is
    order-faithful; a fixed shift keeps the zero-padded sort key
    positive).  Exactly DuckDB's NTILE ordered by
    (mean_logprob, doc_id)."""
    import numpy as np

    from octoray.query import sorted_prefix_sum

    scores = bigram_logprob(docs, id_col=id_col, text_col=text_col)

    def key(df):
        import pandas as pd

        lp6 = (np.rint(df["mean_logprob"].to_numpy(dtype=np.float64)
                       * 1e6).astype(np.int64) + 10 ** 12)
        return pd.DataFrame({
            id_col: df[id_col],
            "n_tokens": df["n_tokens"],
            "mean_logprob": df["mean_logprob"],
            "_sk": (pd.Series(lp6).astype(str).str.zfill(16) + ":" +
                    df[id_col].astype(np.int64).astype(str).str.zfill(12)
                    ).to_numpy(),
            "_one": 1,
        })

    keyed = scores.map_batches(key, batch_format="pandas")
    ranked = sorted_prefix_sum(keyed, "_one", order_col="_sk",
                               alias="_rank0")
    n = scores.count()
    size, big = divmod(n, n_tiles) if n else (0, 0)
    boundary = big * (size + 1)

    def tier(t: pa.Table) -> pa.Table:
        r = t.column("_rank0").to_numpy(zero_copy_only=False)
        if size == 0:
            tr = r + 1
        else:
            tr = np.where(r < boundary, r // (size + 1),
                          big + (r - boundary) // size) + 1
        out = pa.table({
            id_col: t.column(id_col),
            "n_tokens": t.column("n_tokens"),
            "mean_logprob": t.column("mean_logprob"),
            "tier": pa.array(tr.astype(np.int64), pa.int64()),
        })
        return out.filter(pc.greater(out.column("tier"),
                                     pa.scalar(drop_tiers)))

    return ranked.map_batches(tier, batch_format="pyarrow")


def perplexity_by_language(docs, *, id_col: str = "doc_id",
                           text_col: str = "text"):
    """Per-language LM quality profile (the CCNet per-language
    perplexity bucketing step): language-ID each document, score it
    with :func:`bigram_logprob`, and report (pred_lang, n_docs,
    mean_logprob) — the dashboard a multilingual curation run uses to
    pick per-language cutoffs.

    Cross-engine float exactness: each doc score is exact at 6
    decimals, so the per-language mean is computed over int64
    MICRO-units (round(lp*1e6)) — integer sums are associative, so
    the result is identical at any parallelism and to the SQL twin.
    Plan: one doc-keyed join (stats-gated broadcast/merge), per-block
    (lang, sum_micro, n) partials, one slim sort-sum."""
    import numpy as np

    from octoray.plan import colocated_sort
    from octoray.query import hash_join
    from octoray.util import round_half_up

    scores = bigram_logprob(docs, id_col=id_col, text_col=text_col)
    langs = docs.map_batches(lang_id_batch, batch_format="pyarrow") \
        .map_batches(lambda t: t.select([id_col, "pred_lang"]),
                     batch_format="pyarrow")
    j = hash_join(langs, scores, on=id_col)

    def partial(df):
        import pandas as pd

        micro = np.rint(df["mean_logprob"].to_numpy(dtype=np.float64)
                        * 1e6).astype(np.int64)
        g = pd.DataFrame({"pred_lang": df["pred_lang"], "_m": micro,
                          "_n": 1}).groupby("pred_lang", sort=False,
                                            as_index=False).sum()
        return g

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["pred_lang"], use_threads=False).aggregate(
            [("_m", "sum"), ("_n", "sum")])
        g = g.rename_columns(["pred_lang", "_m", "_n"])
        m = g.column("_m").to_numpy(zero_copy_only=False).astype(np.float64)
        n = g.column("_n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "pred_lang": g.column("pred_lang"),
            "n_docs": pa.array(n.astype(np.int64), pa.int64()),
            "mean_logprob": round_half_up(
                pa.array(m / n / 1e6, pa.float64()), 6),
        })

    pre = j.map_batches(partial, batch_format="pandas")
    return colocated_sort(pre, ["pred_lang"]).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def dsir_select(docs, *, target_source: str, quota: int,
                n_buckets: int = 1024, id_col: str = "doc_id",
                text_col: str = "text", source_col: str = "source"):
    """DSIR data SELECTION end-to-end: importance weights
    (:func:`dsir_weights`) -> the ``quota`` most target-like documents,
    deterministically cut on (dsir_logw DESC, doc_id ASC) — the
    top-quota variant of the paper's resampling step (integer
    micro-unit scores make the boundary exact and parallelism-
    invariant).  The cut is a per-block partial head before one
    bounded final head: at most ``quota`` slim rows leave any block."""
    weights = dsir_weights(docs, target_source=target_source,
                           n_buckets=n_buckets, id_col=id_col,
                           text_col=text_col, source_col=source_col)

    def head_block(df):
        if not len(df):
            return df
        return df.sort_values(["dsir_logw", id_col],
                              ascending=[False, True],
                              kind="mergesort").head(quota)

    parts = weights.map_batches(head_block, batch_format="pandas")
    final = parts.to_pandas()
    final = head_block(final).reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def sql_dsir_select(*, target_source: str, quota: int,
                    n_buckets: int = 1024) -> str:
    """DuckDB twin of :func:`dsir_select`: the dsir_weights twin with
    the identical deterministic top-quota cut."""
    inner = sql_dsir_weights(target_source=target_source,
                             n_buckets=n_buckets)
    return f"""
        SELECT * FROM ({inner})
        ORDER BY dsir_logw DESC, doc_id
        LIMIT {quota}
    """


def winnow_fingerprints(docs, *, k: int = 8, w: int = 4,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Winnowing document fingerprints [Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS plagiarism-detection algorithm]: hash every
    k-char gram of the whitespace-collapsed lowercased text, slide a
    window of ``w`` consecutive hashes, select each window's minimum
    (ties to the RIGHTMOST position, the paper's robust-winnowing
    rule), and emit the DISTINCT (doc_id, fp) set.  Guarantee: any
    substring match of length >= w + k - 1 between two documents
    shares at least one fingerprint — the local complement to the
    whole-doc rolling hash in ``fingerprints``.

    Scale shape: stateless map_batches; the md5 loop is bounded by the
    DISTINCT grams per block (np.unique first — natural text grams
    are Zipfian), the window minima are one sliding_window_view +
    reversed argmin per doc (no Python inner loop over windows).
    Docs with fewer than k + w - 1 normalized chars have no full
    window and yield no fingerprints (mirrored in the SQL twin).

    The hash is DuckDB's md5_number_lower (uint64 on BOTH sides —
    the twin's UBIGINT), so engine and oracle select identical
    minima."""
    from octoray.stages.sketch import _md5_lower64

    def per_batch(t: pa.Table) -> pa.Table:
        ids_out: List = []
        fps_out: List[np.ndarray] = []
        ids = t.column(id_col).to_pylist()
        for i, text in zip(ids, _norm_ws(t.column(text_col)).to_pylist()):
            n = len(text)
            n_grams = n - k + 1
            if n_grams < w:
                continue
            grams = [text[j:j + k] for j in range(n_grams)]
            uniq, inv = np.unique(np.asarray(grams, dtype=object),
                                  return_inverse=True)
            hs = _md5_lower64(list(uniq))[inv]
            sw = np.lib.stride_tricks.sliding_window_view(hs, w)
            am = sw[:, ::-1].argmin(axis=1)
            pos = np.arange(n_grams - w + 1) + (w - 1 - am)
            fp = np.unique(hs[np.unique(pos)])
            ids_out.extend([i] * len(fp))
            fps_out.append(fp)
        fps = (np.concatenate(fps_out) if fps_out
               else np.array([], dtype=np.uint64))
        return pa.table({
            id_col: pa.array(ids_out,
                             t.schema.field(id_col).type),
            "fp": pa.array(fps, pa.uint64()),
        })

    return docs.map_batches(per_batch, batch_format="pyarrow")


def sql_winnow_fingerprints(*, k: int = 8, w: int = 4,
                            table: str = "documents",
                            id_col: str = "doc_id") -> str:
    """DuckDB twin of winnow_fingerprints over the same table: same
    normalization, same md5_number_lower gram hash, same
    rightmost-min-per-window selection (row_number ORDER BY h, i
    DESC)."""
    norm = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
    return f"""
        WITH d AS (SELECT {id_col}, {norm} AS t FROM {table}),
        g0 AS (SELECT {id_col}, t,
                      length(t) - {k} + 1 AS ng FROM d
               WHERE length(t) >= {k + w - 1}),
        g AS (SELECT {id_col}, ng,
                     unnest(range(1, ng + 1)) AS i, t FROM g0),
        h AS (SELECT {id_col}, ng, i,
                     md5_number_lower(substr(t, CAST(i AS INT), {k})) AS h
              FROM g),
        wn AS (SELECT {id_col}, i - off AS s, i, h
               FROM h CROSS JOIN range({w}) r(off)
               WHERE i - off >= 1 AND i - off <= ng - {w} + 1),
        sel AS (SELECT {id_col}, s, h,
                       row_number() OVER (PARTITION BY {id_col}, s
                                          ORDER BY h, i DESC) AS rn
                FROM wn)
        SELECT DISTINCT {id_col}, h AS fp FROM sel WHERE rn = 1
    """


def quality_calibration(docs, *, n_tiles: int = 10,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Quality-calibration report: the corpus's unigram-LM score
    distribution ACROSS length deciles — the diagnostic a curation
    pipeline reads before setting perplexity thresholds (short docs
    score systematically differently; a single global cutoff
    over-prunes one tail).  Output per tier (1-based, ntile over
    (n_tokens, doc_id)): (tier, n_docs, sum_logprob_micro,
    min_tokens, max_tokens).

    The logprob aggregate is the SUM of 6-decimal micro-INTEGER units
    (floor(lp * 1e6 + 0.5), negative-safe floor on both engines) —
    exact int64 cross-engine, the dsir_weights convention; consumers
    divide by n_docs for the mean.  Composition: unigram_logprob
    (two passes) -> ntile_tiers (one sort through the prefix sum) ->
    one tier-keyed hash join -> map-side partials + one tiny tier
    sort."""
    import pandas as pd

    from octoray.query import hash_join

    lp = unigram_logprob(docs, id_col=id_col, text_col=text_col
                         ).materialize()
    tiers = ntile_tiers(lp, n_tiles, order_col="n_tokens",
                        id_col=id_col)
    j = hash_join(
        tiers.map_batches(
            lambda t: t.select([id_col, "tier"]),
            batch_format="pyarrow"),
        lp, on=id_col)

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({
                "tier": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int64"),
                "sum_logprob_micro": pd.Series([], dtype="int64"),
                "min_tokens": pd.Series([], dtype="int64"),
                "max_tokens": pd.Series([], dtype="int64")})
        micro = np.floor(df["mean_logprob"] * 1e6 + 0.5).astype("int64")
        g = df.assign(_m=micro).groupby("tier", sort=False)
        return pd.DataFrame({
            "n_docs": g.size().astype("int64"),
            "sum_logprob_micro": g["_m"].sum().astype("int64"),
            "min_tokens": g["n_tokens"].min().astype("int64"),
            "max_tokens": g["n_tokens"].max().astype("int64"),
        }).reset_index()

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return df
        g = df.groupby("tier", sort=False)
        return pd.DataFrame({
            "n_docs": g["n_docs"].sum().astype("int64"),
            "sum_logprob_micro": g["sum_logprob_micro"].sum(
            ).astype("int64"),
            "min_tokens": g["min_tokens"].min().astype("int64"),
            "max_tokens": g["max_tokens"].max().astype("int64"),
        }).reset_index()

    partials = j.map_batches(partial, batch_format="pandas")
    return colocated_sort(partials, ["tier"]).map_batches(
        final, batch_format="pandas", batch_size=None)
