"""Distributed BPE tokenizer training — the corpus-scale tokenizer
build step of an LLM data pipeline (Sennrich-style byte-pair-encoding
merges), learned the way production trainers do it: on the DISTINCT
WORD frequency table, never on the raw corpus.

Shape at 100 TB:

  1. ONE pass over the text builds the (word, n) frequency table
     (map-side Counters -> one token-keyed sort-sum — the vocab.py
     combiner).  Everything after runs on distinct words: the corpus
     size never matters again.
  2. Each word is symbolized as a SENTINEL STRING: every symbol is
     wrapped in US = ``\\x1f`` (``\\x1fl\\x1fo\\x1fw\\x1f</w>\\x1f`` for
     "low"), so a pair merge is a plain ``str.replace`` of
     ``\\x1fx\\x1f\\x1fy\\x1f`` with ``\\x1fxy\\x1f`` — non-overlapping
     left-to-right replace IS greedy BPE merging under this encoding
     (each symbol carries its own delimiters, so consecutive pair
     occurrences never share consumed characters), and DuckDB's
     ``replace`` has identical semantics, making the oracle
     integer-exact with no float anywhere.
  3. Per merge iteration: adjacent-pair extraction is vectorized
     (Arrow split + element-wise binary join over the flat symbol
     array, cross-word boundaries masked), partial pair counts
     combine map-side, ONE small sort picks the argmax pair
     (count desc, pair asc — the deterministic tie-break), and one
     vectorized replace pass rewrites the word table.  Shuffled rows
     per iteration are bounded by the distinct-pair vocabulary, not
     the corpus.

Input tokens containing the US sentinel are rejected (assert) — the
encoding owns that byte.

Returns the symbolized word table after ``n_merges`` merges plus the
ordered merge list; ``sql_bpe`` generates the DuckDB twin that
re-runs the identical iterations as a CTE chain.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from octoray import plan

US = "\x1f"
EOW = "</w>"


def _symbolize(word: str) -> str:
    return "".join(US + ch + US for ch in word) + US + EOW + US


def word_freq_table(docs, *, text_col: str = "text"):
    """(word, n) over the corpus — map-side Counters, one sort-sum."""
    from collections import Counter

    from octoray.query import sorted_groupby_sum

    def partials(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(text.split())
        return pa.table({
            "word": pa.array(list(c.keys()), pa.string()),
            "_n": pa.array(list(c.values()), pa.int64()),
        })

    return sorted_groupby_sum(
        docs.map_batches(partials, batch_format="pyarrow"),
        ["word"], "_n", alias="n")


def _pair_counts(words) -> "object":
    """Dataset of per-block partial (pair, cnt) rows; ``pair`` is the
    full replace PATTERN (``\\x1fx\\x1f\\x1fy\\x1f``), so the argmax row
    is directly the next merge's needle."""

    def partial(t: pa.Table) -> pa.Table:
        symb = t.column("symb")
        n = t.column("n").to_numpy(zero_copy_only=False)
        # strip the outer sentinels, split on the double sentinel
        inner = pc.utf8_trim(symb, US)
        lst = pc.split_pattern(inner, US + US)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lst)
        if len(flat) == 0:
            return pa.table({"pair": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1)
        pair = pc.binary_join_element_wise(
            pa.scalar(US), left, pa.scalar(US + US), right,
            pa.scalar(US), "")
        # mask out pairs that span a word boundary
        ends = np.cumsum(lens)
        word_of = np.repeat(np.arange(len(lens)), lens)
        same_word = word_of[:-1] == word_of[1:]
        weights = np.repeat(n, lens)[:-1]
        pair_np = pair.to_numpy(zero_copy_only=False)[same_word]
        w_np = weights[same_word]
        if len(pair_np) == 0:
            return pa.table({"pair": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        uniq, inv = np.unique(pair_np, return_inverse=True)
        sums = np.bincount(inv, weights=w_np).astype(np.int64)
        return pa.table({"pair": pa.array(uniq, pa.string()),
                         "cnt": pa.array(sums, pa.int64())})

    return words.map_batches(partial, batch_format="pyarrow")


def train_bpe(docs, *, n_merges: int = 12, text_col: str = "text",
              driver_limit: int = plan.BPE_DRIVER_ROWS):
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns (words_ds, merges): ``words_ds`` is the symbolized word
    table (word, n, symb) AFTER all merges — the driver-checkable
    artifact, since every merge's effect is baked into ``symb`` — and
    ``merges`` the ordered list of chosen pair patterns."""
    from octoray.query import sorted_groupby_sum

    wf = word_freq_table(docs, text_col=text_col)

    def symbolize(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        assert not any(US in w for w in words), \
            "input tokens may not contain the \\x1f sentinel"
        return pa.table({
            "word": t.column("word"),
            "n": t.column("n"),
            "symb": pa.array([_symbolize(w) for w in words], pa.string()),
        })

    words = wf.map_batches(symbolize, batch_format="pyarrow").materialize()
    merges: List[str] = []
    if words.count() <= driver_limit:
        # stats-gated driver fast path (the pagerank convention): a
        # word table this small makes each iteration's Ray round-trip
        # pure overhead — run the IDENTICAL counting/argmax/replace
        # loop on one collected copy (path equality pinned in pytest)
        import collections

        tbl = words.to_pandas()
        syms = tbl["symb"].tolist()
        ns = tbl["n"].tolist()
        for _ in range(n_merges):
            c: collections.Counter = collections.Counter()
            for s_, n_ in zip(syms, ns):
                parts = s_.strip(US).split(US + US)
                for a, b in zip(parts, parts[1:]):
                    c[US + a + US + US + b + US] += n_
            if not c:
                break
            needle = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            repl = US + "".join(needle[1:-1].split(US + US)) + US
            syms = [s_.replace(needle, repl) for s_ in syms]
            merges.append(needle)
        import ray.data as rd

        out = rd.from_arrow(pa.table({
            "word": pa.array(tbl["word"].tolist(), pa.string()),
            "n": pa.array(ns, pa.int64()),
            "symb": pa.array(syms, pa.string()),
        }))
        return out, merges
    for _ in range(n_merges):
        counts = sorted_groupby_sum(_pair_counts(words), ["pair"], "cnt",
                                    alias="cnt")
        top = counts.sort(["cnt", "pair"], descending=[True, False]) \
                    .limit(1).take_all()
        if not top:
            break
        needle = top[0]["pair"]
        # \x1fx\x1f\x1fy\x1f -> \x1fxy\x1f
        mid = needle[1:-1].split(US + US)
        repl = US + "".join(mid) + US

        def apply(t: pa.Table, needle=needle, repl=repl) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index("symb"), "symb",
                pc.replace_substring(t.column("symb"), needle, repl))

        words = words.map_batches(apply, batch_format="pyarrow") \
                     .materialize()
        merges.append(needle)
    return words, merges


def _train_ctes(n_merges: int) -> list:
    """The training chain shared by sql_bpe and sql_train_apply_bpe:
    word counts, symbolization, and per-iteration pair-argmax +
    replace CTEs (every iteration CTE MATERIALIZED — single-row argmax
    CTEs referenced repeatedly would otherwise inline
    exponentially)."""
    u = "chr(31)"
    parts = [
        r"tok AS MATERIALIZED (SELECT unnest(regexp_extract_all(text,"
        r" '\S+')) AS word FROM documents)",
        "wf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS n"
        " FROM tok GROUP BY word)",
        # per-char wrap: concat over the exploded characters
        f"w0 AS MATERIALIZED (SELECT word, n, string_agg({u} || c || {u},"
        f" '' ORDER BY i) || {u} || '</w>' || {u} AS symb"
        f" FROM (SELECT word, n, unnest(range(1, length(word) + 1)) AS i,"
        f" word[i:i] AS c FROM wf) GROUP BY word, n)",
    ]
    for t in range(1, n_merges + 1):
        p = t - 1
        parts += [
            f"l{t} AS (SELECT n, string_split(trim(symb, {u}),"
            f" {u} || {u}) AS l FROM w{p})",
            f"p{t} AS (SELECT {u} || pr || {u} AS pair, sum(n) AS cnt"
            f" FROM (SELECT n, unnest(CASE WHEN len(l) < 2 THEN"
            f" CAST([] AS VARCHAR[]) ELSE"
            f" [l[i] || {u} || {u} || l[i+1] for i in range(1, len(l))]"
            f" END) AS pr FROM l{t}) GROUP BY pair)",
            f"m{t} AS MATERIALIZED (SELECT pair,"
            f" replace(pair, {u} || {u}, '') AS repl"
            f" FROM p{t} ORDER BY cnt DESC, pair LIMIT 1)",
            f"w{t} AS MATERIALIZED (SELECT word, n,"
            f" CASE WHEN (SELECT count(*) FROM m{t}) = 0 THEN symb"
            f" ELSE replace(symb, (SELECT pair FROM m{t}),"
            f" (SELECT repl FROM m{t})) END AS symb FROM w{p})",
        ]
    return parts


def sql_bpe(*, n_merges: int = 12) -> str:
    """DuckDB twin of train_bpe: identical word-frequency build,
    symbolization, pair counting, argmax tie-break and sentinel
    replace, as one generated CTE chain."""
    return ("WITH " + ",\n".join(_train_ctes(n_merges)) +
            f"\nSELECT word, n, symb FROM w{n_merges}")


def apply_bpe(docs, merges, *, id_col: str = "doc_id",
              text_col: str = "text"):
    """Tokenize documents with a learned merge list — the corpus
    re-encoding pass that follows training.

    Per batch (streaming, no shuffle): whitespace words -> sentinel
    symbolization -> the K merges applied IN ORDER as vectorized
    ``replace_substring`` passes over one flat word array -> per-doc
    BPE token count and the space-joined token sequence.  K passes
    over each batch (K = merge count) — each an Arrow C kernel, so
    the cost is K linear scans, not a Python loop over tokens.

    Output: (id, n_bpe_tokens, bpe_text).  The SQL twin is the same
    K-step replace chain, so the encoding is integer/string-exact."""
    merges = list(merges)

    def encode(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        out_counts = np.zeros(len(texts), np.int64)
        joined: List[str] = []
        # flat word array with per-doc lengths (one symbolize +
        # replace chain for the whole batch)
        lens = []
        words: List[str] = []
        for text in texts:
            ws = text.split()
            lens.append(len(ws))
            words.extend(ws)
        symb = pa.array([_symbolize(w) for w in words], pa.string())
        for needle in merges:
            mid = needle[1:-1].split(US + US)
            symb = pc.replace_substring(symb, needle,
                                        US + "".join(mid) + US)
        toks = pc.split_pattern(pc.utf8_trim(symb, US), US + US)
        n_per_word = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False)
        word_strs = pc.binary_join(toks, " ").to_pylist()
        pos = 0
        for i, k in enumerate(lens):
            out_counts[i] = int(n_per_word[pos:pos + k].sum())
            joined.append(" ".join(word_strs[pos:pos + k]))
            pos += k
        return pa.table({
            id_col: t.column(id_col),
            "n_bpe_tokens": pa.array(out_counts, pa.int64()),
            "bpe_text": pa.array(joined, pa.string()),
        })

    return docs.map_batches(encode, batch_format="pyarrow")


def sql_train_apply_bpe(*, n_merges: int = 12) -> str:
    """DuckDB twin for train_bpe + apply_bpe composed: re-learns the
    merges with the shared training chain, then encodes every document
    by applying the learned replaces IN ORDER via scalar subqueries —
    no engine output crosses the boundary."""
    u = "chr(31)"
    parts = _train_ctes(n_merges)
    expr = ("string_agg(" + u + " || c || " + u + ", '' ORDER BY i)"
            " || " + u + " || '</w>' || " + u)
    parts += [
        r"dtok AS MATERIALIZED (SELECT doc_id, wi, word FROM ("
        r"SELECT doc_id, unnest(regexp_extract_all(text, '\S+'))"
        r" AS word, generate_subscripts(regexp_extract_all(text,"
        r" '\S+'), 1) AS wi FROM documents))",
        f"dsy AS MATERIALIZED (SELECT doc_id, wi, {expr} AS symb FROM ("
        f"SELECT doc_id, wi, unnest(range(1, length(word) + 1)) AS i,"
        f" word[i:i] AS c FROM dtok) GROUP BY doc_id, wi)",
    ]
    # one CTE per merge step: a single nested expression of 12
    # CASE/replace layers exceeds DuckDB's logical-planner tree depth
    parts.append("d0 AS (SELECT doc_id, wi, symb FROM dsy)")
    for t in range(1, n_merges + 1):
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT doc_id, wi,"
            f" CASE WHEN (SELECT count(*) FROM m{t}) = 0 THEN symb"
            f" ELSE replace(symb, (SELECT pair FROM m{t}),"
            f" (SELECT repl FROM m{t})) END AS symb FROM d{t - 1})")
    parts.append(
        f"enc AS (SELECT doc_id, wi, string_split(trim(symb, {u}),"
        f" {u} || {u}) AS l FROM d{n_merges})")
    return ("WITH " + ",\n".join(parts) + """
        SELECT doc_id, CAST(sum(len(l)) AS BIGINT) AS n_bpe_tokens,
               string_agg(array_to_string(l, ' '), ' ' ORDER BY wi)
                 AS bpe_text
        FROM enc GROUP BY doc_id""")
