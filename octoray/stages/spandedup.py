"""Exact duplicate-SPAN trimming — the token-span analogue of the
"deduplicating training data makes language models better" exact
substring dedup (suffix-array method, simplified to k-token-gram
granularity so it distributes as two sorts): any k-token span whose
content appears earlier in the corpus (first occurrence = smallest
(doc_id, pos)) is removed from the text; the first occurrence is
kept.  Complements line_dedup (line granularity) and jaccard/minhash
(whole-doc granularity) in the dedup family.

Plan (two range sorts, both over slim rows — the text itself never
enters an all-to-all):

  1. gram emission      (md5(k-gram), doc_id, pos) per overlapping
                        token k-gram — one streaming pass
  2. keep-first         ONE sort on (gram, doc_id, pos) + block-local
                        "all but first per gram" -> duplicate-span
                        markers (doc_id, pos)
  3. per-doc marker set ONE sort on doc_id + block-local group-concat
                        -> (doc_id, '+'-joined positions), at most one
                        row per doc
  4. rebuild            broadcast (ray.put once) of the per-doc marker
                        rows when they fit, else a doc-keyed merge
                        join; covered token positions (union of
                        [pos, pos+k) intervals via a +1/-1 coverage
                        diff-scan) are dropped and the text re-joined
                        with single spaces (token-normalized output,
                        same as the SQL twin's string_agg)

Grams travel as 128-bit hashes (two uint64 columns, gram + gram2) so
the shuffle moves 16 fixed bytes instead of raw k-token strings, and
the hashing is ONE vectorized pass per batch (dedup._window_hashes)
instead of a per-gram hashlib.md5 loop (the r2 CPU floor).  The hash
never leaves the engine: the DuckDB twin re-derives duplicate spans
from raw text, and equality is checked on the trimmed output.
Within-doc repeats count as duplicates too (the second occurrence in
the SAME doc is trimmed), exactly as the (doc_id, pos) order implies.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from octoray.query import block_map_groups
from octoray.stages.dedup import _window_hashes

from octoray.plan import colocated_sort

from octoray import plan


def _gram_rows(t: pa.Table, *, k: int, id_col: str, text_col: str) -> pa.Table:
    doc_idx, pos, g1, g2 = _window_hashes(
        t.column(text_col), k, short_gram=False)
    return pa.table({
        "gram": pa.array(g1),
        "gram2": pa.array(g2),
        "doc_id": t.column(id_col).take(pa.array(doc_idx, pa.int64())),
        "pos": pa.array(pos, pa.int64()),
    })


def _mark_non_first(t: pa.Table) -> pa.Table:
    """gram-sorted block -> rows that are NOT their gram's first
    (doc_id, pos) occurrence.  The RANGE sort is keyed on the gram
    hash's FIRST half only (equal grams co-locate — (gram, gram2)
    groups nest inside gram groups; adding doc_id/pos to the shuffle
    key would let a gram group straddle partition boundaries); the
    (gram2, doc_id, pos) order is established locally here, then a row
    is first iff its full 128-bit gram differs from the previous
    row's — all vectorized."""
    if t.num_rows == 0:
        return pa.table({"doc_id": t.column("doc_id"), "pos": t.column("pos")})
    idx = pc.sort_indices(
        t, sort_keys=[("gram", "ascending"), ("gram2", "ascending"),
                      ("doc_id", "ascending"), ("pos", "ascending")])
    t = t.take(idx)
    g1 = t.column("gram").combine_chunks()
    g2 = t.column("gram2").combine_chunks()
    first = np.ones(len(g1), dtype=bool)
    eq1 = pc.equal(g1.slice(1), g1.slice(0, len(g1) - 1))
    eq2 = pc.equal(g2.slice(1), g2.slice(0, len(g2) - 1))
    eq_prev = pc.and_(eq1, eq2)
    first[1:] = np.invert(
        np.asarray(eq_prev.to_numpy(zero_copy_only=False), dtype=bool)
    )
    dup = t.filter(pa.array(~first))
    return pa.table({"doc_id": dup.column("doc_id"), "pos": dup.column("pos")})


def _trim_one(text: str, poss: Optional[str], k: int) -> Tuple[int, int, str]:
    """One doc: (n_tokens, n_removed, trimmed text)."""
    ts = text.split()
    n = len(ts)
    if not poss:
        return n, 0, " ".join(ts)
    starts = np.fromiter((int(x) for x in poss.split("+")), np.int64)
    delta = np.zeros(n + 1, np.int64)
    np.add.at(delta, starts, 1)
    np.add.at(delta, np.minimum(starts + k, n), -1)
    covered = np.cumsum(delta[:n]) > 0
    kept = [w for w, c in zip(ts, covered) if not c]
    return n, int(covered.sum()), " ".join(kept)


def _trim_table(t: pa.Table, texts: List[str], posses: List[Optional[str]],
                *, id_col: str, k: int) -> pa.Table:
    out = [_trim_one(tx, ps, k) for tx, ps in zip(texts, posses)]
    return pa.table({
        id_col: t.column(id_col),
        "n_tokens": pa.array([o[0] for o in out], pa.int64()),
        "n_removed": pa.array([o[1] for o in out], pa.int64()),
        "text_trimmed": pa.array([o[2] for o in out], pa.string()),
    })


def trim_duplicate_spans(docs, *, k: int = 10, id_col: str = "doc_id",
                         text_col: str = "text",
                         broadcast_limit: int = plan.BROADCAST_ROWS):
    """(doc_id, n_tokens, n_removed, text_trimmed) with every
    non-first duplicate k-token span removed.  Docs shorter than k
    tokens pass through untouched."""
    import ray

    grams = docs.map_batches(
        lambda t: _gram_rows(t, k=k, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    markers = colocated_sort(grams, ["gram"]).map_batches(
        _mark_non_first, batch_format="pyarrow", batch_size=None
    )

    def concat_pos(df):
        import pandas as pd

        return pd.DataFrame({
            "doc_id": [df["doc_id"].iloc[0]],
            "_poss": ["+".join(str(p) for p in sorted(df["pos"]))],
        })

    # range sort on doc_id ONLY (same boundary rule as the gram sort);
    # positions are ordered inside concat_pos
    per_doc = block_map_groups(colocated_sort(markers, ["doc_id"]),
                               ["doc_id"], concat_pos).materialize()

    if per_doc.count() <= broadcast_limit:
        pmap = {}
        for b in per_doc.iter_batches(batch_format="pyarrow"):
            pmap.update(zip(b.column("doc_id").to_pylist(),
                            b.column("_poss").to_pylist()))
        ref = ray.put(pmap)

        def rebuild(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            ids = t.column(id_col).to_pylist()
            return _trim_table(
                t, t.column(text_col).to_pylist(),
                [m.get(i) for i in ids], id_col=id_col, k=k)

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # scale path: doc-keyed merge join of the (<= one per doc) marker
    # rows onto the docs table
    from octoray.query import merge_join

    slim = docs.map_batches(
        lambda t: pa.table({id_col: t.column(id_col),
                            text_col: t.column(text_col)}),
        batch_format="pyarrow")
    renamed = per_doc.map_batches(
        lambda t: t.rename_columns([id_col, "_poss"]),
        batch_format="pyarrow")
    joined = merge_join(slim, renamed, [id_col], how="left_outer")

    def rebuild_joined(t: pa.Table) -> pa.Table:
        return _trim_table(
            t, t.column(text_col).to_pylist(),
            t.column("_poss").to_pylist(), id_col=id_col, k=k)

    return joined.map_batches(rebuild_joined, batch_format="pyarrow")
