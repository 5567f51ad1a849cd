"""Entity resolution for KG construction: fuzzy mention clustering +
sameAs graph canonicalization.

The reference resolves entity-name variants with per-field spellcheck
dictionaries (domain_geography.py misspelling tables; see
functions/spellcheck.py for this engine's port).  Dictionaries only
cover KNOWN variants; real crawl corpora also carry novel typos of the
same strain/place names, which the reference's workflow leaves as
distinct graph entities.  This module closes that gap with the
standard record-linkage pipeline:

    mentions -> blocking -> candidate pairs -> verify -> connected
    components -> canonical representative -> (optionally) rewrite the
    graph through the mapping (owl:sameAs reasoning; model.py P.sameAs
    is already emitted by the GenBank path, emit.py:290).

Scale design (the point of the module):

* Blocking is SYMMETRIC-DELETE (the SymSpell construction): each
  normalized name emits itself plus its single-character deletions as
  block keys.  Two names within edit distance 1 always share at least
  one key (same length + 1 substitution -> delete the differing
  position from both; length +-1 -> the shorter string is itself a
  deletion of the longer), so the blocking is COMPLETE for distance
  <= 1 — no all-pairs stage anywhere, and block sizes are bounded by
  the number of near-variants of one name, not corpus size.
* Exact-duplicate names are collapsed to one representative BEFORE
  blocking (per-norm min-id, one combined sort), so a name mentioned a
  billion times contributes ONE row to the fuzzy stage instead of a
  quadratic pair set.
* Components reuse ``dedup.dup_components`` (stats-gated union-find /
  distributed min-label propagation with pointer jumping), and the
  final mention->canonical attachment is the same stats-gated
  broadcast-vs-merge-join switch the rest of the engine uses.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from octoray.plan import colocated_sort

from octoray import plan

# Above this many distinct norms sharing one block key, the block is
# degenerate (a near-constant vocabulary) and is skipped for pair
# generation — the same escape hatch as jaccard_pairs(max_df).  At the
# default the skip never fires on name-like data; it exists so one
# pathological key cannot go quadratic at corpus scale.
DEFAULT_MAX_BLOCK = 256


def _edit_leq1(a: str, b: str) -> bool:
    """Exact edit-distance-<=-1 verification, O(len)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _norm_names(batch: pa.Table, id_col: str, name_col: str) -> pa.Table:
    return pa.table(
        {
            id_col: batch.column(id_col),
            "_norm": pc.utf8_lower(batch.column(name_col)),
        }
    )


def _norm_reps(mentions, *, id_col: str, name_col: str):
    """(_norm, _rep) — one row per distinct normalized name, _rep = the
    norm's minimum mention id.  Block-local combine first, so the sort
    moves one row per (block, norm)."""
    from octoray.query import sorted_groupby_min

    slim = mentions.map_batches(
        lambda b: _norm_names(b, id_col, name_col), batch_format="pyarrow"
    )

    def local_min(t: pa.Table) -> pa.Table:
        g = t.group_by(["_norm"], use_threads=False).aggregate([(id_col, "min")])
        return g.rename_columns(["_norm", id_col])

    combined = slim.map_batches(local_min, batch_format="pyarrow")
    return sorted_groupby_min(combined, ["_norm"], id_col, alias="_rep")


def _emit_blocks(batch: pa.Table) -> pa.Table:
    """(_norm, _rep) -> one slim row per symmetric-delete block key.

    Expansion factor is len(norm)+1 — linear in name bytes, the same
    order as the gram-emission stages.  Vectorized per DELETION
    POSITION, not per row: iteration i takes the rows long enough to
    have an i-th character and builds norm[:i] + norm[i+1:] with two
    Arrow slice kernels + a concat — ~max_name_len kernel passes over
    shrinking row subsets instead of a Python loop over every row
    (the per-row first cut was the stage's floor; names at corpus
    scale are ~1e8 distinct rows)."""
    # Ray blocks arrive as large_string; normalize once so the join
    # kernel's separator scalar (string) matches
    norm = pc.cast(batch.column("_norm"), pa.string())
    rep = batch.column("_rep")
    lens = pc.utf8_length(norm)
    max_len = pc.max(lens).as_py() or 0
    keys = [norm]
    reps = [rep]
    norms = [norm]
    for i in range(max_len):
        sel = pc.greater(lens, i)
        sub_n = pc.filter(norm, sel)
        if len(sub_n) == 0:
            break
        head = pc.utf8_slice_codeunits(sub_n, 0, i)
        tail = pc.utf8_slice_codeunits(sub_n, i + 1)
        keys.append(pc.binary_join_element_wise(head, tail, ""))
        reps.append(pc.filter(rep, sel))
        norms.append(sub_n)
    blk = pa.concat_arrays(
        [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
         for k in keys])
    # ship the block key as a 64-bit hash, not the string: the block
    # sort is the stage's dominant exchange (~len(norm)+1 rows per
    # name) and numeric keys cut both its payload and its comparisons.
    # A hash collision only MERGES two unrelated blocks — extra
    # candidates that the exact verification drops — so completeness
    # is unaffected (equal keys always hash equal); internal-hash
    # contract per _hash_strings_u64.
    from octoray.stages.dedup import _hash_strings_u64

    return pa.table(
        {
            "_block": pa.array(_hash_strings_u64(blk, seed=0xB10C),
                               pa.uint64()),
            "_rep": pa.concat_arrays(
                [r.combine_chunks() if isinstance(r, pa.ChunkedArray) else r
                 for r in reps]),
            "_norm": pa.concat_arrays(
                [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                 for x in norms]),
        }
    )


def _pair_block(df, *, max_block: int):
    """Unordered candidate pairs within every block of one sorted
    batch, fully vectorized (no per-group Python dispatch — the
    initial block_map_groups version spent ~0.4 ms per group across
    tens of thousands of 2-row groups; a C-level self-merge is ~50x
    faster at identical output).

    Cost is sum(block_size^2), bounded by ``max_block`` * rows; blocks
    above the cap are degenerate near-constant vocabulary and are
    dropped (same escape hatch as jaccard_pairs' max_df)."""
    # a norm emits the same deletion key twice when two deletions
    # coincide (doubled letter) — collapse before pairing
    df = df.drop_duplicates(subset=["_block", "_rep"])
    sz = df.groupby("_block", sort=False)["_rep"].transform("size")
    df = df[(sz >= 2) & (sz <= max_block)]
    if len(df) == 0:
        return df.iloc[:0].assign(id_a=np.int64(0), id_b=np.int64(0),
                                  _na="", _nb="")[["id_a", "id_b",
                                                   "_na", "_nb"]]
    m = df.merge(df, on="_block", suffixes=("_x", "_y"))
    m = m[m["_rep_x"] < m["_rep_y"]]
    m = m.rename(columns={"_rep_x": "id_a", "_rep_y": "id_b",
                          "_norm_x": "_na", "_norm_y": "_nb"})
    return m[["id_a", "id_b", "_na", "_nb"]]


def _verify_pairs(batch: pa.Table) -> pa.Table:
    keep = [
        _edit_leq1(a, b)
        for a, b in zip(
            batch.column("_na").to_pylist(), batch.column("_nb").to_pylist()
        )
    ]
    return batch.filter(pa.array(keep, pa.bool_())).select(["id_a", "id_b"])


def fuzzy_pairs(mentions, *, id_col: str = "mention_id",
                name_col: str = "name",
                max_block: int = DEFAULT_MAX_BLOCK):
    """Distinct-norm near-match pairs at edit distance <= 1 (case-
    insensitive), as (id_a, id_b) with id = the norm's min mention id.

    Plan: per-norm min-id collapse (one combined sort) -> symmetric-
    delete block emission -> ONE block-key sort + in-block pair
    generation (block_map_groups) -> distinct pairs -> exact
    verification.  No stage is quadratic in corpus size."""
    reps = _norm_reps(mentions, id_col=id_col, name_col=name_col)
    return fuzzy_pairs_from_reps(reps, max_block=max_block)


def fuzzy_pairs_from_reps(reps, *, max_block: int = DEFAULT_MAX_BLOCK):
    from octoray.query import distinct_values

    blocks = reps.map_batches(_emit_blocks, batch_format="pyarrow")
    # ONE block-key sort co-locates equal keys per block
    # (assert_block_colocation invariant), then pair generation is a
    # vectorized per-block self-merge
    cand = colocated_sort(blocks, "_block").map_batches(
        lambda df: _pair_block(df, max_block=max_block),
        batch_format="pandas", batch_size=None,
    )
    cand = distinct_values(cand, ["id_a", "id_b", "_na", "_nb"])
    return cand.map_batches(_verify_pairs, batch_format="pyarrow")


def resolve_entities(mentions, *, id_col: str = "mention_id",
                     name_col: str = "name",
                     max_block: int = DEFAULT_MAX_BLOCK,
                     broadcast_limit: int = plan.BROADCAST_ROWS):
    """Full mention -> canonical-entity mapping.

    Returns (id_col, name_col, canonical_id) for EVERY input mention,
    where canonical_id is the minimum mention id of the mention's
    edit-distance-<=-1 connected component.  Exact-duplicate names
    share their per-norm min id by construction, so the component
    minimum over distinct norms equals the minimum over all raw
    mentions — the oracle's levenshtein closure over raw pairs agrees.

    The component map is bounded by the number of fuzzy-variant names
    (not corpus size): below ``broadcast_limit`` it broadcasts once
    via ray.put and the attachment streams; above it, a distributed
    merge-join does the same — the engine's standard stats-gated
    switch.  The mention->rep attachment is always a merge-join (one
    row per distinct norm is itself corpus-scale)."""
    import ray

    from octoray.query import merge_join
    from octoray.stages.dedup import dup_components

    # reps feeds BOTH the fuzzy stage and the attach join below —
    # pin it so the mention scan + per-norm sort run once, not twice
    reps = _norm_reps(mentions, id_col=id_col, name_col=name_col).materialize()
    pairs = fuzzy_pairs_from_reps(reps, max_block=max_block)
    comp = dup_components(pairs).materialize()

    normed = mentions.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column(id_col),
                name_col: b.column(name_col),
                "_norm": pc.utf8_lower(b.column(name_col)),
            }
        ),
        batch_format="pyarrow",
    )
    with_rep = merge_join(normed, reps, ["_norm"])

    if comp.count() <= broadcast_limit:
        cmap = {int(r["id"]): int(r["component"]) for r in comp.take_all()}
        ref = ray.put(cmap)

        def attach(df):
            m = ray.get(ref)
            df["canonical_id"] = (
                df["_rep"].map(m).fillna(df["_rep"]).astype("int64")
            )
            return df[[id_col, name_col, "canonical_id"]]

        out = with_rep.map_batches(attach, batch_format="pandas")
    else:
        cm = comp.map_batches(
            lambda t: t.rename_columns(["_rep", "_comp"]), batch_format="pyarrow"
        )
        joined = merge_join(with_rep, cm, ["_rep"], how="left_outer")
        out = joined.map_batches(
            lambda b: pa.table(
                {
                    id_col: b.column(id_col),
                    name_col: b.column(name_col),
                    "canonical_id": pc.coalesce(
                        b.column("_comp"), b.column("_rep")
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    return out.sort(id_col)


class MentionLinker:
    """Actor-pool entity linking against a BROADCAST dictionary — the
    north-star shape (lexicon shipped once via ray.put, symmetric-
    delete index built once per actor in ``__init__``, batched scoring
    in ``__call__``).  Reference analogue: the fixed spellcheck
    dictionaries (domain_geography.py / functions/spellcheck.py) that
    map known variants to canonical terms; this generalizes them to
    ANY lexicon with edit-distance-1 fuzzy fallback.

    Per mention: score = 0 for an exact (case-folded) lexicon match,
    1 for an edit-distance-1 match, null when nothing is within
    distance 1; ties broken by minimum entity_id — deterministic at
    any parallelism, and exactly reproducible by the SQL twin's
    min(dist)-then-min(entity_id) pick.

    Scale: the index is O(lexicon x name_len) dict entries per actor
    (a 1e5-name lexicon is ~3M keys); a 1e8-name lexicon would instead
    hash-partition BOTH sides by a deletion-key bucket — the
    fuzzy_pairs plan above — so the broadcast path is for
    dictionary-sized lexicons, which entity dictionaries are.
    Exact matches resolve through one vectorized hash-map pass; only
    misses walk the per-name deletion probe."""

    def __init__(self, lex_ref):
        import ray

        ids, norms = ray.get(lex_ref) if not isinstance(lex_ref, tuple) \
            else lex_ref
        self._ids = ids
        self._norms = norms
        exact: Dict[str, str] = {}
        index: Dict[str, list] = {}
        for i, nm in enumerate(norms):
            if nm not in exact or ids[i] < exact[nm]:
                exact[nm] = ids[i]
            index.setdefault(nm, []).append(i)
            for j in range(len(nm)):
                index.setdefault(nm[:j] + nm[j + 1:], []).append(i)
        self._exact = exact
        self._index = index

    def _probe(self, nm: str):
        cands: set = set(self._index.get(nm, ()))
        for j in range(len(nm)):
            cands.update(self._index.get(nm[:j] + nm[j + 1:], ()))
        best = None
        for ci in cands:
            ln = self._norms[ci]
            if nm != ln and not _edit_leq1(nm, ln):
                continue
            d = 0 if nm == ln else 1
            key = (d, self._ids[ci])
            if best is None or key < best:
                best = key
        return best

    def __call__(self, df):
        import pandas as pd

        nm = df["_norm"]
        ent = nm.map(self._exact)
        dist = pd.Series(0, index=df.index, dtype="float64").where(
            ent.notna())
        miss = ent.isna()
        if miss.any():
            probed = nm[miss].map(self._probe)
            hit_idx = probed.index[probed.notna()]
            ent.loc[hit_idx] = probed.loc[hit_idx].map(lambda t: t[1])
            dist.loc[hit_idx] = probed.loc[hit_idx].map(
                lambda t: float(t[0]))
        out = df.drop(columns=["_norm"]).copy()
        # NaN (miss) -> real null so the Arrow column is string + null
        out["entity_id"] = ent.astype(object).where(ent.notna(), None)
        out["dist"] = dist.astype("Int64")
        return out


def link_mentions(mentions, lexicon, *, id_col: str = "mention_id",
                  name_col: str = "name", concurrency: int = 4):
    """Link every mention to its best lexicon entity (see
    MentionLinker).  ``lexicon`` is a Dataset with (entity_id, name) —
    dictionary-sized by contract; it ships to the cluster ONCE."""
    import ray

    lex = lexicon.map_batches(
        lambda t: pa.table({
            "entity_id": t.column("entity_id"),
            "_ln": pc.utf8_lower(t.column("name")),
        }), batch_format="pyarrow").take_all()
    ids = [r["entity_id"] for r in lex]
    norms = [r["_ln"] for r in lex]
    ref = ray.put((ids, norms))

    def norm(t: pa.Table) -> pa.Table:
        return t.append_column("_norm", pc.cast(
            pc.utf8_lower(t.column(name_col)), pa.string()))

    return mentions.map_batches(norm, batch_format="pyarrow").map_batches(
        MentionLinker, fn_constructor_args=(ref,),
        batch_format="pandas", concurrency=concurrency)


def canonicalize_graph(triples, pairs, *, broadcast_limit: int = plan.BROADCAST_ROWS):
    """owl:sameAs reasoning: rewrite every subject (and URI-typed
    object) through the equivalence closure of ``pairs`` ((id_a, id_b)
    over URIs) and return the DISTINCT canonical graph (model.py:149
    P.sameAs; emit.py:290 emits the assertions, this collapses them).

    Components come from ``dup_components`` (stats-gated); the map is
    bounded by the sameAs assertion count, so below
    ``broadcast_limit`` the rewrite streams with ZERO shuffle (one
    broadcast dict + vectorized pandas map per batch) before the final
    distinct; above it, two merge-joins (subject, then object) do the
    same rewrite distributed."""
    import ray

    from octoray.query import merge_join
    from octoray.stages.canon import dedup_triples
    from octoray.stages.dedup import dup_components

    comp = dup_components(pairs).materialize()
    if comp.count() <= broadcast_limit:
        cmap = {r["id"]: r["component"] for r in comp.take_all()}
        ref = ray.put(cmap)

        def rewrite(df):
            m: Dict = ray.get(ref)
            df["subject"] = df["subject"].map(m).fillna(df["subject"])
            is_uri = df["object_datatype"].eq("uri")
            mapped = df["object"].map(m)
            hit = is_uri & mapped.notna()
            df.loc[hit, "object"] = mapped[hit]
            return df[["subject", "predicate", "object", "object_datatype"]]

        out = triples.map_batches(rewrite, batch_format="pandas")
    else:
        smap = comp.map_batches(
            lambda t: t.rename_columns(["subject", "_canon_s"]),
            batch_format="pyarrow",
        )
        out = merge_join(triples, smap, ["subject"], how="left_outer")
        out = out.map_batches(
            lambda b: pa.table(
                {
                    "subject": pc.coalesce(
                        b.column("_canon_s"), b.column("subject")
                    ),
                    "predicate": b.column("predicate"),
                    "object": b.column("object"),
                    "object_datatype": b.column("object_datatype"),
                }
            ),
            batch_format="pyarrow",
        )
        omap = comp.map_batches(
            lambda t: t.rename_columns(["object", "_canon_o"]),
            batch_format="pyarrow",
        )
        out = merge_join(out, omap, ["object"], how="left_outer")
        out = out.map_batches(
            lambda b: pa.table(
                {
                    "subject": b.column("subject"),
                    "predicate": b.column("predicate"),
                    "object": pc.if_else(
                        pc.equal(b.column("object_datatype"), "uri"),
                        pc.coalesce(b.column("_canon_o"), b.column("object")),
                        b.column("object"),
                    ),
                    "object_datatype": b.column("object_datatype"),
                }
            ),
            batch_format="pyarrow",
        )
    return dedup_triples(out)


# --------------------------------------------------------------------
# Incremental resolution store: resolve NEW mentions against a
# persisted canonical map without re-clustering the corpus — the
# entity-level analogue of pipelines/ingest.py's J9 incremental
# anti-join (a 1e12-doc corpus cannot re-cluster per snapshot).
#
# Layout under store_dir:
#   reps/               (_norm, _rep, canonical)   one row per norm
#   keys/bucket=K/      (_block u64, _rep, _norm)  symmetric-delete
#                       keys, hash-bucketed so an increment's lookup
#                       reads only the buckets its own keys hash to
#                       (the knn_ivf_indexed storage-pruning pattern).
#
# CONTRACT: mention ids are monotone across increments (later
# snapshots carry larger ids — true of any ingest sequence numbering).
# Under it, incremental resolution equals from-scratch re-clustering
# EXACTLY, including when a new mention BRIDGES two existing clusters:
# the affected clusters' stored rows are rewritten to the merged
# minimum, which is the from-scratch label.  Equality is pinned by the
# driver oracle (full recompute over the union) and pytest.
# --------------------------------------------------------------------

_N_KEY_BUCKETS = 8


def _store_keys_table(reps_tbl: pa.Table) -> pa.Table:
    blocks = _emit_blocks(reps_tbl)
    bucket = pc.cast(
        pc.bit_wise_and(blocks.column("_block"),
                        pa.scalar(_N_KEY_BUCKETS - 1, pa.uint64())),
        pa.int64())
    return blocks.append_column("bucket", bucket)


def resolve_store_build(mentions, store_dir: str, *,
                        id_col: str = "mention_id",
                        name_col: str = "name",
                        max_block: int = DEFAULT_MAX_BLOCK):
    """From-scratch resolution of ``mentions``; persists the norm-level
    canonical map + the blocking index to ``store_dir``."""
    from octoray.query import merge_join
    from octoray.stages.dedup import dup_components

    reps = _norm_reps(mentions, id_col=id_col,
                      name_col=name_col).materialize()
    pairs = fuzzy_pairs_from_reps(reps, max_block=max_block)
    comp = dup_components(pairs).materialize()
    canon = _attach_canonical(reps, comp, rep_col="_rep")
    canon = canon.map_batches(
        lambda t: pa.table({
            "_norm": pc.cast(t.column("_norm"), pa.string()),
            "_rep": t.column("_rep"),
            "canonical": t.column("canonical"),
        }), batch_format="pyarrow")
    canon.write_parquet(os.path.join(store_dir, "reps"))
    reps.map_batches(
        lambda t: _store_keys_table(pa.table({
            "_norm": pc.cast(t.column("_norm"), pa.string()),
            "_rep": t.column("_rep"),
        })), batch_format="pyarrow",
    ).write_parquet(os.path.join(store_dir, "keys"),
                    partition_cols=["bucket"])


def _attach_canonical(reps, comp, *, rep_col: str):
    """reps (_norm, rep) x components -> + canonical (= component of
    the rep, or the rep itself when isolated)."""
    from octoray.query import merge_join

    if comp.count() == 0:
        # no pairs at all: everyone is their own canonical (an empty
        # comp also goes schema-less through a rename — the Ray
        # empty-block quirk drop_empty_blocks documents)
        return reps.map_batches(
            lambda t: t.append_column("canonical", t.column(rep_col)),
            batch_format="pyarrow")
    cm = comp.map_batches(
        lambda t: t.rename_columns([rep_col, "_comp"]),
        batch_format="pyarrow")
    j = merge_join(reps, cm, [rep_col], how="left_outer")
    return j.map_batches(
        lambda t: t.append_column(
            "canonical", pc.coalesce(t.column("_comp"),
                                     t.column(rep_col))
        ).drop_columns(["_comp"]), batch_format="pyarrow")


def resolve_incremental(new_mentions, store_dir: str, *,
                        id_col: str = "mention_id",
                        name_col: str = "name",
                        max_block: int = DEFAULT_MAX_BLOCK):
    """Resolve ``new_mentions`` against the store, update it in place,
    and return the UPDATED norm-level map (norm, canonical) for the
    whole corpus so far.

    Work is proportional to the INCREMENT (+ the affected old
    clusters), never the stored corpus: known norms resolve with one
    join; novel norms block against the hash-bucketed key index; the
    component pass sees only novel pairs, novel-old bridge pairs, and
    the stored rows of TOUCHED clusters."""
    import ray.data as rd

    from octoray.query import distinct_values, merge_join, semi_join_auto
    from octoray.stages.dedup import dup_components
    from octoray.util import drop_empty_blocks

    store_reps = rd.read_parquet(os.path.join(store_dir, "reps"))
    new_reps = _norm_reps(new_mentions, id_col=id_col,
                          name_col=name_col).materialize()

    # split known / novel norms with ONE left join against the store
    marked = merge_join(
        new_reps,
        store_reps.map_batches(
            lambda t: pa.table({"_norm": t.column("_norm"),
                                "_old": t.column("_rep")}),
            batch_format="pyarrow"),
        ["_norm"], how="left_outer").materialize()
    novel = drop_empty_blocks(
        marked.map_batches(
            lambda t: t.filter(pc.is_null(t.column("_old"))).select(
                ["_norm", "_rep"]),
            batch_format="pyarrow").materialize(),
        pa.schema([("_norm", pa.string()), ("_rep", pa.int64())]))

    def _stored_map():
        return store_reps.map_batches(
            lambda t: pa.table({"norm": pc.cast(t.column("_norm"),
                                                pa.string()),
                                "canonical_id": t.column("canonical")}),
            batch_format="pyarrow")

    # increment of only KNOWN norms: a pure lookup — the store is
    # already the answer and stays untouched (no write amplification
    # for steady-state snapshots).
    if novel.count() == 0:
        return _stored_map()

    _pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    # novel-novel pairs: the scratch plan over the increment only.
    # nn_pairs / bridge / old_edges below are PINNED: each is bounded
    # by the increment (never the stored corpus), and leaving them
    # lazy fuses a 4-branch/3-sort/2-union mega-plan that deadlocks
    # Ray 2.49's streaming executor under a small CPU budget — and
    # would be re-executed per dup_components pass anyway.
    nn_pairs = drop_empty_blocks(
        fuzzy_pairs_from_reps(novel, max_block=max_block).materialize(),
        _pair_schema)

    # novel-old bridge pairs: novel keys join the bucketed store index
    novel_keys = novel.map_batches(
        lambda t: _store_keys_table(pa.table({
            "_norm": pc.cast(t.column("_norm"), pa.string()),
            "_rep": t.column("_rep")})),
        batch_format="pyarrow").materialize()
    # pruned read: only the buckets the increment's own keys hash to
    # leave storage (the knn_ivf_indexed explicit-file-list pattern)
    import glob as _glob

    buckets = sorted({r["bucket"] for r in distinct_values(
        novel_keys, ["bucket"]).take_all()})
    key_files = [f for b in buckets for f in sorted(_glob.glob(
        os.path.join(store_dir, "keys", f"bucket={b}", "*.parquet")))]
    if key_files:
        # a map over an EMPTY from_arrow block is skipped by Ray and
        # yields a schema-less Dataset, so the no-files fallback below
        # must be built directly in the joined shape
        store_side = rd.read_parquet(key_files).map_batches(
            lambda t: pa.table({"_block": pc.cast(t.column("_block"),
                                                  pa.uint64()),
                                "id_a": t.column("_rep"),
                                "_na": pc.cast(t.column("_norm"),
                                               pa.string())}),
            batch_format="pyarrow")
    else:
        store_side = rd.from_arrow(pa.table({
            "_block": pa.array([], pa.uint64()),
            "id_a": pa.array([], pa.int64()),
            "_na": pa.array([], pa.string())}))
    bridge = merge_join(
        novel_keys.map_batches(
            lambda t: pa.table({"_block": t.column("_block"),
                                "id_b": t.column("_rep"),
                                "_nb": t.column("_norm")}),
            batch_format="pyarrow"),
        store_side,
        ["_block"])
    bridge = distinct_values(bridge, ["id_a", "id_b", "_na", "_nb"])
    bridge = drop_empty_blocks(
        bridge.map_batches(_verify_pairs,
                           batch_format="pyarrow").materialize(),
        _pair_schema)

    # stored rows of clusters touched by a bridge, as (rep, canonical)
    # edges — so a merge relabels the WHOLE old cluster, exactly as a
    # from-scratch pass would.  No bridges (the common steady-state
    # case) means no old cluster is touched at all — skip the store
    # joins entirely (also: mapping over an empty block yields a
    # schema-less Dataset that would wedge merge_join).
    if bridge.count() == 0:
        old_edges = rd.from_arrow(_pair_schema.empty_table())
    else:
        touched = bridge.map_batches(
            lambda t: pa.table({"_rep": t.column("id_a")}),
            batch_format="pyarrow")
        touched_canon = drop_empty_blocks(
            merge_join(
                store_reps.select_columns(["_rep", "canonical"]), touched,
                ["_rep"]).materialize(),
            pa.schema([("_rep", pa.int64()), ("canonical", pa.int64())]))
        old_edges = semi_join_auto(
            store_reps.select_columns(["_rep", "canonical"]), "canonical",
            touched_canon.select_columns(["canonical"]))
        old_edges = drop_empty_blocks(
            old_edges.map_batches(
                lambda t: pa.table({"id_a": t.column("_rep"),
                                    "id_b": t.column("canonical")}),
                batch_format="pyarrow").materialize(),
            _pair_schema)

    edges = nn_pairs.union(bridge.select_columns(["id_a", "id_b"]),
                           old_edges)
    comp = dup_components(edges).materialize()

    # updated store: novel rows + old rows (relabeled where touched)
    new_rows = _attach_canonical(novel, comp, rep_col="_rep")
    new_rows = new_rows.map_batches(
        lambda t: pa.table({
            "_norm": pc.cast(t.column("_norm"), pa.string()),
            "_rep": t.column("_rep"),
            "canonical": t.column("canonical")}),
        batch_format="pyarrow")
    relabel = _attach_canonical(
        store_reps.map_batches(
            lambda t: pa.table({"_norm": t.column("_norm"),
                                "_rep": t.column("_rep"),
                                "_old_canon": t.column("canonical")}),
            batch_format="pyarrow"),
        comp, rep_col="_rep")
    old_rows = relabel.map_batches(
        lambda t: pa.table({
            "_norm": pc.cast(t.column("_norm"), pa.string()),
            "_rep": t.column("_rep"),
            # rows not in the component pass keep their stored label
            "canonical": pc.min_element_wise(
                t.column("canonical"), t.column("_old_canon")),
        }), batch_format="pyarrow")
    updated = old_rows.union(new_rows).materialize()

    # persist: rewrite reps, append the novel keys
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="octoray_ent_", dir=store_dir)
    updated.write_parquet(tmp)
    reps_dir = os.path.join(store_dir, "reps")
    shutil.rmtree(reps_dir)
    os.rename(tmp, reps_dir)
    novel_keys.write_parquet(os.path.join(store_dir, "keys"),
                             partition_cols=["bucket"])

    return updated.map_batches(
        lambda t: pa.table({"norm": t.column("_norm"),
                            "canonical_id": t.column("canonical")}),
        batch_format="pyarrow")
