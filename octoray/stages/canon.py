"""Canonicalization: exact triple dedup, subject grouping, global sort.

The engine's wide operations (SURVEY.md §7.3) with skew handled
explicitly:

  - exact dedup on (s, p, o, dt)  — reference's set-union semantics
    (classes.py:183-189) and idempotent upload (README.md:94-96, K4)
  - subject-key aggregation      — entity canonicalization (J1); hub
    subjects (world:USA-style) are pre-combined per batch so the
    shuffle moves one row per (batch, key) instead of one per triple
  - deterministic global sort    — the Turtle golden-diff ordering
    (test-data/Makefile:5-6, §2.8)

Dedup strategy: per-block Arrow combiner -> ONE range-partitioned
global sort -> vectorized adjacent-row dedup per block.  Ray's
sort-based ``groupby().aggregate`` pays per-group accumulator costs
(measured ~10x slower on the same rows); the sort path is wholly
vectorized AND leaves the output in canonical order, so dedup and the
golden sort share a single all-to-all.  Correctness hinges on range
partitioning sending all copies of a key to one partition — pinned by
tests/test_kg_pipeline.py (dedup-exactness + sortedness assertions).

All steps are Dataset->Dataset and streaming; nothing materializes the
full input on the driver.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc

from octoray import plan

TRIPLE_COLS = ["subject", "predicate", "object", "object_datatype"]


def _local_dedup(batch: pa.Table, extra_cols=()) -> pa.Table:
    """Per-batch combiner: drop duplicate rows before the shuffle.

    Uses Arrow group-by on all columns — zero-copy in, one compact
    table out.  At 10^12-doc scale most duplicates are within-page or
    within-block (repeated mentions), so the all-to-all exchange
    shrinks before it happens.
    """
    cols = [c for c in list(TRIPLE_COLS) + list(extra_cols) if c in batch.schema.names]
    return batch.group_by(cols, use_threads=False).aggregate([]).select(cols)


def _sorted_block_dedup(batch: pa.Table, extra_cols=()) -> pa.Table:
    """Drop adjacent duplicate rows of a SORTED block (vectorized:
    one shifted not-equal per column, no re-sort, no per-group calls).
    Globally exact downstream of a range-partitioned sort because all
    copies of a key share one partition."""
    n = batch.num_rows
    if n <= 1:
        return batch
    keep: Optional[pa.Array] = None
    for c in list(TRIPLE_COLS) + list(extra_cols):
        if c not in batch.schema.names:
            continue
        arr = batch.column(c).combine_chunks()
        # not_equal yields null when either side is null, and
        # Table.filter drops null-mask rows — which would silently
        # DELETE rows with a null triple column (possible when
        # compact()/read_kg ingests externally produced parquet).
        # Treat null-vs-value as unequal (keep) and null-vs-null as
        # equal (this column votes 'duplicate').
        a, b = arr.slice(1), arr.slice(0, n - 1)
        neq = pc.not_equal(a, b)
        either_null = pc.or_(pc.is_null(a), pc.is_null(b))
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        neq = pc.if_else(either_null, pc.invert(both_null), neq)
        keep = neq if keep is None else pc.or_(keep, neq)
    mask = pa.concat_arrays([pa.array([True]), keep])
    return batch.filter(mask)


_CANON_KEY = "_canon_key"


def _with_canon_key(batch: pa.Table, cols) -> pa.Table:
    """Append ONE composite sort key whose bytewise order IS the tuple
    order of the columns — Ray then sorts/range-partitions a single
    string column instead of four (measured ~1.6x on the 3M-row
    canonical sort; string comparisons stop at the first differing
    byte instead of re-dispatching per column).

    Memcomparable encoding: each cell escapes NUL (``\\x00`` ->
    ``\\x00\\x01``), cells join on the ``\\x00\\x00`` terminator.  The
    escape keeps the mapping injective and order-preserving for
    ARBITRARY cell bytes — a NUL inside a value (possible in raw web
    text) would otherwise collide with the separator and reorder rows
    against the documented (s,p,o,dt) tuple order (hypothesis-found).
    Null cells encode as the unreachable pair ``\\x00\\x02`` (real
    cells escape to ``\\x00\\x01`` pairs only), so nulls dedup as
    equal-to-null yet never collide with the empty string or any real
    value — same null semantics the per-column compare implemented."""
    arrs = [
        pc.replace_substring(batch.column(c), "\x00", "\x00\x01")
        for c in cols if c in batch.schema.names
    ]
    # the join kernel needs ONE uniform string type: mixed
    # string/large_string inputs (parquet readers emit large_string,
    # in-memory template instantiation emits string) have no kernel
    if any(pa.types.is_large_string(a.type) for a in arrs):
        arrs = [a.cast(pa.large_string()) for a in arrs]
        sep = pa.scalar("\x00\x00", pa.large_string())
    else:
        sep = "\x00\x00"
    k = pc.binary_join_element_wise(
        *arrs, sep, null_handling="replace",
        null_replacement="\x00\x02"
    )
    return batch.append_column(_CANON_KEY, k)


def _key_dedup_sorted(batch: pa.Table) -> pa.Table:
    """Adjacent-row dedup on the composite key of a SORTED block, then
    drop the key.  One not_equal on one column."""
    n = batch.num_rows
    if n == 0:
        return batch.drop_columns([_CANON_KEY])
    if n == 1:
        return batch.drop_columns([_CANON_KEY])
    a = batch.column(_CANON_KEY).combine_chunks()
    neq = pc.not_equal(a.slice(1), a.slice(0, n - 1))
    if isinstance(neq, pa.ChunkedArray):
        neq = neq.combine_chunks()
    mask = pa.concat_arrays([pa.array([True]), neq])
    return batch.filter(mask).drop_columns([_CANON_KEY])


def sort_canonical(ds):
    """Deterministic (s, p, o, dt) global sort — range-partitioned
    shuffle; required for golden-diff parity (§2.8)."""
    return ds.sort(TRIPLE_COLS)


def dedup_triples(ds, *, local_only: bool = False, extra_cols=()):
    """Exact distinct on the 4 triple columns (D1), returned in
    canonical (s,p,o,dt) order.

    combiner -> global sort -> adjacent dedup per block (batch_size
    None keeps sort partitions intact so the adjacency argument
    holds).  ``local_only`` skips the global exchange (per-shard
    dedup; cross-block duplicates may remain).  ``extra_cols`` become
    LEADING dedup/sort keys — the sharded single-pipeline build passes
    ``("shard",)`` so one sort yields per-shard-exact dedup with rows
    grouped for a partitioned write.
    """
    extra = tuple(extra_cols)
    ds = ds.map_batches(lambda b: _local_dedup(b, extra), batch_format="pyarrow")
    if local_only:
        return ds
    cols = list(extra) + TRIPLE_COLS
    ds = ds.map_batches(lambda b: _with_canon_key(b, cols), batch_format="pyarrow")
    # colocated_sort = sort + on-by-default verification that no key
    # straddles a block boundary (octoray.plan; VERDICT r4 #1) — the
    # adjacency dedup below is globally exact only under that invariant
    from octoray.plan import colocated_sort

    ds = colocated_sort(ds, _CANON_KEY)
    return ds.map_batches(_key_dedup_sorted, batch_format="pyarrow", batch_size=None)


def canonicalize(ds, *, local_only: bool = False):
    """dedup -> canonical (s,p,o,dt) order; the graph materialization
    contract.  The global path is already sorted by construction; the
    per-shard (``local_only``) path sorts explicitly."""
    ds = dedup_triples(ds, local_only=local_only)
    if local_only:
        ds = sort_canonical(ds)
    return ds


def _partial_subject_counts(batch: pa.Table) -> pa.Table:
    t = batch.group_by(["subject"], use_threads=False).aggregate([([], "count_all")])
    return t.rename_columns(["subject", "partial"])


def subject_degree(ds, *, combined: bool = True):
    """Triples per subject (entity 'degree') — the J1 canonicalization
    aggregate.  With ``combined=True`` (default), counts are partially
    aggregated inside each batch first, so hot subjects ship one row
    per block instead of one per triple — the explicit skew strategy
    of the north rule.  ``combined=False`` is the naive single-shuffle
    version kept for the salted==unsalted equivalence test.
    """
    from ray.data.aggregate import Count, Sum

    if combined:
        partial = ds.map_batches(_partial_subject_counts, batch_format="pyarrow")
        out = partial.groupby("subject").aggregate(Sum("partial", alias_name="degree"))
    else:
        out = ds.groupby("subject").aggregate(Count(alias_name="degree"))
    return out


def triple_delta(old, new, *, broadcast_limit: int = plan.BROADCAST_ROWS):
    """Graph diff between two DEDUPED triple Datasets: (op, subject,
    predicate, object, object_datatype) with op = 'removed' (in old
    only) or 'added' (in new only) — the incremental-maintenance
    product of re-running KG construction over a fresh crawl snapshot
    (the north star's re-crawl story: ship the delta, not the graph).

    Scale shape: each direction is ONE stats-gated anti-join
    (query.semi_join_auto — broadcast below the limit, distributed J8
    hash join above) on the '\\x1f'-joined 4-column composite key;
    the two directions union without a barrier."""
    import pyarrow.compute as pc

    from octoray.query import semi_join_auto

    COLS = ["subject", "predicate", "object", "object_datatype"]

    def keyed(t: pa.Table) -> pa.Table:
        parts = []
        for c in COLS:
            parts.append(t.column(c).cast(pa.string()))
            if c != COLS[-1]:
                parts.append("\x1f")
        return t.append_column(
            "k", pc.binary_join_element_wise(*parts))

    ko = old.map_batches(keyed, batch_format="pyarrow")
    kn = new.map_batches(keyed, batch_format="pyarrow")

    def tag(ds, op: str):
        return ds.map_batches(
            lambda t, _op=op: pa.table(
                {"op": pa.array([_op] * t.num_rows, pa.string()),
                 **{c: t.column(c) for c in COLS}}),
            batch_format="pyarrow")

    removed = semi_join_auto(ko, "k", kn.select_columns(["k"]),
                             anti=True, broadcast_limit=broadcast_limit)
    added = semi_join_auto(kn, "k", ko.select_columns(["k"]),
                           anti=True, broadcast_limit=broadcast_limit)
    return tag(removed, "removed").union(tag(added, "added"))


def sql_triple_delta(old_src: str, new_src: str) -> str:
    """DuckDB twin of triple_delta; boundaries: the two raw emitted
    triple dumps (dedup re-derived here)."""
    d4 = "SELECT DISTINCT subject, predicate, object, object_datatype"
    return f"""
        WITH o AS ({d4} FROM {old_src}),
        n AS ({d4} FROM {new_src})
        SELECT 'removed' AS op, * FROM (SELECT * FROM o EXCEPT
                                        SELECT * FROM n)
        UNION ALL
        SELECT 'added' AS op, * FROM (SELECT * FROM n EXCEPT
                                      SELECT * FROM o)
    """
