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

All steps are Dataset->Dataset and streaming; nothing materializes the
full input on the driver.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc

TRIPLE_COLS = ["subject", "predicate", "object", "object_datatype"]


def _local_dedup(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: drop duplicate rows before the shuffle.

    Uses Arrow group-by on all columns — zero-copy in, one compact
    table out.  This is the 'salted pre-combine' for the dedup
    shuffle: at 10^12-doc scale most duplicates are within-page or
    within-block (repeated mentions), so the all-to-all exchange
    shrinks before it happens.
    """
    cols = [c for c in TRIPLE_COLS if c in batch.schema.names]
    return batch.group_by(cols, use_threads=False).aggregate([]).select(cols)


def dedup_triples(ds, *, local_only: bool = False):
    """Exact distinct on the 4 triple columns (D1).

    Per-batch local dedup (combiner) -> global hash-aggregate shuffle
    via ``groupby(...).count()`` (the aggregate path is cheaper than
    map_groups: no per-group Python callback).  The count column is
    dropped afterwards.
    """
    ds = ds.map_batches(_local_dedup, batch_format="pyarrow")
    if local_only:
        return ds
    deduped = ds.groupby(TRIPLE_COLS).count()
    return deduped.select_columns(TRIPLE_COLS)


def sort_canonical(ds):
    """Deterministic (s, p, o, dt) global sort — range-partitioned
    shuffle; required for golden-diff parity (§2.8)."""
    return ds.sort(TRIPLE_COLS)


def canonicalize(ds, *, local_only: bool = False):
    """dedup -> sort; the graph materialization contract."""
    ds = dedup_triples(ds, local_only=local_only)
    return sort_canonical(ds)


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
