"""Central planning knobs: the engine's stats gates and the
colocation-checked sort that every block-local wide operation routes
through.

Two concerns live here, both engine-wide invariants rather than
per-stage details:

1. **Named stats gates** — the thresholds at which a plan switches
   between a driver/broadcast fast path and the distributed path.
   These used to be scattered literals (2M in query.py, 200k in
   patterns.py, 500k in graphalgo.py); VERDICT r4 #6 asked for one
   documented source of truth.  Changing a gate here changes every
   switch consistently; defaults preserve the round-4 behavior
   exactly.

2. **The sort-block colocation invariant** — dedup, ``merge_join``,
   ``block_map_groups``, ``grouped_top_k`` and the whole
   ``sorted_groupby_*`` family assume that after ``Dataset.sort(k)``
   all rows with equal ``k`` share ONE output block.  That holds on
   ray 2.49 (each sort reduce task emits one block) but is an
   UNDOCUMENTED Ray internal; a future Ray that splits sort outputs
   at ``target_max_block_size`` would make block-local dedup silently
   *miss* cross-block duplicates (VERDICT r4 #1).  ``colocated_sort``
   makes the assumption structural: the sort result is verified —
   ON BY DEFAULT — by an O(blocks) bounds pass before any block-local
   consumer sees it.  A violation raises ``BlockColocationError``
   loudly instead of corrupting results.

   Cost model: a sort is already an all-to-all barrier (the whole
   sorted dataset exists in the object store at the barrier), so
   materializing its output adds no extra upstream execution; the
   verification pass reads two rows per block zero-copy and ships
   O(blocks) bytes to the driver.  Measured <2%% of the flagship
   headline (BASELINE.md).  ``OCTORAY_CHECK_BLOCKS=0`` opts out for
   benchmarking experiments; production paths leave it on.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Sequence, Union

import pyarrow as pa

# --------------------------------------------------------------------
# Named stats gates (single source of truth — VERDICT r4 #6)
# --------------------------------------------------------------------

#: Max rows of a join / semi-join / anti-join KEY SIDE that is
#: collected to the driver and broadcast once via ``ray.put`` (each
#: task then probes it map-side; the join streams with zero shuffle).
#: Above this the engine switches to the distributed merge/hash join.
#: ~2M string keys is O(100 MB) on a 128 GiB head node — far below
#: the point where re-shipping the broadcast to every node costs more
#: than one all-to-all of the big side.  Sites: query.hash_join /
#: semi_join_auto, SPARQL negation (patterns.py), canon.triple_delta,
#: the incremental-ingest resume anti-join.
BROADCAST_ROWS: int = 2_000_000

#: Max rows PER SIDE for the SPARQL pattern-fold driver fast path:
#: below it, both binding sets are collected and folded locally
#: (measured ~100x fewer Ray executions for a 3-branch UNION query);
#: beyond it the SAME fold runs as distributed joins.  Applies per
#: BGP step, so intermediate growth re-checks the gate each step.
LOCAL_FOLD_ROWS: int = 200_000

#: Max edges for the graph algorithms' collected-edges driver fast
#: path (pagerank / HITS / k-core / components iterate driver-side
#: below it).  The distributed iteration exists beyond the gate and
#: is pinned equal to the driver path by tests.
GRAPH_DRIVER_EDGES: int = 500_000

#: k-core peel driver gate — higher than GRAPH_DRIVER_EDGES because
#: the peel fixpoint is many cheap rounds (driver round-trips dominate
#: the distributed path far longer than one-shot algorithms).
KCORE_DRIVER_EDGES: int = 5_000_000

#: Pair-payload attach broadcast gate (LSH verification): payloads
#: are KB-sized binary signatures, so the comfortable broadcast size
#: in ROWS is ~10x lower than for bare string keys.
PAYLOAD_BROADCAST_ROWS: int = 200_000

#: Quality-classifier training fold: the standardized feature matrix
#: (8 float64 features/doc) is collected for full-batch L-BFGS-style
#: iteration below this; above it the per-block gradient combiner
#: path trains distributed.
QUALMODEL_DRIVER_ROWS: int = 2_000_000

#: BPE trainer fold: distinct (word, count) rows collected for the
#: driver merge loop below this; the distributed pair-count path takes
#: over beyond it (identical math, pinned by tests).
BPE_DRIVER_ROWS: int = 500_000

#: Web-graph iterative-rank driver gate (pagerank / HITS / bow-tie /
#: keep-first md5 dedup fold): like KCORE_DRIVER_EDGES, many cheap
#: rounds favor the driver fold far past the one-shot gate.
WEB_DRIVER_EDGES: int = 5_000_000


def _env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() not in ("0", "false", "no", "off", "")


def block_check_enabled() -> bool:
    """Whether :func:`colocated_sort` verifies its output.  Default ON
    (the invariant is correctness-critical); ``OCTORAY_CHECK_BLOCKS=0``
    disables for benchmarking comparisons."""
    return _env_flag("OCTORAY_CHECK_BLOCKS", True)


class BlockColocationError(AssertionError):
    """A sort emitted equal keys straddling two output blocks — the
    one-block-per-sort-partition Ray internal this engine's
    block-local grouping relies on no longer holds.  Block-local
    dedup/grouping downstream would silently merge only within-block;
    fail loudly instead."""


# --------------------------------------------------------------------
# The colocation-checked sort
# --------------------------------------------------------------------


def block_bounds(ds, keys: Sequence[str]) -> List[tuple]:
    """(first, last) key tuple of every NON-EMPTY block of ``ds``, in
    dataset block order.  O(blocks) driver rows: each block ships two
    pickled key tuples (uniform binary schema regardless of key types,
    so empty schema-less Ray blocks can't poison the union schema)."""
    keys = list(keys)

    def bounds(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or any(k not in t.schema.names for k in keys):
            return pa.table({"_lo": pa.array([], pa.binary()),
                             "_hi": pa.array([], pa.binary())})
        lo = pickle.dumps(tuple(t.column(k)[0].as_py() for k in keys))
        hi = pickle.dumps(tuple(t.column(k)[n - 1].as_py() for k in keys))
        return pa.table({"_lo": pa.array([lo], pa.binary()),
                         "_hi": pa.array([hi], pa.binary())})

    rows = ds.map_batches(bounds, batch_format="pyarrow",
                          batch_size=None).take_all()
    return [(pickle.loads(r["_lo"]), pickle.loads(r["_hi"])) for r in rows]


def verify_block_colocation(ds, keys: Sequence[str], *,
                            ordered: bool = True) -> int:
    """Raise :class:`BlockColocationError` if any key straddles a
    block boundary of ``ds`` (assumed sorted on ``keys``).

    Blocks arrive in dataset order — post-sort, global key order — and
    each block is internally sorted, so a straddled key can only
    appear as last-of-block-i == first-of-block-i+1.  The equality
    check is direction- and type-agnostic (covers descending sorts and
    null keys).  With ``ordered=True`` (ascending sorts) the range
    ordering hi_i <= lo_i+1 is additionally checked where the tuples
    are comparable, catching a sort that interleaved blocks outright.
    Returns the number of non-empty blocks inspected."""
    ranges = block_bounds(ds, keys)
    for i, ((_lo1, hi1), (lo2, _hi2)) in enumerate(zip(ranges, ranges[1:])):
        if hi1 == lo2:
            raise BlockColocationError(
                f"sort key {hi1!r} straddles blocks {i} and {i + 1} — a "
                "Ray sort partition was split; block-local grouping is "
                "unsafe on this dataset")
        if ordered:
            try:
                bad = hi1 > lo2
            except TypeError:  # None vs value — equality already vetted
                bad = False
            if bad:
                raise BlockColocationError(
                    f"sorted blocks out of order: block {i} ends at "
                    f"{hi1!r} after block {i + 1} starts at {lo2!r}")
    return len(ranges)


def colocated_sort(ds, keys: Union[str, Sequence[str]], *,
                   descending=False):
    """``Dataset.sort`` + on-by-default structural verification that
    equal keys share one output block — THE chokepoint for every
    block-local wide op (dedup, sorted_groupby_*, merge_join,
    grouped_top_k, block_map_groups).

    When the check is on, the sort output is materialized (free at the
    barrier — see module docstring) and :func:`verify_block_colocation`
    runs before the dataset is handed to the block-local consumer, so
    a split sort partition fails the JOB, not the answer."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    out = ds.sort(key_list, descending=descending)
    if not block_check_enabled():
        return out
    out = out.materialize()
    asc = (descending is False or descending is None or
           (isinstance(descending, (list, tuple)) and not any(descending)))
    verify_block_colocation(out, key_list, ordered=asc)
    return out
