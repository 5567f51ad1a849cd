"""Cross-engine numeric parity helpers.

The driver compares Ray results against DuckDB oracles by value hash,
so every float that reaches an output column must be produced by an
arithmetic recipe BOTH engines can evaluate bit-identically:

  - ``round_half_up``: floor(x * 10^d + 0.5) / 10^d — the same three
    IEEE ops DuckDB runs for ``floor(x*10^d + 0.5)/10^d``.  (Neither
    pc.round (half-to-even) nor DuckDB round (half-away) matches the
    other on dyadic boundaries; this formula sidesteps rounding-mode
    semantics entirely by being the identical expression.)
  - money columns are summed as integer cents (exact in int64 and in
    float64's 2^53 window), then divided by 100.0 once at the end —
    summation ORDER then cannot matter, which is what makes a
    distributed Ray sum comparable to a single-threaded DuckDB sum.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc


def round_half_up(arr: pa.Array | pa.ChunkedArray, decimals: int):
    """floor(x*10^d + 0.5)/10^d over an Arrow array."""
    scale = float(10**decimals)
    scaled = pc.add(pc.multiply(pc.cast(arr, pa.float64()), scale), 0.5)
    return pc.divide(pc.floor(scaled), scale)


def round_half_up_scalar(x: float, decimals: int) -> float:
    scale = float(10**decimals)
    return math.floor(x * scale + 0.5) / scale


def round_columns(t: pa.Table, cols, decimals: int) -> pa.Table:
    for c in cols:
        t = t.set_column(t.schema.get_field_index(c), c, round_half_up(t.column(c), decimals))
    return t


def cents(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """2-decimal money column -> exact integer cents (int64)."""
    return pc.cast(pc.round(pc.multiply(pc.cast(arr, pa.float64()), 100.0), 0), pa.int64())


def sql_round(expr: str, decimals: int) -> str:
    """The DuckDB-side twin of round_half_up."""
    scale = 10**decimals
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def drop_empty_blocks(materialized_ds, schema: pa.Schema):
    """Rebuild a MATERIALIZED Dataset without its empty blocks.

    On Ray 2.49 the hash-shuffle join/groupby operators emit
    SCHEMA-LESS empty blocks for empty partitions, map operators skip
    empty blocks entirely (so no map_batches UDF can normalize them),
    and a downstream join whose partition builder receives such a
    block first dies with "No match or multiple matches for key
    FieldRef".  This guard filters them out driver-side using block
    METADATA only (no block fetch, zero-copy refs), which is O(blocks)
    and scale-safe.  ``schema`` supplies the result schema when every
    block is empty."""
    import ray.data as rd

    refs = []
    for bundle in materialized_ds.iter_internal_ref_bundles():
        for bref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(bref)
    if not refs:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)
