"""Mergeable sketches: approximate distinct counting at corpus scale.

A 100-TB profile pass ("how many distinct users / urls / tokens per
group?") cannot afford an exact per-group DISTINCT shuffle over the
raw rows.  The KMV (k-minimum-values) sketch bounds the exchange to k
rows per (group, block): each block keeps the k smallest 64-bit value
hashes it sees per group, the union of partials is deduped, and the
k-th smallest surviving hash estimates the distinct count as
(k-1) / (h_(k) / 2^64)  [Bar-Yossef et al. 2002].  Below k distinct
hashes the sketch IS the exact answer.

The sketch is exactly mergeable (min is idempotent), so the estimate
is independent of block boundaries and parallelism — the property the
driver's hash-compare gate needs.  The hash is md5's lower 8 digest
bytes little-endian, chosen because DuckDB exposes the identical
function (``md5_number_lower``): the SQL oracle computes the SAME
estimate bit-for-bit, making an *approximate* operator exactly
checkable.

Reference analogue: octofludb profiles tag/strain cardinalities with
SPARQL COUNT(DISTINCT ...) (e.g. tag reports, ui.py fetch family);
this is that profile at a scale where exact counting is the wrong
tool.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from octoray.util import round_half_up_scalar

_TWO64 = float(2**64)


def _md5_lower64(values: Sequence[str]) -> np.ndarray:
    """DuckDB ``md5_number_lower`` twin: lower 8 md5 digest bytes,
    little-endian, as uint64.  Per-value hashlib loop — bounded by the
    DISTINCT values per block (the caller dedups first), not raw rows,
    and the k-min prune caps what leaves the block at k."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.md5(v.encode()).digest()[8:16], "little")
    return out


def approx_distinct(ds, group_col: str, value_col: str, *, k: int = 64):
    """(group, approx_distinct): KMV estimate of COUNT(DISTINCT value)
    per group.  Exact when a group has <= k distinct hashes.

    Plan: block-local distinct (group, value) -> hash -> keep k
    smallest hashes per group (the map-side combiner: a hash can only
    be among the global k minima if it is among its block's k minima)
    -> ONE range sort on the group key -> block-local merge + estimate.
    The exchange moves at most k x blocks rows per group regardless of
    input size."""

    def partial(t: pa.Table) -> pa.Table:
        # distinct pairs within the block, then hash each distinct value
        pairs = (t.select([group_col, value_col])
                  .group_by([group_col, value_col], use_threads=False)
                  .aggregate([]))
        vals = [str(v) for v in pairs.column(value_col).to_pylist()]
        df = pd.DataFrame({
            group_col: pairs.column(group_col).to_pandas(),
            "hv": _md5_lower64(vals),
        })
        df = df.sort_values([group_col, "hv"], kind="mergesort")
        return df.groupby(group_col, sort=False, group_keys=False).head(k)

    pre = ds.map_batches(partial, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({group_col: df[group_col],
                                 "approx_distinct": pd.Series([], dtype="float64")})
        groups, ests = [], []
        for g, sub in df.groupby(group_col, sort=False):
            hv = np.unique(sub["hv"].to_numpy())  # cross-block dedup
            nd = len(hv)
            # strictly fewer than k survivors means NOTHING was pruned
            # (the partial pass caps each block at k, so a group with
            # >= k true distincts always surfaces exactly k here) —
            # only then is the count exact
            if nd < k:
                est = float(nd)
            else:
                est = (k - 1) / (float(hv[k - 1]) / _TWO64)
            groups.append(g)
            ests.append(round_half_up_scalar(est, 6))
        return pd.DataFrame({group_col: groups, "approx_distinct": ests})

    return pre.sort([group_col]).map_batches(
        finish, batch_format="pandas", batch_size=None)


def sql_approx_distinct(table: str, group_col: str, value_col: str, *,
                        k: int = 64) -> str:
    """DuckDB twin: identical hash (md5_number_lower), identical
    estimator, identical rounding grid."""
    return f"""
        WITH h AS (SELECT DISTINCT {group_col},
                          md5_number_lower(CAST({value_col} AS VARCHAR)) AS hv
                   FROM {table}),
        r AS (SELECT {group_col}, hv,
                     row_number() OVER (PARTITION BY {group_col}
                                        ORDER BY hv) AS rn,
                     count(*) OVER (PARTITION BY {group_col}) AS nd
              FROM h)
        SELECT {group_col},
               floor((CASE WHEN nd < {k} THEN CAST(nd AS DOUBLE)
                      ELSE ({k} - 1) / (CAST(hv AS DOUBLE)
                                        / 18446744073709551616.0)
                      END) * 1000000 + 0.5) / 1000000 AS approx_distinct
        FROM r WHERE rn = least(nd, {k})
    """
