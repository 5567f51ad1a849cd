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

from octoray.plan import colocated_sort

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


def approx_distinct(ds, group_col, value_col: str, *, k: int = 64):
    """(group..., approx_distinct): KMV estimate of
    COUNT(DISTINCT value) per group (``group_col`` may be one column
    name or a list — e.g. (event_type, window_start) for windowed
    distinct users).  Exact when a group has < k distinct hashes.

    Plan: block-local distinct (group, value) -> hash -> keep k
    smallest hashes per group (the map-side combiner: a hash can only
    be among the global k minima if it is among its block's k minima)
    -> ONE range sort on the group key -> block-local merge + estimate.
    The exchange moves at most k x blocks rows per group regardless of
    input size."""
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)

    def partial(t: pa.Table) -> pa.Table:
        # distinct tuples within the block, then hash each distinct value
        pairs = (t.select(gcols + [value_col])
                  .group_by(gcols + [value_col], use_threads=False)
                  .aggregate([]))
        vals = [str(v) for v in pairs.column(value_col).to_pylist()]
        df = pairs.select(gcols).to_pandas()
        df["hv"] = _md5_lower64(vals)
        df = df.sort_values(gcols + ["hv"], kind="mergesort")
        return df.groupby(gcols, sort=False, group_keys=False).head(k)

    pre = ds.map_batches(partial, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = {c: df[c] for c in gcols}
            out["approx_distinct"] = pd.Series([], dtype="float64")
            return pd.DataFrame(out)
        groups, ests = [], []
        for g, sub in df.groupby(gcols, sort=False):
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
            groups.append(g if isinstance(g, tuple) else (g,))
            ests.append(round_half_up_scalar(est, 6))
        out = {c: [g[i] for g in groups] for i, c in enumerate(gcols)}
        out["approx_distinct"] = ests
        return pd.DataFrame(out)

    return colocated_sort(pre, gcols).map_batches(
        finish, batch_format="pandas", batch_size=None)


def approx_quantiles(ds, group_col, id_col: str, value_col: str, *,
                     k: int = 256, qs: Sequence[float] = (0.5, 0.9, 0.99)):
    """Per-group approximate quantiles from a BOTTOM-K uniform sample.

    The k rows with the smallest md5(id) hashes form a uniform
    without-replacement sample of the group [bottom-k sampling,
    Cohen & Kaplan 2007]; the requested quantiles are then read off
    the sorted sample (discrete: element at ceil(q*n), 1-indexed).
    Exact when the group has <= k rows (the sample IS the group).

    Mergeable like the KMV sketch: bottom-k of a union is the merge of
    per-block bottom-k's, so each block contributes at most k slim
    (group, hv, value) rows to the exchange and the estimate is
    independent of block boundaries / parallelism.  The hash is
    DuckDB's ``md5_number_lower``, so :func:`sql_approx_quantiles`
    computes the IDENTICAL sample and therefore identical quantiles —
    the approximate operator stays exactly checkable.

    Contrast with ``textops.length_quantiles`` / ``value_quantiles``
    (exact counting-sort plans, exchange bounded by value levels):
    this sketch is for value domains too wide to count — latencies,
    scores — where a bounded-error sample quantile is the right tool
    at 100 TB."""
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    qlist = list(qs)

    def partial(t: pa.Table) -> pa.Table:
        sel = t.select(gcols + [id_col, value_col])
        ids = [str(v) for v in sel.column(id_col).to_pylist()]
        df = sel.to_pandas()
        df["hv"] = _md5_lower64(ids)
        df = df.drop(columns=[id_col])
        df = df.sort_values(gcols + ["hv"], kind="mergesort")
        return df.groupby(gcols, sort=False, group_keys=False).head(k)

    pre = ds.map_batches(partial, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        qcols = [f"q{int(q * 100):02d}" for q in qlist]
        if len(df) == 0:
            out = {c: df[c] for c in gcols}
            for qc in qcols:
                out[qc] = pd.Series([], dtype="float64")
            return pd.DataFrame(out)
        groups, rows = [], []
        for g, sub in df.groupby(gcols, sort=False):
            sub = sub.sort_values("hv", kind="mergesort").head(k)
            vals = np.sort(sub[value_col].to_numpy(dtype=np.float64))
            n = len(vals)
            # discrete quantile: 1-indexed element ceil(q*n)
            picks = [vals[max(int(np.ceil(q * n)), 1) - 1] for q in qlist]
            groups.append(g if isinstance(g, tuple) else (g,))
            rows.append(picks)
        out = {c: [g[i] for g in groups] for i, c in enumerate(gcols)}
        for j, qc in enumerate(qcols):
            out[qc] = [r[j] for r in rows]
        return pd.DataFrame(out)

    return colocated_sort(pre, gcols).map_batches(
        finish, batch_format="pandas", batch_size=None)


def sql_approx_quantiles(table: str, group_col, id_col: str,
                         value_col: str, *, k: int = 256,
                         qs: Sequence[float] = (0.5, 0.9, 0.99)) -> str:
    """DuckDB twin: identical md5 bottom-k sample, identical discrete
    quantile picks."""
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    gl = ", ".join(gcols)
    qexprs = ",\n               ".join(
        f"max(CASE WHEN rn = greatest(1, CAST(ceil({q} * n) AS BIGINT)) "
        f"THEN v END) AS q{int(q * 100):02d}" for q in qs)
    return f"""
        WITH keyed AS (
            SELECT {gl}, {value_col} AS v,
                   md5_number_lower(CAST({id_col} AS VARCHAR)) AS hv
            FROM {table}),
        samp AS (
            SELECT {gl}, v,
                   row_number() OVER (PARTITION BY {gl}
                                      ORDER BY hv) AS srn
            FROM keyed),
        vals AS (
            SELECT {gl}, v,
                   row_number() OVER (PARTITION BY {gl}
                                      ORDER BY v) AS rn,
                   count(*) OVER (PARTITION BY {gl}) AS n
            FROM samp WHERE srn <= {k})
        SELECT {gl},
               {qexprs}
        FROM vals GROUP BY {gl}
    """


def sql_approx_distinct(table: str, group_col, value_col: str, *,
                        k: int = 64) -> str:
    """DuckDB twin: identical hash (md5_number_lower), identical
    estimator, identical rounding grid.  ``group_col`` may be a name
    or a list of grouping expressions (aliased name form)."""
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    gl = ", ".join(gcols)
    return f"""
        WITH h AS (SELECT DISTINCT {gl},
                          md5_number_lower(CAST({value_col} AS VARCHAR)) AS hv
                   FROM {table}),
        r AS (SELECT {gl}, hv,
                     row_number() OVER (PARTITION BY {gl}
                                        ORDER BY hv) AS rn,
                     count(*) OVER (PARTITION BY {gl}) AS nd
              FROM h)
        SELECT {gl},
               floor((CASE WHEN nd < {k} THEN CAST(nd AS DOUBLE)
                      ELSE ({k} - 1) / (CAST(hv AS DOUBLE)
                                        / 18446744073709551616.0)
                      END) * 1000000 + 0.5) / 1000000 AS approx_distinct
        FROM r WHERE rn = least(nd, {k})
    """
