"""Windowed / sessionized aggregates over event streams.

The reference's monthly report family (A5 — wgs.rq / monthly-context.rq:
date-part BINDs then GROUP BY) generalized to an events table
(event_id, ts, user_id, event_type, value, props):

  monthly_rollup   project date parts vectorized, then a combined
                   groupby-aggregate — the A5 shape
  sessionize       gap-based session assignment per user: one
                   groupby(user_id).map_groups with a sort inside the
                   group (the within-key data fits a worker; the
                   shuffle key is the natural partitioning key)
  session_stats    per-user session counts / durations

Partitioning note: ``user_id`` is both the shuffle key and the only
key any stage needs — a pipeline chaining sessionize -> session_stats
re-uses the same co-location (SURVEY.md §7.3 'pick ONE partitioning
key and reuse it').
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def monthly_rollup(events, *, ts_col: str = "ts", type_col: str = "event_type", value_col: str = "value"):
    """(event_type, year, month) -> n_events, sum_value.

    Date parts are extracted with Arrow kernels inside map_batches
    (pre-projection), then one groupby-aggregate — partial aggregation
    happens per-block before the exchange (Ray's hash aggregate).
    ``value`` is cents-exact, so it is summed as int64 (order-free,
    exact across engines) and divided by 100.0 once at the end."""
    from ray.data.aggregate import Count, Sum

    from octoray.util import cents

    def parts(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        return pa.table(
            {
                type_col: t.column(type_col),
                "year": pc.cast(pc.year(ts), pa.int32()),
                "month": pc.cast(pc.month(ts), pa.int32()),
                "value_c": cents(t.column(value_col)),
            }
        )

    out = (
        events.map_batches(parts, batch_format="pyarrow")
        .groupby([type_col, "year", "month"])
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_sum_c"))
    )

    def post(t: pa.Table) -> pa.Table:
        sv = pc.divide(pc.cast(t.column("value_sum_c"), pa.float64()), 100.0)
        t = t.append_column("sum_value", sv)
        return t.drop_columns(["value_sum_c"])

    return out.map_batches(post, batch_format="pyarrow")


def sessionize(events, *, gap_minutes: float = 30.0, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """Assign a per-user session index: a new session starts when the
    gap since the previous event exceeds ``gap_minutes``.

    Output: (event_id, user_id, session_id) where session_id is the
    0-based session ordinal within the user (deterministic: events
    sorted by (ts, event_id) inside the group).
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        ts = g[ts_col].astype("int64").to_numpy()
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                user_col: g[user_col].to_numpy(),
                "session_id": (np.cumsum(new) - 1).astype(np.int64),
            }
        )

    from octoray.query import sorted_map_groups

    return sorted_map_groups(events, [user_col], per_user)


def session_stats(events, *, gap_minutes: float = 30.0, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id"):
    """Per-user session summary: (user_id, n_sessions, n_events,
    max_session_len).  Single groupby(user_id) — sessionization and
    aggregation fused in one map_groups to avoid a second shuffle."""

    gap_us = int(gap_minutes * 60 * 1_000_000)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        ts = g[ts_col].astype("int64").to_numpy()
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess = np.cumsum(new) - 1
        lens = np.bincount(sess)
        return pd.DataFrame(
            {
                user_col: [g[user_col].iloc[0]],
                "n_sessions": [int(sess[-1] + 1) if len(sess) else 0],
                "n_events": [len(g)],
                "max_session_len": [int(lens.max()) if len(lens) else 0],
            }
        )

    from octoray.query import sorted_map_groups

    return sorted_map_groups(events, [user_col], per_user)


def tumbling_window(events, *, minutes: int = 15, ts_col: str = "ts",
                    type_col: str = "event_type", value_col: str = "value"):
    """Fixed tumbling event-time windows: (event_type, window_start) ->
    n_events, sum_value.  Window assignment is a vectorized epoch
    floor inside map_batches; then one combined groupby-aggregate
    (cents-exact sum, octoray.util)."""
    from ray.data.aggregate import Count, Sum

    from octoray.util import cents

    span_us = minutes * 60 * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col), pa.int64())
        start = pc.multiply(pc.divide(us, span_us), span_us)  # integer floor
        return pa.table(
            {
                type_col: t.column(type_col),
                "window_start": pc.cast(start, pa.timestamp("us")),
                "value_c": cents(t.column(value_col)),
            }
        )

    out = (
        events.map_batches(assign, batch_format="pyarrow")
        .groupby([type_col, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_sum_c"))
    )

    def post(t: pa.Table) -> pa.Table:
        sv = pc.divide(pc.cast(t.column("value_sum_c"), pa.float64()), 100.0)
        return t.append_column("sum_value", sv).drop_columns(["value_sum_c"])

    return out.map_batches(post, batch_format="pyarrow")


def top_users_by_events(events, *, k: int = 10, user_col: str = "user_id",
                        id_col: str = "event_id"):
    """Top-k users by event count: per-block partial counts -> small
    final aggregate -> driver-side top-k of the (tiny) per-user table
    is avoided — instead one more sorted-block pass keeps global top-k
    deterministically (ties broken by user_id)."""
    from octoray.query import sorted_groupby_count

    counts = sorted_groupby_count(events.select_columns([user_col]), [user_col],
                                  alias="n_events")
    # global top-k: sort desc by (n_events, -user) then limit
    return counts.sort(["n_events", user_col], descending=[True, False]).limit(k)
