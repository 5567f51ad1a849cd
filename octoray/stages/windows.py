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

from octoray.plan import colocated_sort

from octoray import plan


def _floor_multiple(us: pa.Array, span_us: int) -> pa.Array:
    """Largest multiple of ``span_us`` <= ``us`` (int64 microseconds).

    Arrow's integer divide truncates toward zero, so a bare
    divide*multiply mis-assigns pre-1970 (negative-epoch) timestamps
    to the window AFTER theirs; this computes a true floor, matching
    numpy's ``//`` used by sliding_window."""
    q = pc.divide(us, span_us)
    r = pc.subtract(us, pc.multiply(q, span_us))  # trunc rem, sign of us
    floor_rem = pc.if_else(pc.less(r, 0), pc.add(r, span_us), r)
    return pc.subtract(us, floor_rem)


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
        start = _floor_multiple(us, span_us)
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


def sliding_window(events, *, hop_minutes: int = 60, n_hops: int = 3,
                   ts_col: str = "ts", type_col: str = "event_type",
                   value_col: str = "value"):
    """Sliding (hopping) event-time windows: window length =
    ``n_hops * hop_minutes``, advancing every ``hop_minutes``.  Output:
    (event_type, window_start, n_events, sum_value) — one row per
    window that CONTAINS the event, i.e. each event lands in
    ``n_hops`` windows.

    Plan: the n_hops replication happens INSIDE map_batches as a
    vectorized np.repeat/tile, immediately followed by a block-local
    pandas pre-aggregate — so the exchange moves one partial row per
    (block, type, window), not n_hops x raw rows.  One combined
    groupby-aggregate finishes (cents-exact sum: int64, order-free)."""
    from ray.data.aggregate import Sum

    from octoray.util import cents

    span_us = hop_minutes * 60 * 1_000_000
    offs = np.arange(n_hops, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        hop = us // span_us
        starts = (np.repeat(hop, n_hops) - np.tile(offs, len(us))) * span_us
        df = pd.DataFrame({
            type_col: np.repeat(
                t.column(type_col).to_numpy(zero_copy_only=False), n_hops),
            "window_start": starts,
            "value_c": np.repeat(
                cents(t.column(value_col)).to_numpy(zero_copy_only=False),
                n_hops),
        })
        g = df.groupby([type_col, "window_start"], sort=False).agg(
            n_partial=("value_c", "size"), value_sum_c=("value_c", "sum"),
        ).reset_index()
        return pa.table({
            type_col: pa.array(g[type_col]),
            "window_start": pa.array(g["window_start"], pa.int64()),
            "n_partial": pa.array(g["n_partial"], pa.int64()),
            "value_sum_c": pa.array(g["value_sum_c"], pa.int64()),
        })

    out = (
        events.map_batches(assign, batch_format="pyarrow")
        .groupby([type_col, "window_start"])
        .aggregate(Sum("n_partial", alias_name="n_events"),
                   Sum("value_sum_c", alias_name="value_sum_c"))
    )

    def post(t: pa.Table) -> pa.Table:
        sv = pc.divide(pc.cast(t.column("value_sum_c"), pa.float64()), 100.0)
        return pa.table({
            type_col: t.column(type_col),
            "window_start": pc.cast(t.column("window_start"),
                                    pa.timestamp("us")),
            "n_events": pc.cast(t.column("n_events"), pa.int64()),
            "sum_value": sv,
        })

    return out.map_batches(post, batch_format="pyarrow")


def funnel_depths(events, steps, *, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  within_minutes: float | None = None,
                  broadcast_limit: int = plan.BROADCAST_ROWS,
                  strategy: str = "per_user"):
    """Dispatch: the default ``per_user`` plan computes the whole
    funnel in ONE user-keyed shuffle (each user's slim event rows
    co-locate — the sessionize contract — and the min-ts walk runs
    vectorized inside the group); ``joins`` is the stage-wise
    stats-gated join plan for corpora whose per-user histories exceed
    a worker (equality of the two pinned in pytest)."""
    if strategy == "per_user":
        return _funnel_per_user(events, steps, user_col=user_col,
                                type_col=type_col, ts_col=ts_col,
                                within_minutes=within_minutes)
    return _funnel_joins(events, steps, user_col=user_col,
                         type_col=type_col, ts_col=ts_col,
                         within_minutes=within_minutes,
                         broadcast_limit=broadcast_limit)


def _funnel_per_user(events, steps, *, user_col: str, type_col: str,
                     ts_col: str, within_minutes: float | None):
    from octoray.query import sorted_map_groups

    steps = list(steps)
    win_us = (None if within_minutes is None
              else int(within_minutes * 60 * 1_000_000))

    def slim(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column(type_col),
                        value_set=pa.array(steps, pa.string()))
        sel = t.filter(keep)
        return pa.table({
            user_col: sel.column(user_col),
            type_col: sel.column(type_col),
            "_ts": pc.cast(sel.column(ts_col), pa.int64()),
        })

    ev = events.map_batches(slim, batch_format="pyarrow")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        by_step = {
            st: np.sort(g.loc[g[type_col] == st, "_ts"].to_numpy())
            for st in steps}
        t0 = by_step[steps[0]]
        if not len(t0):
            return None
        depth, tprev = 1, int(t0[0])
        for st in steps[1:]:
            arr = by_step[st]
            i = np.searchsorted(arr, tprev, side="right")
            if i >= len(arr):
                break
            nxt = int(arr[i])
            if win_us is not None and nxt > tprev + win_us:
                break
            depth += 1
            tprev = nxt
        return pd.DataFrame({user_col: [g[user_col].iloc[0]],
                             "depth": np.array([depth], np.int64)})

    return sorted_map_groups(ev, [user_col], per_user)


def _funnel_joins(events, steps, *, user_col: str, type_col: str,
                  ts_col: str, within_minutes: float | None,
                  broadcast_limit: int):
    """Ordered funnel analysis: for each user with at least one
    ``steps[0]`` event, the deepest prefix of ``steps`` completed IN
    ORDER (each step strictly after the previous step's FIRST
    completion — the classic min-ts funnel).  With ``within_minutes``
    the next step must also land within that window of the previous
    step's first completion (the windowed conversion funnel).
    Output: (user_id, depth).

    Plan: stage i is one slim (user, ts) projection filtered to the
    step's type, a stats-gated join against the previous stage's
    (user, t_prev) table (broadcast below the limit — the stage table
    is one row per surviving user — merge-join above), a vectorized
    strict-after filter, and an exact min-per-user.  The shuffle key is
    ``user_id`` at every stage (the module's single-partitioning-key
    note), and stage tables only shrink monotonically."""
    import ray

    from octoray.query import hash_join, sorted_groupby_min

    steps = list(steps)
    win_us = (None if within_minutes is None
              else int(within_minutes * 60 * 1_000_000))

    def typed(step: str):
        def f(t: pa.Table) -> pa.Table:
            sel = t.filter(pc.equal(t.column(type_col), pa.scalar(step)))
            return pa.table({
                user_col: sel.column(user_col),
                "_ts": pc.cast(sel.column(ts_col), pa.int64()),
            })
        return events.map_batches(f, batch_format="pyarrow")

    def precombine(ds):
        # block-local min per user BEFORE the exchange (min is
        # idempotent) — the sort then moves one row per (block, user)
        def f(t: pa.Table) -> pa.Table:
            g = t.group_by([user_col], use_threads=False).aggregate(
                [("_ts", "min")])
            return g.rename_columns([user_col, "_ts"])
        return ds.map_batches(f, batch_format="pyarrow")

    # stage 1: first occurrence of steps[0] per user
    cur = sorted_groupby_min(precombine(typed(steps[0])), [user_col], "_ts",
                             alias="_tprev").materialize()
    depths = [cur]
    for step in steps[1:]:
        cand = typed(step)
        n = cur.count()
        if n == 0:
            break
        if n <= broadcast_limit:
            ref = ray.put({r[user_col]: r["_tprev"] for r in cur.take_all()})

            def after(t: pa.Table, *, _ref=ref) -> pa.Table:
                prev = ray.get(_ref)
                users = t.column(user_col).to_pandas()
                ts = t.column("_ts").to_numpy(zero_copy_only=False)
                tprev = users.map(prev)  # NaN where the user is absent
                # sentinel keeps the arithmetic overflow-free; the
                # notna mask already excludes these rows
                tp = tprev.fillna(-(2**62)).to_numpy().astype(np.int64)
                keep = tprev.notna().to_numpy() & (ts > tp)
                if win_us is not None:
                    keep &= ts <= tp + win_us
                return t.filter(pa.array(keep))

            nxt = cand.map_batches(after, batch_format="pyarrow")
        else:
            joined = hash_join(cand, cur, on=user_col)

            def strictly_after(t: pa.Table) -> pa.Table:
                keep = pc.greater(t.column("_ts"), t.column("_tprev"))
                if win_us is not None:
                    keep = pc.and_(keep, pc.less_equal(
                        t.column("_ts"),
                        pc.add(t.column("_tprev"), pa.scalar(win_us))))
                return t.filter(keep).drop_columns(["_tprev"])

            nxt = joined.map_batches(strictly_after, batch_format="pyarrow")
        cur = sorted_groupby_min(precombine(nxt), [user_col], "_ts",
                                 alias="_tprev").materialize()
        if cur.count() == 0:
            break
        depths.append(cur)

    # depth = deepest stage containing the user; stage tables are
    # nested (u_{i+1} subset of u_i), so a max over stage markers wins
    import ray.data as rd

    marked = []
    for i, d in enumerate(depths):
        def mark(t: pa.Table, *, _i=i) -> pa.Table:
            return pa.table({
                user_col: t.column(user_col),
                "depth": pa.array([_i + 1] * t.num_rows, pa.int64()),
            })
        marked.append(d.map_batches(mark, batch_format="pyarrow"))
    allm = marked[0] if len(marked) == 1 else marked[0].union(*marked[1:])

    def maxdepth(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(user_col, sort=False)["depth"].max().reset_index()
        return g

    return colocated_sort(allm, [user_col]).map_batches(
        maxdepth, batch_format="pandas", batch_size=None)


def window_anomalies(events, *, minutes: int = 60, z_threshold: float = 3.0,
                     ts_col: str = "ts", type_col: str = "event_type"):
    """Volume anomaly detection: per (event_type, tumbling window)
    event counts z-scored against the type's own mean/std across all
    its observed windows; |z| >= threshold flags the window.  The
    monitoring pass every ingestion pipeline wants over its crawl
    traffic.

    Exactness: per-window counts and the per-type sum / sum-of-squares
    are integers (order-free), so mean/std/z are a fixed float
    expression mirrored verbatim by the SQL twin; z is rounded to the
    house grid and the FLAG compares the ROUNDED value, so the
    threshold boundary is stable across engines.  Zero-variance types
    define z = 0 on both sides.

    Scale: one combined groupby for the window counts, one tiny
    per-type aggregate (rows = types x blocks partials), stats
    broadcast back as a dict — the raw events shuffle once."""
    import ray
    from ray.data.aggregate import Sum

    span_us = minutes * 60 * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col), pa.int64())
        start = _floor_multiple(us, span_us)
        df = pd.DataFrame({
            type_col: t.column(type_col).to_numpy(zero_copy_only=False),
            "window_start": start.to_numpy(zero_copy_only=False),
        })
        g = df.groupby([type_col, "window_start"], sort=False).size()
        g = g.reset_index(name="c")
        return pa.table({
            type_col: pa.array(g[type_col]),
            "window_start": pa.array(g["window_start"], pa.int64()),
            "c": pa.array(g["c"], pa.int64()),
        })

    counts = (events.map_batches(assign, batch_format="pyarrow")
              .groupby([type_col, "window_start"])
              .aggregate(Sum("c", alias_name="n_events"))).materialize()

    def sq(t: pa.Table) -> pa.Table:
        n = t.column("n_events")
        return pa.table({
            type_col: t.column(type_col),
            "sc": n,
            "sq": pc.multiply(n, n),
            "nw": pa.array([1] * t.num_rows, pa.int64()),
        })

    stats = (counts.map_batches(sq, batch_format="pyarrow")
             .groupby(type_col)
             .aggregate(Sum("sc", alias_name="sc"),
                        Sum("sq", alias_name="sq"),
                        Sum("nw", alias_name="nw")))
    # bounded by the number of event types
    sref = ray.put({r[type_col]: (r["sc"], r["sq"], r["nw"])
                    for r in stats.take_all()})

    from octoray.util import round_half_up_scalar

    def score(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(sref)
        zs, flags = [], []
        for et, c in zip(df[type_col], df["n_events"]):
            sc, sqs, nw = st[et]
            mean = float(sc) / nw
            var = (float(sqs) / nw) - mean * mean
            zz = 0.0 if var == 0.0 else (float(c) - mean) / (var ** 0.5)
            z6 = round_half_up_scalar(zz, 6)
            zs.append(z6)
            flags.append(z6 >= z_threshold or z6 <= -z_threshold)
        out = df.copy()
        out["z"] = zs
        out["is_anomaly"] = flags
        return out

    scored = counts.map_batches(score, batch_format="pandas")

    def us(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("window_start")
        return t.set_column(i, "window_start",
                            pc.cast(t.column("window_start"),
                                    pa.timestamp("us")))

    return scored.map_batches(us, batch_format="pyarrow")


def cohort_retention(events, *, period_days: int = 7,
                     user_col: str = "user_id", ts_col: str = "ts"):
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; for every later period they are active in, the
    (cohort, offset) cell counts them.  Output: (cohort_period,
    offset, n_users) — the growth-analytics staple.

    Plan: per-user first period is a block-pre-combined min + one
    sorted min; the activity set is the exact distinct (user, period)
    projection (one small-row exchange); one stats-gated join keyed on
    the SAME user_id both stages already shuffle by; final count is a
    combined groupby over (cohort, offset) — rows bounded by
    users x periods, never raw events."""
    from ray.data.aggregate import Count

    from octoray.query import distinct_values, hash_join, sorted_groupby_min

    span_us = period_days * 86_400 * 1_000_000

    def proj(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col), pa.int64())
        return pa.table({
            user_col: t.column(user_col),
            "_w": pc.divide(_floor_multiple(us, span_us), span_us),
        })

    weeks = events.map_batches(proj, batch_format="pyarrow")

    def pre_min(t: pa.Table) -> pa.Table:
        g = t.group_by([user_col], use_threads=False).aggregate(
            [("_w", "min")])
        return g.rename_columns([user_col, "_w"])

    first = sorted_groupby_min(
        weeks.map_batches(pre_min, batch_format="pyarrow"),
        [user_col], "_w", alias="cohort_period").materialize()

    act = distinct_values(weeks, [user_col, "_w"])
    joined = hash_join(act, first, on=user_col)

    def off(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_period": t.column("cohort_period"),
            "offset": pc.subtract(t.column("_w"),
                                  t.column("cohort_period")),
        })

    return (joined.map_batches(off, batch_format="pyarrow")
            .groupby(["cohort_period", "offset"])
            .aggregate(Count(alias_name="n_users")))


def event_transitions(events, *, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id"):
    """Per-user next-event transition counts: (from_type, to_type, n)
    over each user's (ts, event_id)-ordered stream — the Markov-chain
    view of behavioral data (and of crawl fetch sequences).

    Plan: ONE groupby(user) shuffle (the module's standing partition
    key); adjacent pairs are emitted vectorized inside the group and
    pre-counted per block, so the final exchange carries
    (type x type)-bounded partial rows."""
    from octoray.query import sorted_groupby_sum, sorted_map_groups

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        t = g[type_col].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"from_type": [], "to_type": []})
        return pd.DataFrame({"from_type": t[:-1], "to_type": t[1:]})

    pairs = sorted_map_groups(
        events.select_columns([user_col, type_col, ts_col, id_col]),
        [user_col], per_user)

    def pre(t: pa.Table) -> pa.Table:
        g = t.group_by(["from_type", "to_type"],
                       use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["from_type", "to_type", "_n"])

    return sorted_groupby_sum(
        pairs.map_batches(pre, batch_format="pyarrow"),
        ["from_type", "to_type"], "_n", alias="n")
