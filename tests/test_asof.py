"""Distributed as-of join: backward pick, exact-match, group isolation."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from octoray.query import asof_join


def _ds(rows, cols, types):
    return rd.from_arrow(pa.table({
        c: pa.array([r[i] for r in rows], t)
        for i, (c, t) in enumerate(zip(cols, types))
    }))


def _ts(s):
    return pd.Timestamp(s)


def test_backward_pick_and_null(ray_session):
    left = _ds([(1, 10, _ts("2024-01-01 01:00")),
                (2, 10, _ts("2024-01-01 00:00:30"))],
               ["event_id", "user_id", "ts"],
               [pa.int64(), pa.int64(), pa.timestamp("us")])
    right = _ds([(10, _ts("2024-01-01 00:10"), 100),
                 (10, _ts("2024-01-01 00:50"), 101)],
                ["user_id", "ts", "click_id"],
                [pa.int64(), pa.timestamp("us"), pa.int64()])
    out = asof_join(left, right, by="user_id", on="ts").to_pandas()
    out = out.set_index("event_id")
    # event 1 at 01:00 -> most recent click 00:50 (id 101)
    assert out.loc[1, "click_id"] == 101
    assert out.loc[1, "ts_r"] == _ts("2024-01-01 00:50")
    # event 2 at 00:00:30 predates both clicks -> null
    assert pd.isna(out.loc[2, "click_id"])


def test_exact_timestamp_matches(ray_session):
    t0 = _ts("2024-01-01 00:10")
    left = _ds([(1, 5, t0)], ["event_id", "user_id", "ts"],
               [pa.int64(), pa.int64(), pa.timestamp("us")])
    right = _ds([(5, t0, 7)], ["user_id", "ts", "click_id"],
                [pa.int64(), pa.timestamp("us"), pa.int64()])
    out = asof_join(left, right, by="user_id", on="ts").to_pandas()
    assert out.iloc[0]["click_id"] == 7  # ts >= ts_r includes equality


def test_groups_isolated(ray_session):
    left = _ds([(1, 1, _ts("2024-01-01 02:00"))],
               ["event_id", "user_id", "ts"],
               [pa.int64(), pa.int64(), pa.timestamp("us")])
    # the only click belongs to ANOTHER user and must not attach
    right = _ds([(2, _ts("2024-01-01 01:00"), 9)],
                ["user_id", "ts", "click_id"],
                [pa.int64(), pa.timestamp("us"), pa.int64()])
    out = asof_join(left, right, by="user_id", on="ts").to_pandas()
    assert len(out) == 1 and pd.isna(out.iloc[0]["click_id"])
