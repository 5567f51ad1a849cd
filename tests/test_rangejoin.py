"""range_join_count: inclusive window bounds, group isolation."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from octoray.query import range_join_count


def _ts(s):
    return pd.Timestamp(s)


def _mk(left_rows, right_rows):
    left = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in left_rows], pa.int64()),
        "user_id": pa.array([r[1] for r in left_rows], pa.int64()),
        "ts": pa.array([r[2] for r in left_rows], pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in right_rows], pa.int64()),
        "ts": pa.array([r[1] for r in right_rows], pa.timestamp("us")),
    }))
    return left, right


def test_window_bounds_inclusive(ray_session):
    t = _ts("2024-01-01 01:00")
    left, right = _mk(
        [(1, 7, t)],
        [
            (7, t),                                  # at ts: counted
            (7, t - pd.Timedelta(minutes=30)),       # exactly lower bound: counted
            (7, t - pd.Timedelta(minutes=30, seconds=1)),  # just outside
            (7, t + pd.Timedelta(seconds=1)),        # after: not counted
        ],
    )
    out = range_join_count(left, right, by="user_id", on="ts",
                           window=pd.Timedelta(minutes=30)).to_pandas()
    assert out.iloc[0]["n_in_window"] == 2


def test_zero_when_no_right_rows(ray_session):
    left, right = _mk([(1, 7, _ts("2024-01-01"))], [(8, _ts("2024-01-01"))])
    out = range_join_count(left, right, by="user_id", on="ts",
                           window=pd.Timedelta(minutes=5)).to_pandas()
    assert out.iloc[0]["n_in_window"] == 0


def test_many_users_split_blocks(ray_session):
    lrows = [(i, i % 20, _ts("2024-01-01 01:00")) for i in range(200)]
    rrows = [(u, _ts("2024-01-01 00:50")) for u in range(20) for _ in range(u)]
    left, right = _mk(lrows, rrows)
    left = left.repartition(8)
    right = right.repartition(8)
    out = range_join_count(left, right, by="user_id", on="ts",
                           window=pd.Timedelta(minutes=30)).to_pandas()
    # user u has exactly u clicks in window, for each of its 10 purchases
    for _, row in out.iterrows():
        assert row["n_in_window"] == row["user_id"]
