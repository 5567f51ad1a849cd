"""Property-based differential: asof_join / range_join_count vs DuckDB
on randomized (group, time) data — ties, empty groups, dense windows."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from octoray.query import asof_join, range_join_count

_events = st.lists(
    st.tuples(st.integers(0, 4),          # user
              st.integers(0, 50)),        # int "timestamp"
    min_size=0, max_size=25)


def _mk(left_rows, right_rows):
    left = rd.from_arrow(pa.table({
        "event_id": pa.array(range(len(left_rows)), pa.int64()),
        "user_id": pa.array([u for u, _ in left_rows], pa.int64()),
        "ts": pa.array([t for _, t in left_rows], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([u for u, _ in right_rows], pa.int64()),
        "ts": pa.array([t for _, t in right_rows], pa.int64()),
    }))
    return left, right


def _duck(left_rows, right_rows):
    con = duckdb.connect()
    con.sql("CREATE TABLE l(event_id BIGINT, user_id BIGINT, ts BIGINT)")
    con.sql("CREATE TABLE r(user_id BIGINT, ts BIGINT)")
    for i, (u, t) in enumerate(left_rows):
        con.sql(f"INSERT INTO l VALUES ({i}, {u}, {t})")
    for u, t in right_rows:
        con.sql(f"INSERT INTO r VALUES ({u}, {t})")
    return con


@settings(max_examples=15, deadline=None)
@given(_events, _events)
def test_asof_ts_matches_duckdb(ray_session, lrows, rrows):
    left, right = _mk(lrows, rrows)
    got = asof_join(left, right, by="user_id", on="ts").to_pandas()
    if not lrows:
        assert len(got) == 0
        return
    got = got.sort_values("event_id")["ts_r"].reset_index(drop=True)
    con = _duck(lrows, rrows)
    want = con.sql(
        "SELECT r.ts AS ts_r FROM l ASOF LEFT JOIN r"
        " ON l.user_id = r.user_id AND l.ts >= r.ts"
        " ORDER BY l.event_id").df()["ts_r"]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (pd.isna(g) and pd.isna(w)) or g == w, (lrows, rrows)


@settings(max_examples=15, deadline=None)
@given(_events, _events, st.integers(0, 20))
def test_range_count_matches_duckdb(ray_session, lrows, rrows, window):
    left, right = _mk(lrows, rrows)
    got = range_join_count(left, right, by="user_id", on="ts",
                           window=window).to_pandas()
    if not lrows:
        assert len(got) == 0
        return
    got = got.sort_values("event_id")["n_in_window"].reset_index(drop=True)
    con = _duck(lrows, rrows)
    want = con.sql(
        f"SELECT CAST(count(r.ts) AS BIGINT) AS n FROM l LEFT JOIN r"
        f" ON l.user_id = r.user_id AND r.ts BETWEEN l.ts - {window} AND l.ts"
        f" GROUP BY l.event_id ORDER BY l.event_id").df()["n"]
    assert list(got) == list(want), (lrows, rrows, window)
