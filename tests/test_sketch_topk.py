"""KMV approx-distinct sketch, grouped top-k, sliding windows, funnel
depths, BM25 — brute-force / SQL-twin equality and path equality."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rd(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


# ---------------------------------------------------------------- KMV sketch
def test_kmv_exact_below_k(ray_session):
    from octoray.stages.sketch import approx_distinct

    # 3 groups, all with < k distinct values -> the sketch IS exact
    rng = np.random.default_rng(7)
    g = rng.choice(["a", "b", "c"], size=500)
    v = rng.integers(0, 40, size=500)
    t = pa.table({"g": pa.array(g), "v": pa.array(v, pa.int64())})
    out = (approx_distinct(_rd(t).repartition(4), "g", "v", k=64)
           .to_pandas().set_index("g")["approx_distinct"].to_dict())
    truth = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique().to_dict()
    assert out == {k: float(n) for k, n in truth.items()}


def test_kmv_estimator_accuracy_and_block_independence(ray_session):
    from octoray.stages.sketch import approx_distinct

    rng = np.random.default_rng(11)
    v = rng.integers(0, 5000, size=20_000)
    t = pa.table({"g": pa.array(["x"] * len(v)), "v": pa.array(v, pa.int64())})
    truth = len(np.unique(v))
    ests = []
    for parts in (1, 7):
        out = approx_distinct(_rd(t).repartition(parts), "g", "v", k=256)
        ests.append(out.to_pandas()["approx_distinct"].iloc[0])
    # mergeable: the estimate cannot depend on block boundaries
    assert ests[0] == ests[1]
    # KMV relative error ~ 1/sqrt(k) = 6.25%; allow 4 sigma
    assert abs(ests[0] - truth) / truth < 0.25


def test_kmv_hash_matches_duckdb(ray_session):
    import duckdb

    from octoray.stages.sketch import _md5_lower64

    vals = ["", "hello", "42", "ÅÄÖ", "a b c"]
    got = _md5_lower64(vals)
    want = [duckdb.sql(f"select md5_number_lower('{v}')").fetchone()[0]
            for v in vals]
    assert got.tolist() == want


# ------------------------------------------------------------ grouped top-k
def test_grouped_top_k_matches_pandas(ray_session):
    from octoray.query import grouped_top_k

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "g": rng.choice([f"g{i}" for i in range(17)], size=n),
        "s": rng.integers(0, 50, size=n),  # heavy ties
        "id": np.arange(n, dtype=np.int64),
    })
    out = grouped_top_k(_rd(pa.Table.from_pandas(df)).repartition(6),
                        ["g"], "s", 7, tie_cols=["id"]).to_pandas()
    want = (df.sort_values(["g", "s", "id"], ascending=[True, False, True],
                           kind="mergesort")
              .groupby("g", sort=False).head(7))
    key = ["g", "s", "id"]
    assert (out.sort_values(key).reset_index(drop=True)[key]
            .equals(want.sort_values(key).reset_index(drop=True)[key]))


def test_grouped_top_k_ascending_and_small_groups(ray_session):
    from octoray.query import grouped_top_k

    df = pd.DataFrame({"g": ["a", "a", "b"], "s": [3, 1, 9],
                       "id": [1, 2, 3]})
    out = grouped_top_k(_rd(pa.Table.from_pandas(df)), ["g"], "s", 5,
                        tie_cols=["id"], descending=False).to_pandas()
    assert len(out) == 3  # k larger than any group: identity


def test_tumbling_window_negative_epoch_floor(ray_session):
    """Pre-1970 timestamps must floor DOWN to their window start
    (ADVICE r3: Arrow integer divide truncates toward zero)."""
    from octoray.stages.windows import tumbling_window

    span = 15 * 60 * 1_000_000
    ts = np.array([-1, -span, -span - 1, 0, 1, span], dtype=np.int64)
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "event_type": pa.array(["a"] * len(ts)),
                  "value": pa.array([1.0] * len(ts), pa.float64())})
    out = tumbling_window(_rd(t), minutes=15).to_pandas()
    got = {int(w.value) // 1000: n for w, n in  # ns -> us
           zip(out["window_start"], out["n_events"])}
    # numpy true-floor reference
    want = pd.Series((ts // span) * span).value_counts().to_dict()
    assert got == {int(k): int(v) for k, v in want.items()}


# ------------------------------------------------------------ sliding window
def test_sliding_window_matches_brute(ray_session):
    from octoray.stages.windows import sliding_window

    rng = np.random.default_rng(5)
    n = 3000
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 3 * 86_400, size=n) * 1_000_000
    et = rng.choice(["a", "b"], size=n)
    val = np.round(rng.uniform(0, 9, size=n), 2)
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "event_type": pa.array(et),
                  "value": pa.array(val, pa.float64())})
    out = sliding_window(_rd(t).repartition(5), hop_minutes=60,
                         n_hops=3).to_pandas()
    span = 3600 * 1_000_000
    rows = []
    for j in range(3):
        w = (ts // span - j) * span
        rows.append(pd.DataFrame({"event_type": et, "window_start": w,
                                  "vc": np.round(val * 100).astype(np.int64)}))
    brute = (pd.concat(rows).groupby(["event_type", "window_start"])
             .agg(n_events=("vc", "size"), sum_c=("vc", "sum")).reset_index())
    brute["sum_value"] = brute["sum_c"] / 100.0
    merged = out.merge(
        brute.assign(window_start=pd.to_datetime(brute["window_start"],
                                                 unit="us")),
        on=["event_type", "window_start"], suffixes=("", "_b"))
    assert len(merged) == len(out) == len(brute)
    assert (merged["n_events"] == merged["n_events_b"]).all()
    assert (merged["sum_value"] == merged["sum_value_b"]).all()


# ------------------------------------------------------------------- funnel
def _funnel_events():
    # user 1: a->b->c in order/window (depth 3)
    # user 2: a then b too late (depth 1); user 3: b before a only (depth 1)
    # user 4: a->b in window, c before b (depth 2)
    m = 60 * 1_000_000
    rows = [
        (1, "a", 0), (1, "b", 10 * m), (1, "c", 20 * m),
        (2, "a", 0), (2, "b", 500 * m),
        (3, "b", 0), (3, "a", 10 * m),
        (4, "a", 0), (4, "c", 5 * m), (4, "b", 15 * m),
        (5, "b", 0), (5, "c", 5 * m),  # no 'a': absent from output
    ]
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([1_700_000_000_000_000 + r[2] for r in rows],
                       pa.timestamp("us")),
    })


@pytest.mark.parametrize("kw", [dict(strategy="per_user"),
                                dict(strategy="joins",
                                     broadcast_limit=2_000_000),
                                dict(strategy="joins", broadcast_limit=0)])
def test_funnel_depths_hand_case(ray_session, kw):
    from octoray.stages.windows import funnel_depths

    out = (funnel_depths(_rd(_funnel_events()).repartition(3),
                         ["a", "b", "c"], within_minutes=60, **kw)
           .to_pandas().set_index("user_id")["depth"].to_dict())
    assert out == {1: 3, 2: 1, 3: 1, 4: 2}


def test_funnel_unwindowed_strictly_after(ray_session):
    from octoray.stages.windows import funnel_depths

    out = (funnel_depths(_rd(_funnel_events()), ["a", "b", "c"])
           .to_pandas().set_index("user_id")["depth"].to_dict())
    # without the window, user 2 converts (b at +500min), user 4 still
    # lacks a c AFTER its b
    assert out == {1: 3, 2: 2, 3: 1, 4: 2}


# --------------------------------------------------------------------- BM25
def test_bm25_matches_duckdb_twin(ray_session):
    import duckdb

    from octoray.stages.tfidf import bm25_topk, sql_bm25_topk

    rng = np.random.default_rng(9)
    vocab = ["red", "green", "blue", "sort", "merge", "the", "a"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(300)]
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(texts)})
    out = bm25_topk(_rd(t).repartition(4), ["sort", "merge", "blue"],
                    k=12).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.sql(sql_bm25_topk("documents", ["sort", "merge", "blue"],
                                 k=12)).df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


# ------------------------------------------------------------- SPARQL OFFSET
def test_sparql_offset(ray_session):
    import ray.data as rd

    from octoray.model import triples_to_table
    from octoray.sparql import execute, parse_sparql

    rows = [(f"fid:s{i}", "f:host", h, "")
            for i, h in enumerate(["a", "b", "c", "d", "e"])]
    ds = rd.from_arrow(triples_to_table(rows))
    q = parse_sparql("SELECT ?h WHERE { ?s f:host ?h } "
                     "ORDER BY ?h LIMIT 2 OFFSET 1")
    assert execute(q, ds).to_pandas()["h"].tolist() == ["b", "c"]
    # OFFSET-before-LIMIT order also parses (SPARQL 1.1 allows both)
    q2 = parse_sparql("SELECT ?h WHERE { ?s f:host ?h } "
                      "ORDER BY ?h OFFSET 3 LIMIT 1")
    assert execute(q2, ds).to_pandas()["h"].tolist() == ["d"]


# ------------------------------------------------------------ column profile
def test_profile_columns_nulls_and_ts(ray_session):
    import duckdb

    from octoray.stages.profile import profile_columns, sql_profile_columns

    ts = pd.to_datetime([
        "2024-01-01 00:00:00",          # zero fraction: no '.' suffix
        "2024-01-02 03:04:05.640140",   # trailing-zero fraction strip
        None,
        "2024-01-02 03:04:05.100000",
    ], format="mixed")
    t = pa.table({
        "a": pa.array([1, None, 3, None], pa.int64()),
        "b": pa.array([1.5, 2.0, None, 1e-07], pa.float64()),
        "c": pa.array(["x", "y", "y", None]),
        "ts": pa.Array.from_pandas(pd.Series(ts), type=pa.timestamp("us")),
    })
    out = profile_columns(_rd(t).repartition(3), ["a", "b", "c", "ts"],
                          k=8).to_pandas()
    con = duckdb.connect()
    con.register("tt", t)
    want = con.sql(sql_profile_columns("tt", ["a", "b", "c", "ts"],
                                       k=8)).df()
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_profile_columns_estimator_branch(ray_session):
    import duckdb

    from octoray.stages.profile import profile_columns, sql_profile_columns

    rng = np.random.default_rng(21)
    t = pa.table({"v": pa.array(rng.integers(0, 3000, size=9000), pa.int64())})
    out = profile_columns(_rd(t).repartition(5), ["v"], k=64).to_pandas()
    con = duckdb.connect()
    con.register("tt", t)
    want = con.sql(sql_profile_columns("tt", ["v"], k=64)).df()
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)
    truth = len(np.unique(t.column("v").to_numpy()))
    est = out["approx_distinct"].iloc[0]
    assert abs(est - truth) / truth < 0.5


def test_rrf_fuse_hand_case(ray_session):
    from octoray.stages.similarity import rrf_fuse

    out = rrf_fuse([[1, 2, 3], [2, 1]], c=60, k_out=3).to_pandas()
    want = {
        1: 1 / 61 + 1 / 62,
        2: 1 / 62 + 1 / 61,
        3: 1 / 63,
    }
    assert out["id"].tolist() == [1, 2, 3]  # 1 and 2 tie -> id order
    assert abs(out["rrf"].iloc[0] - round(want[1], 6)) < 1e-9
    assert abs(out["rrf"].iloc[2] - round(want[3], 6)) < 1e-9


def test_approx_quantiles_exact_below_k(ray_session):
    """Groups with <= k rows: the bottom-k sample IS the group, so the
    discrete quantiles are exact."""
    from octoray.stages.sketch import approx_quantiles

    rng = np.random.default_rng(3)
    g = rng.choice(["a", "b"], size=200)
    v = np.round(rng.uniform(0, 50, size=200), 2)
    t = pa.table({"g": pa.array(g), "id": pa.array(np.arange(200), pa.int64()),
                  "v": pa.array(v, pa.float64())})
    out = approx_quantiles(_rd(t).repartition(4), "g", "id", "v",
                           k=500).to_pandas().set_index("g")
    for grp in ("a", "b"):
        vals = np.sort(v[g == grp])
        n = len(vals)
        for q, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
            assert out.loc[grp, col] == vals[max(int(np.ceil(q * n)), 1) - 1]


def test_approx_quantiles_partition_invariance(ray_session):
    """The bottom-k sample quantiles must not depend on block
    boundaries (mergeability) and must approximate the true quantile."""
    from octoray.stages.sketch import approx_quantiles

    rng = np.random.default_rng(9)
    n = 20_000
    v = np.round(rng.exponential(10, size=n), 2)
    t = pa.table({"g": pa.array(["x"] * n),
                  "id": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(v, pa.float64())})
    results = []
    for parts in (1, 3, 16):
        out = approx_quantiles(_rd(t).repartition(parts), "g", "id", "v",
                               k=512).to_pandas()
        results.append(tuple(out.iloc[0][["q50", "q90", "q99"]]))
    assert results[0] == results[1] == results[2]
    true_q50 = np.quantile(v, 0.5)
    # 512-point sample: the median should be within a few percent
    assert abs(results[0][0] - true_q50) / true_q50 < 0.15


def test_approx_distinct_composite_group(ray_session):
    from octoray.stages.sketch import approx_distinct

    rng = np.random.default_rng(31)
    n = 2000
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y"], size=n)),
        "b": pa.array(rng.integers(0, 3, size=n), pa.int64()),
        "v": pa.array(rng.integers(0, 30, size=n), pa.int64()),
    })
    out = approx_distinct(_rd(t).repartition(4), ["a", "b"], "v",
                          k=64).to_pandas()
    truth = (pd.DataFrame({"a": t.column("a").to_pylist(),
                           "b": t.column("b").to_pylist(),
                           "v": t.column("v").to_pylist()})
             .groupby(["a", "b"])["v"].nunique().reset_index())
    merged = out.merge(truth, on=["a", "b"])
    assert len(merged) == len(truth) == len(out)
    assert (merged["approx_distinct"] == merged["v"].astype(float)).all()


# ------------------------------------------------- weighted sample / anomaly
def test_weighted_sample_proportional_and_deterministic(ray_session):
    from octoray.stages.textops import weighted_sample

    n = 3000
    # two weight tiers: heavy rows 100x more likely per unit
    w = np.where(np.arange(n) % 10 == 0, 5000, 50).astype(np.int64)
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "n_chars": pa.array(w, pa.int64())})
    out1 = weighted_sample(_rd(t).repartition(4), 100).to_pandas()
    out2 = weighted_sample(_rd(t).repartition(7), 100).to_pandas()
    # deterministic and partition-independent
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    # heavy rows are 10% of the corpus but should dominate the sample
    heavy = (out1["doc_id"] % 10 == 0).mean()
    assert heavy > 0.5


def test_window_anomalies_flags_spike(ray_session):
    from octoray.stages.windows import window_anomalies

    base = 1_700_000_000_000_000
    hour = 3_600_000_000
    ts, et = [], []
    for h in range(24):
        n = 500 if h == 7 else 10  # big spike in hour 7
        for i in range(n):
            ts.append(base + h * hour + i * 1000)
            et.append("a")
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "event_type": pa.array(et),
                  "value": pa.array([0.0] * len(ts), pa.float64())})
    out = window_anomalies(_rd(t).repartition(5), minutes=60,
                           z_threshold=3.0).to_pandas()
    flagged = out[out["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged["n_events"].iloc[0] == 500
