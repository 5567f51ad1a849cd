"""Stratified sampling and exact quantiles."""

import hashlib

import pyarrow as pa
import ray.data as rd

from octoray.stages.textops import length_quantiles, stratified_sample


def _docs(n=200):
    langs = ["en", "es", "fr"]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array([langs[i % 3] for i in range(n)], pa.string()),
        "n_chars": pa.array([(i * 7) % 100 for i in range(n)], pa.int64()),
    }))


def _frac(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32


def test_stratified_rates_exact(ray_session):
    out = stratified_sample(
        _docs(), rates={"en": 1.0, "es": 0.5}, default_rate=0.0,
        stratum_col="lang").to_pandas()
    # en: all kept; es: exactly those under the hash threshold; fr: none
    kept = set(out["doc_id"])
    for i in range(200):
        lang = ["en", "es", "fr"][i % 3]
        want = (lang == "en") or (lang == "es" and _frac(i) < 0.5)
        assert (i in kept) == want, i


def test_stratified_deterministic_across_runs(ray_session):
    a = stratified_sample(_docs(), rates={"es": 0.3}, default_rate=0.1,
                          stratum_col="lang").to_pandas()
    b = stratified_sample(_docs(), rates={"es": 0.3}, default_rate=0.1,
                          stratum_col="lang").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_length_quantiles_inverted_cdf(ray_session):
    # single stratum 1..10: p50 -> 5th value, p90 -> 9th, p99 -> 10th
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "lang": pa.array(["en"] * 10, pa.string()),
        "n_chars": pa.array(range(1, 11), pa.int64()),
    }))
    out = length_quantiles(ds).set_index("lang")
    assert out.loc["en", "p50"] == 5
    assert out.loc["en", "p90"] == 9
    assert out.loc["en", "p99"] == 10


def test_length_quantiles_per_stratum(ray_session):
    out = length_quantiles(_docs()).set_index("lang")
    assert set(out.index) == {"en", "es", "fr"}
    assert (out["p50"] <= out["p90"]).all() and (out["p90"] <= out["p99"]).all()


def test_chunk_documents_offsets_and_tail(ray_session):
    from octoray.stages.textops import chunk_documents

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([" ".join(f"t{i}" for i in range(10))], pa.string()),
    }))
    out = chunk_documents(ds, chunk_tokens=4, overlap=1).to_pandas()
    # stride 3: starts 0,3,6,9 -> lengths 4,4,4,1
    assert list(out["chunk_id"]) == [0, 1, 2, 3]
    assert list(out["n_tokens"]) == [4, 4, 4, 1]
    assert out.iloc[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out.iloc[1]["chunk_text"] == "t3 t4 t5 t6"
    assert out.iloc[3]["chunk_text"] == "t9"


def test_chunk_documents_empty_doc_skipped(ray_session):
    from octoray.stages.textops import chunk_documents

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([""], pa.string()),
    }))
    assert chunk_documents(ds).count() == 0


def test_prefix_sum_exclusive_and_partition_invariant(ray_session):
    from octoray.query import sorted_prefix_sum

    tbl = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "v": pa.array([(i * 3) % 7 for i in range(100)], pa.int64()),
    })
    for parts in (1, 4, 16):
        ds = rd.from_arrow(tbl).repartition(parts)
        out = sorted_prefix_sum(ds, "v", order_col="id").to_pandas()
        out = out.sort_values("id").reset_index(drop=True)
        want = 0
        for i in range(100):
            assert out.loc[i, "offset"] == want, (parts, i)
            want += (i * 3) % 7


def test_pack_sequences_bins(ray_session):
    from octoray.stages.textops import pack_sequences

    # 5 docs x 4 tokens, window 8 -> bins 0,0,1,1,2
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["a b c d"] * 5, pa.string()),
    }))
    out = pack_sequences(ds, window_tokens=8).to_pandas()
    out = out.sort_values("doc_id")
    assert list(out["offset"]) == [0, 4, 8, 12, 16]
    assert list(out["bin"]) == [0, 0, 1, 1, 2]


def test_shuffle_rank_permutation(ray_session):
    """shuffle_rank is a complete permutation 0..n-1, deterministic for
    a seed, different across seeds, and stable under repartitioning."""
    import ray.data as rd
    import pyarrow as pa

    from octoray.stages.textops import shuffle_rank

    ids = pa.table({"doc_id": pa.array(list(range(100)), pa.int64())})
    ds = rd.from_arrow(ids)
    out = {r["doc_id"]: r["shuffle_pos"]
           for r in shuffle_rank(ds, seed=7).take_all()}
    assert sorted(out.values()) == list(range(100))
    again = {r["doc_id"]: r["shuffle_pos"]
             for r in shuffle_rank(ds.repartition(9), seed=7).take_all()}
    assert again == out
    other = {r["doc_id"]: r["shuffle_pos"]
             for r in shuffle_rank(ds, seed=8).take_all()}
    assert other != out
    assert sorted(other.values()) == list(range(100))
