"""LSH kNN recall gate (VERDICT r1 next-round #9): the 'balanced'
preset must hold recall@10 >= 0.8 vs brute force on the sf0.1
embeddings — the ADVERSARIAL case for LSH (unclustered vectors,
neighbor cosine ~0.4-0.5).  Clustered near-dup corpora only do
better."""

import pytest


@pytest.mark.parametrize("preset,floor", [("balanced", 0.8)])
def test_lsh_knn_recall_gate(ray_session, preset, floor):
    import ray.data as rd

    from octoray.stages.similarity import knn_brute, lsh_bucket_knn

    emb = rd.read_parquet("/root/testdata/sf0.1/embeddings.parquet")
    qids = [3, 7, 11, 19, 23]
    want = {(r["query_id"], r["neighbor_id"])
            for r in knn_brute(emb, qids, k=10).take_all()}
    got = {(r["query_id"], r["neighbor_id"])
           for r in lsh_bucket_knn(emb, qids, k=10, preset=preset).take_all()}
    recall = len(got & want) / len(want)
    assert recall >= floor, f"recall@10={recall:.2f} below {floor} at {preset}"


def test_ivf_knn_recall_gate(ray_session):
    """IVF at the shipped driver point (64 centroids, 24 probes) must
    hold recall@10 >= 0.8 vs brute on the same adversarial corpus —
    scoring ~24/64 of it.  Also pins determinism: two builds from the
    same corpus+seed produce identical results."""
    import ray.data as rd

    from octoray.stages.similarity import ivf_knn, knn_brute

    emb = rd.read_parquet("/root/testdata/sf0.1/embeddings.parquet")
    qids = [3, 7, 11, 19, 23]
    want = {(r["query_id"], r["neighbor_id"])
            for r in knn_brute(emb, qids, k=10).take_all()}
    rows1 = sorted(map(tuple, (
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in ivf_knn(emb, qids, k=10, n_centroids=64, nprobe=24).take_all())))
    rows2 = sorted(map(tuple, (
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in ivf_knn(emb, qids, k=10, n_centroids=64, nprobe=24).take_all())))
    assert rows1 == rows2
    got = {(q, n) for q, n, _ in rows1}
    recall = len(got & want) / len(want)
    assert recall >= 0.8, f"recall@10={recall:.2f} below 0.8"


def test_ivf_index_roundtrip_equals_inmemory(ray_session, tmp_path):
    """The materialized cluster-partitioned index answers exactly like
    the in-memory IVF path at equal centroids, while reading only the
    probed partitions."""
    import os

    import numpy as np
    import ray.data as rd

    from octoray.stages import similarity as S

    import ray.data as rd

    emb = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    d = str(tmp_path / "ivf")
    C = S.write_ivf_index(emb, d, n_centroids=8)
    # hive layout exists and the sidecar restores the same centroids
    assert sorted(p for p in os.listdir(d) if p.startswith("cluster="))
    assert np.allclose(S.read_ivf_centroids(d), C)
    qids, Q = S.load_queries(emb, [0, 1, 2])
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in S.ivf_index_knn(d, Q, qids, k=5, nprobe=4).take_all())
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in S.ivf_knn(emb, [0, 1, 2], k=5, nprobe=4,
                           centroids=C).take_all())
    assert got == want


def test_ivf_append_equals_inmemory_over_union(ray_session, tmp_path):
    """Incremental append against frozen centroids: the post-append
    on-disk index answers exactly like in-memory IVF over the UNION
    corpus with the same centroids, existing part files untouched."""
    import glob
    import os

    import pyarrow as pa
    import ray.data as rd

    from octoray.stages import similarity as S

    emb = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")

    def parity(p):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == p))
        return f

    first = emb.map_batches(parity(0), batch_format="pyarrow")
    second = emb.map_batches(parity(1), batch_format="pyarrow")
    d = str(tmp_path / "ivf")
    C = S.write_ivf_index(first, d, n_centroids=8)
    before = sorted(glob.glob(os.path.join(d, "cluster=*", "*.parquet")))
    sizes = {f: os.path.getsize(f) for f in before}
    C2 = S.append_ivf_index(second, d)
    import numpy as np

    assert np.allclose(C, C2)  # centroids frozen, not retrained
    after = sorted(glob.glob(os.path.join(d, "cluster=*", "*.parquet")))
    assert set(before) <= set(after) and len(after) > len(before)
    assert all(os.path.getsize(f) == s for f, s in sizes.items())
    qids, Q = S.load_queries(emb, [0, 1, 2])
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in S.ivf_index_knn(d, Q, qids, k=5, nprobe=4).take_all())
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in S.ivf_knn(emb, [0, 1, 2], k=5, nprobe=4,
                           centroids=C).take_all())
    assert got == want


def test_ivf_retrain_recall_gate(ray_session, tmp_path):
    """The monitored-append lifecycle (VERDICT r4 #2): build on half
    the corpus, append the other half to the frozen quantizer, retrain
    -and-rewrite — the RETRAINED index must hold recall@10 >= 0.9 vs
    brute force on the adversarial sf0.1 embeddings, and must equal a
    fresh build over the same (post-append) corpus exactly."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from octoray.stages import similarity as S

    emb = rd.read_parquet("/root/testdata/sf0.1/embeddings.parquet")
    qids = [3, 7, 11, 19, 23]
    want = {(r["query_id"], r["neighbor_id"])
            for r in S.knn_brute(emb, qids, k=10).take_all()}

    def parity(p):
        def f(t):
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == p))
        return f

    first = emb.map_batches(parity(0), batch_format="pyarrow")
    second = emb.map_batches(parity(1), batch_format="pyarrow")
    d = os.path.join(tmp_path, "ivf0")
    d2 = os.path.join(tmp_path, "ivf1")
    d3 = os.path.join(tmp_path, "ivf_fresh")
    S.write_ivf_index(first, d, n_centroids=64)
    S.append_ivf_index(second, d)
    S.retrain_ivf_index(d, d2, n_centroids=64)

    _, Q = S.load_queries(emb, qids)
    rows = sorted(
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in S.ivf_index_knn(d2, Q, qids, k=10, nprobe=40).take_all())
    got = {(q, n) for q, n, _ in rows}
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"retrained recall@10={recall:.2f} below 0.9"

    # retrain == fresh build over the full corpus (same deterministic
    # sample/seed), so the drifted-index cure converges to the ideal
    S.write_ivf_index(emb, d3, n_centroids=64)
    fresh = sorted(
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in S.ivf_index_knn(d3, Q, qids, k=10, nprobe=40).take_all())
    assert rows == fresh


def test_ivf_drift_monitor(ray_session, tmp_path):
    """An in-distribution append must NOT trigger the monitor (the
    baseline is a HELD-OUT fold, so iid data scores ~1.0 of it); an
    append that moved off the quantizer's span (projected into the
    centroid null space — assign-cosine collapses) must trigger."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages import similarity as S

    emb = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    d = os.path.join(tmp_path, "ivf")

    def parity(p):
        def f(t):
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == p))
        return f

    first = emb.map_batches(parity(0), batch_format="pyarrow")
    second = emb.map_batches(parity(1), batch_format="pyarrow")
    S.write_ivf_index(first, d, n_centroids=16)

    ok = S.ivf_drift(d, second, threshold=0.8)
    assert ok["baseline_sim"] is not None and ok["n_increment"] > 0
    assert ok["ratio"] > 0.8, ok
    assert not ok["retrain_needed"], ok

    # drifted increment: project every vector into the null space of
    # the centroid span — nearest-centroid cosine collapses, the
    # geometric meaning of "the quantizer no longer fits the data"
    C = S.read_ivf_centroids(d)
    Qb, _ = np.linalg.qr(C.T)  # (dim, r) orthonormal span basis

    def off_span(t: pa.Table) -> pa.Table:
        M = np.asarray(t.column("embedding").to_pylist(), np.float64)
        M = M - (M @ Qb) @ Qb.T
        return pa.table({"vec_id": t.column("vec_id"),
                         "embedding": pa.array([list(r) for r in M],
                                               pa.list_(pa.float64()))})

    drifted = second.map_batches(off_span, batch_format="pyarrow")
    bad = S.ivf_drift(d, drifted, threshold=0.8)
    assert bad["ratio"] < ok["ratio"]
    assert bad["retrain_needed"], bad
