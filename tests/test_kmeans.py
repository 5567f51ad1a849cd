"""Distributed Lloyd k-means: exactness vs a local numpy reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from octoray.stages.similarity import (
    _normalize,
    kmeans_cluster,
    kmeans_init_centroids,
    kmeans_iterate,
)


def _emb_table(M):
    return pa.table(
        {
            "vec_id": pa.array(range(len(M)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in M],
                                  pa.list_(pa.float32())),
        }
    )


def _reference(M, k, n_iters):
    X = _normalize(np.asarray(M, np.float64))
    C = X[:k].copy()
    for _ in range(n_iters):
        a = np.argmax(X @ C.T, axis=1)
        nxt = C.copy()
        for c in range(k):
            if (a == c).any():
                nxt[c] = X[a == c].mean(axis=0)
        C = _normalize(nxt)
    return C, np.argmax(X @ C.T, axis=1)


def test_matches_local_reference(ray_session):
    rng = np.random.default_rng(11)
    M = rng.normal(size=(120, 8)).astype(np.float32)
    ds = rd.from_arrow(_emb_table(M))
    C_ref, a_ref = _reference(M, k=5, n_iters=4)

    C = kmeans_iterate(ds, kmeans_init_centroids(ds, k=5), n_iters=4)
    assert np.allclose(C, C_ref, atol=1e-12)

    out = kmeans_cluster(ds, k=5, n_iters=4).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    assert (out["cluster"].to_numpy() == a_ref).all()


def test_empty_cluster_carries_forward(ray_session):
    # two tight groups, k=3: the third centroid (init = vector 2, which
    # sits inside group A) empties out after reassignment and must keep
    # its previous position instead of becoming NaN
    A = np.tile([1.0, 0.0], (3, 1)) + 1e-3
    B = np.tile([0.0, 1.0], (3, 1)) + 1e-3
    M = np.vstack([A, B]).astype(np.float32)
    ds = rd.from_arrow(_emb_table(M))
    C = kmeans_iterate(ds, kmeans_init_centroids(ds, k=3), n_iters=3)
    assert np.isfinite(C).all()
    out = kmeans_cluster(ds, k=3, n_iters=3).to_pandas()
    assert out["cluster"].nunique() <= 3


def test_pq_codes_match_per_subspace_kmeans(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.similarity import kmeans_cluster, pq_codes

    rng = np.random.default_rng(17)
    n, dim, m = 120, 16, 4
    vecs = rng.standard_normal((n, dim))
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))})
    out = (pq_codes(rd.from_arrow(t).repartition(3), m=m, k=4, n_iters=2)
           .to_pandas())
    assert len(out) == n * m
    per = dim // m
    for j in range(m):
        sub = pa.table({
            "vec_id": t.column("vec_id"),
            "embedding": pa.array([v[j * per:(j + 1) * per].tolist()
                                   for v in vecs], pa.list_(pa.float64()))})
        want = (kmeans_cluster(rd.from_arrow(sub), k=4, n_iters=2)
                .to_pandas().set_index("vec_id")["cluster"].to_dict())
        got = (out[out["subspace"] == j]
               .set_index("vec_id")["code"].to_dict())
        assert got == want


def test_pq_adc_search_reasonable_recall(ray_session):
    """ADC search over PQ codes should roughly agree with brute cosine
    on a clustered corpus (quantization loses precision, so we gate
    overlap, not equality)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.similarity import knn_brute, pq_adc_search

    rng = np.random.default_rng(23)
    # 4 tight clusters so quantized scores preserve the neighborhood
    centers = rng.standard_normal((4, 16)) * 5
    vecs = np.concatenate([c + rng.standard_normal((30, 16)) * 0.2
                           for c in centers])
    t = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))})
    ds = rd.from_arrow(t).repartition(3)
    adc = pq_adc_search(ds, 0, m=4, k=8, n_iters=3, k_out=10).take_all()
    adc_ids = {r["vec_id"] for r in adc}
    brute = knn_brute(ds, [0], k=10, exclude_self=False).take_all()
    brute_ids = {r["neighbor_id"] for r in brute}
    assert len(adc_ids & brute_ids) >= 5  # same-cluster overlap
    # the query's own cluster dominates the ADC top list
    assert 0 in adc_ids
