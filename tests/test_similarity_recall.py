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
