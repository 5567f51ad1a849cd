"""Graph mutation: scoped retraction + delete-then-recompute cycle
(reference delete-*.rq / update_cmd, ui.py:544-560, 1372-1462)."""

import json
import os

import pyarrow.parquet as pq


def _graph_rows(out):
    from octoray.pipelines.pull import read_graph

    return read_graph(out).take_all()


def _canon_set(rows):
    return {(r["subject"], r["predicate"], r["object"], r["object_datatype"])
            for r in rows}


def test_delete_predicate_rewrites_only_affected(ray_session, tmp_path):
    from octoray.pipelines.pull import pull
    from octoray.pipelines.update import delete_where

    out = str(tmp_path / "kg")
    pull(300, out, n_shards=2, emitter_concurrency=2)

    before = _graph_rows(out)
    n_q = sum(1 for r in before if r["predicate"] == "f:collection_q")
    assert n_q > 0

    # f:collection_q lives ONLY in the quarters derived partition:
    # base shards must not be rewritten
    base_mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "_MANIFEST.json"))
        for d in os.listdir(out) if d.startswith("shard=")
    }
    res = delete_where(out, predicates=["f:collection_q"])
    assert res["triples_deleted"] == n_q
    assert res["partitions_rewritten"] == 1  # just derived/step=quarters
    for d, m in base_mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "_MANIFEST.json")) == m

    after = _graph_rows(out)
    assert not any(r["predicate"] == "f:collection_q" for r in after)
    assert len(after) == len(before) - n_q

    # the rewritten partition's manifest carries the deletion lineage
    mpath = os.path.join(out, "derived", "step=quarters", "run=0000", "_MANIFEST.json")
    doc = json.load(open(mpath))
    assert doc["deletes"][0]["predicates"] == ["f:collection_q"]
    assert doc["triples_out"] == 0


def test_delete_then_repull_converges(ray_session, tmp_path):
    """The reference's update cycle: retract a derived class, re-pull,
    converge byte-identically to the pre-delete graph."""
    from octoray.pipelines.pull import pull
    from octoray.pipelines.update import delete_where

    out = str(tmp_path / "kg")
    pull(300, out, n_shards=2, emitter_concurrency=2)
    want = _canon_set(_graph_rows(out))

    delete_where(out, predicates=["f:collection_q"])
    assert _canon_set(_graph_rows(out)) < want

    r = pull(300, out, n_shards=2, emitter_concurrency=2)
    assert r["base"]["built"] == []          # base untouched
    assert r["steps"]["quarters"] > 0        # recomputed
    assert _canon_set(_graph_rows(out)) == want


def test_refresh_step_recomputes(ray_session, tmp_path):
    from octoray.pipelines.pull import pull
    from octoray.pipelines.update import retract_step

    out = str(tmp_path / "kg")
    pull(300, out, n_shards=2, emitter_concurrency=2)
    want = _canon_set(_graph_rows(out))

    # refresh drops + recomputes in one call
    r = pull(300, out, n_shards=2, emitter_concurrency=2, refresh=["located"])
    assert r["steps"]["located"] > 0
    assert _canon_set(_graph_rows(out)) == want

    # plain retract leaves the step gone until the next pull
    res = retract_step(out, "located")
    assert res["existed"] and res["triples_deleted"] > 0
    assert not any(r2["predicate"] == "f:locatedIn" for r2 in _graph_rows(out))


def test_delete_tag_and_subject_scopes(ray_session, tmp_path):
    import ray.data as rd

    from octoray.pipelines.prep import tag_ids
    from octoray.pipelines.update import delete_where
    from octoray.model import make_tag_uri

    out = str(tmp_path / "kg")
    os.makedirs(os.path.join(out, "shard=00000"))
    ids = rd.from_items([{"id": f"id{i}"} for i in range(20)])
    tagged = tag_ids(ids, "batch1", timestamp="2024-01-01")
    tagged.write_parquet(os.path.join(out, "shard=00000"))

    rows = _graph_rows(out)
    n_assign = sum(
        1 for r in rows
        if r["predicate"] == "f:tag" and r["object"] == make_tag_uri("batch1")
    )
    assert n_assign == 20

    # clear-query-tags.rq shape: assignment rows go, tag metadata stays
    res = delete_where(out, tag="batch1")
    assert res["triples_deleted"] == 20
    rows = _graph_rows(out)
    assert not any(r["predicate"] == "f:tag" for r in rows)
    assert any(r["predicate"] == "f:name" for r in rows)

    # subject-scoped: drop the tag's own metadata record
    res = delete_where(out, subjects=[make_tag_uri("batch1")])
    assert res["triples_deleted"] == 2  # f:name + f:time
    assert _graph_rows(out) == []

    # parquet on disk matches (independent of read_graph)
    files = [
        os.path.join(out, "shard=00000", f)
        for f in os.listdir(os.path.join(out, "shard=00000"))
        if f.endswith(".parquet")
    ]
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in files) == 0
