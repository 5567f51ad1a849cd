"""Incremental pull orchestrator: fixpoint derived-attribute steps."""

import pyarrow.compute as pc


def test_pull_fixpoint(ray_session, tmp_path):
    from octoray.pipelines.pull import pull, read_graph

    out = str(tmp_path / "kg")
    r1 = pull(300, out, n_shards=2, emitter_concurrency=2)
    assert len(r1["base"]["built"]) == 2
    assert r1["steps"]["quarters"] > 0
    assert r1["steps"]["located"] > 0

    # derived triples are in the combined graph with the right shape
    g = read_graph(out)
    rows = g.take_all()
    preds = {r["predicate"] for r in rows}
    assert "f:collection_q" in preds and "f:locatedIn" in preds
    qs = [r["object"] for r in rows if r["predicate"] == "f:collection_q"]
    assert qs and all(len(q) == 6 and q[4] == "Q" for q in qs)

    # every dated strain now has a quarter (fixpoint reached)
    dated = {r["subject"] for r in rows if r["predicate"] == "f:date"}
    quartered = {r["subject"] for r in rows if r["predicate"] == "f:collection_q"}
    assert dated == quartered

    # re-run: base skipped, every step a no-op
    r2 = pull(300, out, n_shards=2, emitter_concurrency=2)
    assert r2["base"]["built"] == []
    assert r2["steps"] == {"quarters": 0, "located": 0}

    # and the derived triples SURVIVED the no-op re-pull (regression:
    # the round-1 overwrite-per-pull step layout deleted them once the
    # fixpoint produced an empty batch)
    rows2 = read_graph(out).take_all()
    assert {(r["subject"], r["predicate"], r["object"]) for r in rows2} == {
        (r["subject"], r["predicate"], r["object"]) for r in rows
    }
