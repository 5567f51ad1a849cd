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


def test_pull_fused_equals_sequential(ray_session, tmp_path):
    """The single-execution fused step path lands exactly the graph and
    per-step counts of the per-step sequential path."""
    from octoray.pipelines.pull import pull, read_graph

    a, b = str(tmp_path / "fused"), str(tmp_path / "seq")
    rf = pull(300, a, n_shards=2, emitter_concurrency=2, fused=True)
    rs = pull(300, b, n_shards=2, emitter_concurrency=2, fused=False)
    assert rf["steps"] == rs["steps"]
    key = lambda r: (r["subject"], r["predicate"], r["object"], r["object_datatype"])
    assert sorted(map(key, read_graph(a).take_all())) == sorted(
        map(key, read_graph(b).take_all())
    )


def test_fusable_guard():
    """Steps whose consumes/derives overlap — or undeclared plugin
    steps — must refuse the fused path."""
    from octoray.pipelines import pull as P

    assert P._fusable(["quarters", "located"])
    # a hypothetical step consuming another step's derived predicate
    P.STEP_CONSUMES["followup"] = {"f:collection_q"}
    P.STEP_DERIVES["followup"] = "f:followup"
    try:
        assert not P._fusable(["quarters", "followup"])
        assert not P._fusable(["quarters", "undeclared_plugin_step"])
    finally:
        del P.STEP_CONSUMES["followup"], P.STEP_DERIVES["followup"]


def test_fused_crash_recovery(ray_session, tmp_path):
    """A pull that dies mid-fused-step-write leaves only invisible
    state (a .fused_tmp root and/or manifest-less run dirs); the next
    pull gc's it and converges to the clean-run graph."""
    import json
    import os
    import shutil

    from octoray.pipelines.pull import pull, read_graph

    out = str(tmp_path / "kg")
    clean = str(tmp_path / "clean")
    pull(300, clean, n_shards=2, emitter_concurrency=2)

    # base build succeeds, then simulate a crash during the fused step
    # write: a stale tmp root with partial parquet and a run dir whose
    # manifest never landed
    from octoray.pipelines.kg import run_kg_build

    run_kg_build(300, out, n_shards=2, emitter_concurrency=2)
    tmp = os.path.join(out, "derived", ".fused_tmp", "step=quarters")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "zz_partial.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    orphan = os.path.join(out, "derived", "step=located", "run=0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "wb") as fh:
        fh.write(b"also not parquet")
    # no _MANIFEST.json in orphan -> invisible to read_graph, gc'd

    r = pull(300, out, n_shards=2, emitter_concurrency=2)
    assert r["steps"]["quarters"] > 0 and r["steps"]["located"] > 0
    assert not os.path.isdir(os.path.join(out, "derived", ".fused_tmp"))

    key = lambda x: (x["subject"], x["predicate"], x["object"], x["object_datatype"])
    assert sorted(map(key, read_graph(out).take_all())) == sorted(
        map(key, read_graph(clean).take_all())
    )
