"""End-to-end KG pipeline tests: P/R gate, extraction invariant,
canonicalization determinism, skew-safe aggregation, resume."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from octoray.sources import webtext
from octoray.stages.scan import MentionEmitter

N_GOLDEN = 1500  # pages for the P/R gate (driver-side, no Ray needed)


def test_scan_emit_pr_gate():
    """P/R >= 0.95 vs the reference emitter semantics (BASELINE.md).
    The truth side runs the ported reference emission on the known
    embedded fields; the scan side must rediscover them from raw text."""
    em = MentionEmitter()
    tp = fp = fn = 0
    for pid in range(N_GOLDEN):
        row, _ = webtext.page_record(pid)
        truth = webtext.truth_triples(pid)
        got = set(em.emit_page(row["url"], row["text"]))
        tp += len(truth & got)
        fp += len(got - truth)
        fn += len(truth - got)
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_scan_fused_equals_two_pass():
    """The fused single-pass scan+vocab regex must reproduce the
    two-pass scan-then-mask form span-for-span (see
    _build_combined_regex's equivalence argument), including the
    multi-word-vocabulary edge cases."""
    em = MentionEmitter()
    for pid in range(4000):
        row, _ = webtext.page_record(pid)
        text = row["text"]
        assert em.page_mentions(text) == em.page_mentions_two_pass(text)
    adversarial = [
        "A/Iowa/01/2018 swine New York EPI_ISL_123",
        "New May 31, 2018 York",
        "United States H1N1 2018-01-01",
        "South Dakota3B.2.1 3B.2.1 Iowa",
        "A/swine/Iowa/A01234567/2018 (H1N1) 05-Jun-2011",
        "H1N1,2018-01-01,Iowa",
        "",
    ]
    for text in adversarial:
        assert em.page_mentions(text) == em.page_mentions_two_pass(text)


def test_synthesis_deterministic_across_batching():
    """Page content must not depend on batch boundaries."""
    import numpy as np

    one = webtext.pages_batch(np.arange(0, 64))
    a = webtext.pages_batch(np.arange(0, 31))
    b = webtext.pages_batch(np.arange(31, 64))
    two = pa.concat_tables([a, b])
    assert one.equals(two)


def test_extraction_invariant(ray_session):
    from octoray.stages.extract import verify_extraction_batch

    ds = webtext.pages_dataset(300).map_batches(
        verify_extraction_batch, batch_format="pyarrow"
    )
    rows = ds.take_all()
    assert len(rows) == 300
    assert all(r["text_ok"] for r in rows)


def test_kg_end_to_end_canonical(ray_session):
    """Full pipeline: dedup leaves no duplicates; output is sorted;
    two runs are byte-identical (determinism under parallelism)."""
    from octoray.pipelines import kg

    t1 = pa.Table.from_pylist(kg.synth_kg(400).take_all())
    t2 = pa.Table.from_pylist(kg.synth_kg(400).take_all())
    assert t1.num_rows > 0
    assert t1.equals(t2)
    # no duplicate rows
    keys = list(zip(*[t1.column(c).to_pylist() for c in t1.schema.names]))
    assert len(keys) == len(set(keys))
    # sorted canonically
    assert keys == sorted(keys)


def test_kg_matches_truth_union(ray_session):
    """Pipeline triples == union of per-page truth triples, deduped."""
    from octoray.pipelines import kg

    got = {
        (r["subject"], r["predicate"], r["object"], r["object_datatype"])
        for r in kg.synth_kg(300).take_all()
    }
    truth = set()
    for pid in range(300):
        truth |= webtext.truth_triples(pid)
    assert got == truth


def test_subject_degree_combined_equals_naive(ray_session):
    """The skew-safe pre-combined aggregate must equal the naive
    single-shuffle groupby (salted == unsalted correctness, §4.3)."""
    from octoray.pipelines import kg
    from octoray.stages import canon
    from octoray.sources.webtext import pages_dataset

    triples = kg.build_triples(pages_dataset(200), emitter_concurrency=2)
    a = {(r["subject"], r["degree"]) for r in canon.subject_degree(triples, combined=True).take_all()}
    b = {(r["subject"], r["degree"]) for r in canon.subject_degree(triples, combined=False).take_all()}
    assert a == b


def test_sharded_build_resume(ray_session, tmp_path):
    """Kill/resume semantics: a second run skips completed shards and
    the final output equals a fresh full build."""
    from octoray.pipelines import kg
    from octoray.state import manifest as mf

    out = str(tmp_path / "kg")
    r1 = kg.run_kg_build(200, out, n_shards=4, emitter_concurrency=2)
    assert len(r1["built"]) == 4
    # simulate a lost shard: delete one manifest
    os.remove(mf.manifest_path(out, "00002"))
    r2 = kg.run_kg_build(200, out, n_shards=4, emitter_concurrency=2)
    assert r2["built"] == ["00002"]
    assert sorted(r2["skipped"]) == ["00000", "00001", "00003"]
    # full graph equals an unsharded build (after global dedup)
    from octoray.stages.canon import canonicalize

    got = pa.Table.from_pylist(canonicalize(kg.read_kg(out)).take_all())
    want = pa.Table.from_pylist(kg.synth_kg(200).take_all())
    assert got.equals(want)


def test_cross_block_dedup_exact(ray_session):
    """The sort-then-adjacent-dedup path must be globally exact even
    when every block holds copies of the same triples: feed the SAME
    page range twice (union), expect exactly the single-build graph."""
    from octoray.pipelines.kg import build_triples, pages_dataset
    from octoray.stages.canon import canonicalize

    once = pa.Table.from_pylist(
        canonicalize(build_triples(pages_dataset(300), emitter_concurrency=2)).take_all()
    )
    a = build_triples(pages_dataset(300), emitter_concurrency=(1, 2))
    b = build_triples(pages_dataset(300), emitter_concurrency=(1, 2))
    twice = pa.Table.from_pylist(canonicalize(a.union(b)).take_all())
    assert twice.equals(once)


def test_crashed_partial_write_recovery(ray_session, tmp_path):
    """Simulate a worker dying MID-WRITE (ADVICE r1 #1): the shard dir
    holds stale partial parquet (with an extra duplicated file, as a
    re-write without cleanup would leave) and no manifest.  Resume must
    rebuild exactly that shard and converge to the byte-identical
    graph — no duplicated triples, no losses."""
    import glob
    import os
    import shutil

    import duckdb

    from octoray.pipelines import kg
    from octoray.state import manifest as mf

    out = str(tmp_path / "kg")
    kg.run_kg_build(800, out, n_shards=2, emitter_concurrency=2)

    def graph_sig():
        files = glob.glob(os.path.join(out, "shard=*", "*.parquet"))
        q = ("select count(*), count(distinct (subject||chr(0)||predicate||"
             "chr(0)||object||chr(0)||object_datatype)) from read_parquet(?)")
        return duckdb.execute(q, [files]).fetchone()

    want = graph_sig()

    # crash shard 00001: kill its manifest, leave its data files, and
    # plant a stale duplicate file (execution-unique names mean a naive
    # re-write would ADD a second copy instead of replacing)
    sdir = mf.shard_dir(out, "00001")
    os.remove(mf.manifest_path(out, "00001"))
    victim = sorted(glob.glob(os.path.join(sdir, "*.parquet")))[0]
    shutil.copy(victim, os.path.join(sdir, "zz-stale-partial.parquet"))

    res = kg.run_kg_build(800, out, n_shards=2, emitter_concurrency=2)
    assert res["built"] == ["00001"]
    assert res["skipped"] == ["00000"]
    got = graph_sig()
    assert got == want, f"graph diverged after crash-resume: {got} != {want}"
    assert not os.path.exists(os.path.join(sdir, "zz-stale-partial.parquet"))


def test_triple_delta_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.canon import triple_delta

    def trip(rows):
        return rd.from_arrow(pa.table({
            "subject": [r[0] for r in rows],
            "predicate": [r[1] for r in rows],
            "object": [r[2] for r in rows],
            "object_datatype": [r[3] for r in rows]}))

    old = trip([("s1", "p", "a", "plain"), ("s2", "p", "b", "plain")])
    new = trip([("s1", "p", "a", "plain"), ("s3", "p", "c", "plain"),
                # same s,p,o as old s2 but different datatype: BOTH ops
                ("s2", "p", "b", "uri")])
    out = triple_delta(old, new).to_pandas()
    got = {(r["op"], r["subject"], r["object_datatype"])
           for _, r in out.iterrows()}
    assert got == {("removed", "s2", "plain"), ("added", "s3", "plain"),
                   ("added", "s2", "uri")}
