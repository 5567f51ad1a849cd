"""Incremental crawl -> KG ingestion (pipelines/ingest.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _snap(n, S, s):
    from octoray.sources.crawl import crawl_dataset

    def f(t: pa.Table, s=s) -> pa.Table:
        sel = t.filter(pc.equal(pc.cast(t.column("snapshot"), pa.int64()), s))
        return pa.table({"url": sel.column("url"), "text": sel.column("text")})

    return crawl_dataset(n, n_snapshots=S).map_batches(f, batch_format="pyarrow")


def _graph_set(ds):
    return {
        (r["subject"], r["predicate"], r["object"], r["object_datatype"])
        for r in ds.take_all()
    }


def test_ingest_converges_to_full_rebuild(ray_session, tmp_path):
    """Ingesting snapshots 0..S in order == building from scratch over
    each url's latest content; later snapshots only pay for changed
    pages; re-ingesting the last snapshot is a no-op."""
    from octoray.pipelines.ingest import ingest_snapshot, read_ingest_graph
    from octoray.pipelines.kg import build_triples
    from octoray.sources.crawl import crawl_dataset
    from octoray.stages.canon import dedup_triples

    n, S = 150, 3
    store = str(tmp_path / "store")
    reports = [
        ingest_snapshot(_snap(n, S, s), store, emitter_concurrency=2)
        for s in range(S)
    ]
    assert reports[0]["pages_changed"] > reports[1]["pages_changed"]
    assert all(r["retracted"] > 0 for r in reports[1:])

    r_again = ingest_snapshot(_snap(n, S, S - 1), store, emitter_concurrency=2)
    assert r_again["pages_changed"] == 0 and r_again["run"] is None

    # latest content per url, driver-side
    best = {}
    for b in crawl_dataset(n, n_snapshots=S).iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            k = r["url"]
            if k not in best or r["warc_ts"] > best[k]["warc_ts"]:
                best[k] = r
    latest = pa.table({
        "url": pa.array([r["url"] for r in best.values()], pa.string()),
        "text": pa.array([r["text"] for r in best.values()], pa.string()),
    })
    full = dedup_triples(build_triples(
        rd.from_arrow(latest), extract=False, emitter_concurrency=2))
    assert _graph_set(dedup_triples(read_ingest_graph(store))) == _graph_set(full)


def test_ingest_zero_triple_revision_retracts(ray_session, tmp_path):
    """A url whose new content emits NO triples must still lose its
    old triples (the case a triple-log-only oracle cannot see)."""
    from octoray.pipelines.ingest import ingest_snapshot, read_ingest_graph

    def pages(text):
        return rd.from_arrow(pa.table({
            "url": pa.array(["https://x.org/1"], pa.string()),
            "text": pa.array([text], pa.string()),
        }))

    store = str(tmp_path / "store")
    r1 = ingest_snapshot(
        pages("Specimen A/swine/Iowa/1/2020 typed as H1N1 was collected."),
        store, emitter_concurrency=2)
    assert r1["triples_out"] > 0
    r2 = ingest_snapshot(pages("nothing recognizable here at all"),
                         store, emitter_concurrency=2)
    assert r2["pages_changed"] == 1 and r2["retracted"] == r1["triples_out"]
    assert read_ingest_graph(store).count() == 0


def test_ingest_crash_gc(ray_session, tmp_path):
    """Manifest-less run dirs and stale tmp dirs are invisible and
    gc'd; the next ingest converges."""
    from octoray.pipelines.ingest import (
        ingest_snapshot,
        ledger_state,
        read_ingest_graph,
    )

    store = str(tmp_path / "store")
    ingest_snapshot(_snap(100, 2, 0), store, emitter_concurrency=2)
    n0 = read_ingest_graph(store).count()

    # fake a crashed second ingest: orphan run dirs without manifests
    for sub in ("triples", "ledger"):
        d = os.path.join(store, sub, "run=0001")
        os.makedirs(d)
        with open(os.path.join(d, "junk.parquet"), "wb") as fh:
            fh.write(b"not parquet")
    os.makedirs(os.path.join(store, "triples", ".tmp-run=0002"))

    # manifest-less orphans are invisible to reads (junk parquet never
    # touched) and gc'd by the next ingest
    assert read_ingest_graph(store).count() == n0
    r = ingest_snapshot(_snap(100, 2, 1), store, emitter_concurrency=2)
    assert r["run"] == 1  # orphan was gc'd, numbering dense
    assert not os.path.isdir(os.path.join(store, "triples", ".tmp-run=0002"))
    led = {r["url"]: r["run"] for r in ledger_state(store).take_all()}
    assert max(led.values()) == 1


def test_torn_commit_rolls_back_orphan_triples(ray_session, tmp_path):
    """Crash between the triples commit and the ledger commit: the
    orphan triples run must be rolled back (else re-ingest doubles
    those urls' triples) and the retry must converge to the clean
    graph."""
    import shutil

    from octoray.pipelines.ingest import ingest_snapshot, read_ingest_graph

    store = str(tmp_path / "store")
    clean = str(tmp_path / "clean")
    ingest_snapshot(_snap(120, 2, 0), store, emitter_concurrency=2)
    ingest_snapshot(_snap(120, 2, 0), clean, emitter_concurrency=2)
    ingest_snapshot(_snap(120, 2, 1), clean, emitter_concurrency=2)

    # simulate the torn second ingest on `store`: copy run=0001 triples
    # from clean (a completed triples commit) WITHOUT its ledger run
    run0_count = read_ingest_graph(store).count()
    shutil.copytree(os.path.join(clean, "triples", "run=0001"),
                    os.path.join(store, "triples", "run=0001"))
    # a reader never sees the orphan (unpaired run is invisible)
    assert read_ingest_graph(store).count() == run0_count

    r = ingest_snapshot(_snap(120, 2, 1), store, emitter_concurrency=2)
    assert r["run"] == 1  # orphan rolled back, run id reused
    key = lambda x: (x["subject"], x["predicate"], x["object"],
                     x["object_datatype"])
    assert sorted(map(key, read_ingest_graph(store).take_all())) == sorted(
        map(key, read_ingest_graph(clean).take_all()))


def test_retraction_tmp_promotes_after_crash(ray_session, tmp_path):
    """Crash between removing a partition and promoting its rewritten
    tmp: the next ingest promotes the manifested tmp instead of
    deleting the run's surviving triples."""
    import shutil

    from octoray.pipelines.ingest import _gc, read_ingest_graph, ingest_snapshot

    store = str(tmp_path / "store")
    ingest_snapshot(_snap(120, 2, 0), store, emitter_concurrency=2)
    troot = os.path.join(store, "triples")
    run0 = os.path.join(troot, "run=0000")
    n0 = read_ingest_graph(store).count()

    # simulate: rewrite completed into tmp (manifest included), old
    # partition already removed, final rename never happened
    tmp = os.path.join(troot, ".tmp-retract-run=0000")
    shutil.move(run0, tmp)
    assert read_ingest_graph(store).count() == 0
    _gc(troot)
    assert read_ingest_graph(store).count() == n0


def test_ingest_distributed_change_detection_matches_broadcast(
        ray_session, tmp_path):
    """broadcast_limit=0 forces the distributed (url, md5) anti-join
    change-detection path (J9 at scale); it must converge to the same
    graph, change counts and retraction counts as the broadcast path."""
    from octoray.pipelines.ingest import ingest_snapshot, read_ingest_graph

    n, S = 120, 3
    a = str(tmp_path / "bcast")
    b = str(tmp_path / "dist")
    for s in range(S):
        ra = ingest_snapshot(_snap(n, S, s), a, emitter_concurrency=2)
        rb = ingest_snapshot(_snap(n, S, s), b, emitter_concurrency=2,
                             broadcast_limit=0)
        assert ra["pages_changed"] == rb["pages_changed"]
        assert ra["triples_out"] == rb["triples_out"]
        assert ra["retracted"] == rb["retracted"]
    assert _graph_set(read_ingest_graph(a)) == _graph_set(read_ingest_graph(b))

    # re-ingesting the last snapshot through the join path is a no-op
    r = ingest_snapshot(_snap(n, S, S - 1), b, emitter_concurrency=2,
                        broadcast_limit=0)
    assert r["pages_changed"] == 0 and r["run"] is None


def test_crash_between_commit_and_retraction_heals(
        ray_session, tmp_path, monkeypatch):
    """Commit-then-retract crash window: the new run commits but the
    retraction never happens.  Readers must NOT see the superseded
    duplicates (pending-intent masking), and the next ingest must
    replay the retraction idempotently and clear the intent."""
    import octoray.pipelines.ingest as ing

    store = str(tmp_path / "store")
    clean = str(tmp_path / "clean")
    ing.ingest_snapshot(_snap(120, 2, 0), store, emitter_concurrency=2)
    ing.ingest_snapshot(_snap(120, 2, 0), clean, emitter_concurrency=2)
    ing.ingest_snapshot(_snap(120, 2, 1), clean, emitter_concurrency=2)

    real = ing._retract_srcs

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before retraction")

    monkeypatch.setattr(ing, "_retract_srcs", boom)
    try:
        ing.ingest_snapshot(_snap(120, 2, 1), store, emitter_concurrency=2)
    except RuntimeError:
        pass
    monkeypatch.setattr(ing, "_retract_srcs", real)

    # the intent is pending and masks the duplicate window for readers
    assert len(ing._pending_intents(store)) == 1
    assert _graph_set(ing.read_ingest_graph(store)) == _graph_set(
        ing.read_ingest_graph(clean))

    # next ingest (a no-op snapshot) replays the retraction and clears
    # the intent; the store is physically identical to the clean twin
    r = ing.ingest_snapshot(_snap(120, 2, 1), store, emitter_concurrency=2)
    assert r["pages_changed"] == 0
    assert ing._pending_intents(store) == []
    assert _graph_set(ing.read_ingest_graph(store)) == _graph_set(
        ing.read_ingest_graph(clean))
    # physically gone too: raw parquet row counts match
    import glob

    import pyarrow.parquet as pq

    def raw_rows(st):
        return sum(pq.ParquetFile(f).metadata.num_rows for f in glob.glob(
            os.path.join(st, "triples", "run=*", "*.parquet")))

    assert raw_rows(store) == raw_rows(clean)


def test_compact_store_preserves_semantics(ray_session, tmp_path):
    """Compaction collapses N run pairs to one; the graph is
    byte-identical and subsequent incremental ingests behave exactly
    as on the uncompacted store."""
    from octoray.pipelines.ingest import (
        compact_store,
        ingest_snapshot,
        read_ingest_graph,
    )

    n, S = 120, 3
    a = str(tmp_path / "a")
    for s in range(S - 1):
        ingest_snapshot(_snap(n, S, s), a, emitter_concurrency=2)

    b = str(tmp_path / "b")
    compact_store(a, b)
    assert len(os.listdir(os.path.join(b, "triples"))) == 1
    assert _graph_set(read_ingest_graph(a)) == _graph_set(read_ingest_graph(b))

    # the final snapshot ingests identically on both stores
    ra = ingest_snapshot(_snap(n, S, S - 1), a, emitter_concurrency=2)
    rb = ingest_snapshot(_snap(n, S, S - 1), b, emitter_concurrency=2)
    assert ra["pages_changed"] == rb["pages_changed"]
    assert ra["triples_out"] == rb["triples_out"]
    assert _graph_set(read_ingest_graph(a)) == _graph_set(read_ingest_graph(b))

    # re-ingesting on the compacted store is still a no-op
    r = ingest_snapshot(_snap(n, S, S - 1), b, emitter_concurrency=2)
    assert r["pages_changed"] == 0
