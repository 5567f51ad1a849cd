"""Incremental crawl -> KG ingestion: the recurring-snapshot loop the
north rule describes (10^12-page crawls are re-crawled; only changed
content should pay emission).

Store layout (self-describing, append-mostly):

    store/
      ledger/run=K/       (url, content_md5) of the pages (re)ingested
                          by run K — current state of a url = its row
                          in the HIGHEST run containing it (a url only
                          re-appears when its content changed)
      triples/run=K/      canonical triples of run K's changed pages,
                          WITH per-triple provenance (src = url)
      */_MANIFEST.json    per-partition lineage (state/manifest.py
                          conventions: manifest-less dir = crashed
                          write, gc'd)

Ingesting snapshot S:

  1. ledger state      arg-max-by-run collapse of the ledger runs
                       (slim (url, md5) rows — the latest_per_url
                       reduce shape)
  2. change detection  snapshot pages -> (url, md5); pages whose
                       (url, md5) pair is already in the ledger are
                       dropped.  Stats-gated: the ledger state is
                       broadcast as a dict when it fits
                       ``broadcast_limit``; beyond that the SAME
                       semantics run as a distributed anti-join on
                       the composite (url NUL md5) key over slim rows
                       (J9's incremental-resume shape — text never
                       rides the anti-join shuffle; the changed-key
                       set, which is snapshot-delta-sized, then
                       semi-joins the pages to re-attach text, itself
                       stats-gated broadcast-vs-merge)
  3. intent            urls changing content had triples in earlier
                       runs; their urls land in a durable
                       retraction-intent file BEFORE anything is
                       committed (crash recovery replays it)
  4. emission          ONLY changed pages go through the mention
                       emitter (keep_src=True rides the url through
                       as provenance); canonical dedup includes src
                       as a leading key
  5. append            triples/run=K + ledger/run=K land with
                       manifests (write data, then manifest, then
                       rename — crash leaves only invisible state)
  6. retraction        AFTER the commit, affected earlier run
                       partitions are rewritten in parallel Ray tasks
                       with tmp+atomic-swap (the update.delete_where
                       pattern, filter src IN changed, runs < K only)
                       — parquet statistics skip untouched runs; the
                       intent file is removed last.  Commit-then-
                       retract means a crash can only leave visible
                       DUPLICATES (old + new triples for a changed
                       url), never data loss — and even the duplicate
                       window is invisible: ``read_ingest_graph``
                       filters superseded provenance for any pending
                       committed intent, and the next ingest's gc
                       replays the retraction (idempotent) and clears
                       the intent.

Idempotent: re-ingesting an already-seen snapshot finds no changed
urls and writes nothing.  Convergence (pytest-pinned): ingesting
snapshots 0..S in order produces byte-identically the graph built
from scratch over each url's latest content.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc

from octoray.plan import colocated_sort

from octoray import plan

MANIFEST = "_MANIFEST.json"
_TRIPLE5 = ["subject", "predicate", "object", "object_datatype", "src"]


def _runs(root: str) -> List[str]:
    if not os.path.isdir(root):
        return []
    return [os.path.join(root, d) for d in sorted(os.listdir(root))
            if d.startswith("run=")]


def _gc(root: str) -> None:
    """Drop crashed (manifest-less) run dirs; recover or drop tmp dirs.

    A ``.tmp-retract-run=K`` dir WITH a manifest is a completed
    retraction rewrite whose final rename did not land (the crash
    window between removing the old partition and promoting the new
    one): if the partition is missing, PROMOTE the tmp — dropping it
    would permanently lose the run's surviving triples.  Every other
    tmp is an incomplete write and is dropped."""
    for d in list(_runs(root)):
        if not os.path.exists(os.path.join(d, MANIFEST)):
            shutil.rmtree(d)
    if os.path.isdir(root):
        for d in os.listdir(root):
            if not d.startswith(".tmp-"):
                continue
            full = os.path.join(root, d)
            if d.startswith(".tmp-retract-run=") and os.path.exists(
                    os.path.join(full, MANIFEST)):
                dst = os.path.join(root, d[len(".tmp-retract-"):])
                if not os.path.isdir(dst):
                    os.replace(full, dst)
                    continue
            shutil.rmtree(full, ignore_errors=True)


def _gc_unpaired(store_dir: str) -> None:
    """Enforce the ledger/triples pairing invariant: a triples run
    whose ledger run never landed is rolled back (the crash window
    between the two commits — the ledger is the source of truth for
    'these pages are ingested', so orphan triples would double once
    the pages re-ingest)."""
    led = {os.path.basename(d) for d in _runs(os.path.join(store_dir, "ledger"))
           if os.path.exists(os.path.join(d, MANIFEST))}
    for d in _runs(os.path.join(store_dir, "triples")):
        if os.path.basename(d) not in led:
            shutil.rmtree(d)


def _commit_run(root: str, k: int, ds_or_table, manifest: Dict) -> str:
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".tmp-run={k:04d}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    if isinstance(ds_or_table, pa.Table):
        import pyarrow.parquet as pq

        pq.write_table(ds_or_table, os.path.join(tmp, "part-0.parquet"))
    else:
        # an all-empty dataset writes no files; the run dir (manifest
        # only) still lands so the ledger/run numbering stays aligned
        ds_or_table.write_parquet(tmp)
    with open(os.path.join(tmp, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    dst = os.path.join(root, f"run={k:04d}")
    os.replace(tmp, dst)
    return dst


def ledger_state(store_dir: str):
    """Current (url, content_md5) per url: rows from the highest run
    containing each url.  Two-phase arg-max over slim rows (the
    latest_per_url reduce); returns a Dataset."""
    import ray.data as rd

    lroot = os.path.join(store_dir, "ledger")
    runs = [d for d in _runs(lroot)
            if os.path.exists(os.path.join(d, MANIFEST))]
    if not runs:
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "content_md5": pa.array([], pa.string()),
            "run": pa.array([], pa.int64())}))
    parts = []
    for d in runs:
        k = int(os.path.basename(d).split("=")[1])
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.endswith(".parquet")]
        for f in files:
            parts.append((k, f))
    ds = rd.read_parquet([f for _, f in parts])
    # run id from the file path is lost after read; re-derive it by
    # tagging each run's files separately would need per-file reads —
    # instead the ledger rows CARRY their run id as a column (written
    # at commit time), so the collapse is pure data
    def keep_latest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        import pandas as pd  # noqa: F401

        df = t.to_pandas().sort_values(
            ["url", "run"], ascending=[True, False], kind="mergesort"
        ).drop_duplicates("url", keep="first")
        return pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)

    pre = ds.map_batches(keep_latest, batch_format="pyarrow")
    return colocated_sort(pre, ["url"]).map_batches(
        keep_latest, batch_format="pyarrow", batch_size=None)


def _next_run(store_dir: str) -> int:
    ks = []
    for sub in ("ledger", "triples"):
        for d in _runs(os.path.join(store_dir, sub)):
            ks.append(int(os.path.basename(d).split("=")[1]))
    return max(ks) + 1 if ks else 0


def _intent_path(store_dir: str, k: int) -> str:
    return os.path.join(store_dir, f".retract-intent-run={k:04d}.json")


def _pending_intents(store_dir: str) -> List[Dict]:
    """Durable retraction intents not yet cleared: each records the
    run K whose commit supersedes ``urls``' earlier triples.  An
    intent is written BEFORE run K commits and removed AFTER the
    retraction completes, so its presence marks the crash window."""
    out = []
    if not os.path.isdir(store_dir):
        return out
    for f in sorted(os.listdir(store_dir)):
        if f.startswith(".retract-intent-run=") and f.endswith(".json"):
            p = os.path.join(store_dir, f)
            try:
                with open(p) as fh:
                    doc = json.load(fh)
            except (json.JSONDecodeError, OSError):
                # torn intent write: run K cannot have committed yet
                # (intent lands first), so dropping it is safe
                os.remove(p)
                continue
            doc["_path"] = p
            out.append(doc)
    return out


def _run_committed(store_dir: str, k: int) -> bool:
    return all(os.path.exists(os.path.join(
        store_dir, sub, f"run={k:04d}", MANIFEST))
        for sub in ("triples", "ledger"))


def _gc_intents(store_dir: str) -> int:
    """Replay pending retraction intents (crash recovery).  An intent
    whose run K committed is replayed — idempotent: partitions already
    rewritten have no matching src rows and are skipped — then
    removed.  An intent whose run never landed is dropped (the paired
    _gc/_gc_unpaired already rolled the partial run back; change
    detection will redo that snapshot's work)."""
    replayed = 0
    for doc in _pending_intents(store_dir):
        if _run_committed(store_dir, doc["run"]):
            _retract_srcs(store_dir, doc["urls"], before_run=doc["run"])
            replayed += 1
        os.remove(doc["_path"])
    return replayed


def _retract_srcs(store_dir: str, urls: List[str], *,
                  before_run: Optional[int] = None) -> Dict:
    """Rewrite triple runs dropping rows whose src is in ``urls``
    (tmp + atomic swap per partition, parallel Ray tasks; parquet
    statistics skip unaffected runs) — the update.delete_where shape
    with provenance as the filter.  ``before_run`` restricts the
    rewrite to runs < K (the superseding run's own triples must
    survive)."""
    import pyarrow.dataset as pads
    import ray

    troot = os.path.join(store_dir, "triples")
    match = pads.field("src").isin(urls)
    affected = []
    for part in _runs(troot):
        if before_run is not None and int(
                os.path.basename(part).split("=")[1]) >= before_run:
            continue
        files = [os.path.join(part, f) for f in sorted(os.listdir(part))
                 if f.endswith(".parquet")]
        if files and pads.dataset(files).count_rows(filter=match) > 0:
            affected.append(part)

    def rewrite(part_dir: str) -> Dict:
        import pyarrow.dataset as pads  # noqa: F811
        import pyarrow.parquet as pq

        files = [os.path.join(part_dir, f)
                 for f in sorted(os.listdir(part_dir))
                 if f.endswith(".parquet")]
        tmp = os.path.join(os.path.dirname(part_dir),
                           ".tmp-retract-" + os.path.basename(part_dir))
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        kept = 0
        writer = None
        dsx = pads.dataset(files)
        try:
            for batch in dsx.to_batches(filter=~match):
                if batch.num_rows == 0:
                    continue
                kept += batch.num_rows
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(tmp, "part-0.parquet"), batch.schema)
                writer.write_batch(batch)
            deleted = dsx.count_rows(filter=match)
        finally:
            if writer is not None:
                writer.close()
        doc = {}
        mp = os.path.join(part_dir, MANIFEST)
        if os.path.exists(mp):
            with open(mp) as fh:
                doc = json.load(fh)
        doc["triples_out"] = kept
        doc.setdefault("retractions", []).append(
            {"srcs_n": len(urls), "rows_deleted": deleted})
        with open(os.path.join(tmp, MANIFEST), "w") as fh:
            json.dump(doc, fh, indent=1)
        shutil.rmtree(part_dir)
        os.replace(tmp, part_dir)
        return {"partition": part_dir, "deleted": deleted}

    r = ray.remote(rewrite)
    results = ray.get([r.remote(p) for p in affected]) if affected else []
    return {"partitions_rewritten": len(results),
            "triples_deleted": sum(x["deleted"] for x in results)}


def ingest_snapshot(pages_ds, store_dir: str, *,
                    emitter_concurrency=None,
                    broadcast_limit: int = plan.BROADCAST_ROWS,
                    n_rows_hint: Optional[int] = None) -> Dict:
    """One snapshot's (url, text) pages into the store.  Returns
    counts; a no-change snapshot is a no-op (nothing written)."""
    import hashlib

    import ray

    from octoray.pipelines.kg import build_triples
    from octoray.stages.canon import dedup_triples

    from octoray import query

    os.makedirs(store_dir, exist_ok=True)
    _gc(os.path.join(store_dir, "ledger"))
    _gc(os.path.join(store_dir, "triples"))
    _gc_unpaired(store_dir)
    _gc_intents(store_dir)

    prev = ledger_state(store_dir).materialize()
    n_prev = prev.count()

    if n_prev <= broadcast_limit:
        # ---- broadcast path: ledger state rides ray.put once, every
        # page batch filters against it with zero shuffle
        prev_map: Dict[str, str] = {}
        for b in prev.iter_batches(batch_format="pyarrow"):
            prev_map.update(zip(b.column("url").to_pylist(),
                                b.column("content_md5").to_pylist()))
        ref = ray.put(prev_map)

        def changed_pages(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            urls = t.column("url").to_pylist()
            texts = t.column("text").to_pylist()
            keep, md5s = [], []
            for u, x in zip(urls, texts):
                h = hashlib.md5(x.encode("utf-8")).hexdigest()
                keep.append(m.get(u) != h)
                md5s.append(h)
            sel = pa.table({
                "url": t.column("url"),
                "text": t.column("text"),
                "content_md5": pa.array(md5s, pa.string()),
            }).filter(pa.array(keep))
            return sel

        changed = pages_ds.map_batches(
            changed_pages, batch_format="pyarrow").materialize()
        stale = [u for b in changed.iter_batches(batch_format="pyarrow")
                 for u in b.column("url").to_pylist() if u in prev_map]
    else:
        # ---- distributed path (J9 at scale): anti-join on the
        # composite (url NUL md5) key over SLIM rows — page text never
        # rides the anti-join shuffle.  The surviving key set is
        # snapshot-delta-sized; a stats-gated semi-join re-attaches
        # text (broadcast when the delta fits, merge-join otherwise).
        def add_md5(t: pa.Table) -> pa.Table:
            md5s = [hashlib.md5(x.encode("utf-8")).hexdigest()
                    for x in t.column("text").to_pylist()]
            return pa.table({
                "url": t.column("url"),
                "text": t.column("text"),
                "content_md5": pa.array(md5s, pa.string())})

        def add_ck(t: pa.Table) -> pa.Table:
            return t.append_column("_ck", pc.binary_join_element_wise(
                pc.cast(t.column("url"), pa.string()),
                pc.cast(t.column("content_md5"), pa.string()), "\x00"))

        from octoray.util import drop_empty_blocks

        ck_schema = pa.schema([("url", pa.string()),
                               ("content_md5", pa.string()),
                               ("_ck", pa.string())])
        pages_m = pages_ds.map_batches(add_md5, batch_format="pyarrow")
        slim = pages_m.map_batches(
            lambda t: add_ck(t.select(["url", "content_md5"])).cast(ck_schema),
            batch_format="pyarrow")
        ledger_ck = prev.map_batches(
            lambda t: add_ck(t).select(["_ck"]), batch_format="pyarrow")
        changed_keys = drop_empty_blocks(
            query.anti_join(slim, ledger_ck, on="_ck").materialize(),
            ck_schema)
        if changed_keys.count() == 0:
            return {"run": None, "pages_seen": None, "pages_changed": 0,
                    "triples_out": 0, "retracted": 0}
        changed = query.semi_join_auto(
            pages_m.map_batches(add_ck, batch_format="pyarrow"),
            "_ck", changed_keys, key_col="_ck",
            broadcast_limit=broadcast_limit,
        ).map_batches(lambda t: t.drop_columns(["_ck"]),
                      batch_format="pyarrow").materialize()
        # stale = changed urls that already had a ledger row (their
        # earlier triples are superseded); delta-sized by construction,
        # computed as a distributed semi-join before driver collection
        stale_ds = query.semi_join_auto(
            changed_keys.map_batches(lambda t: t.select(["url"]),
                                     batch_format="pyarrow"),
            "url", prev.map_batches(lambda t: t.select(["url"]),
                                    batch_format="pyarrow"),
            broadcast_limit=broadcast_limit)
        stale = [r["url"] for r in stale_ds.take_all()]

    n_changed = changed.count()
    report = {"run": None, "pages_seen": None, "pages_changed": n_changed,
              "triples_out": 0, "retracted": 0}
    if n_changed == 0:
        return report

    k = _next_run(store_dir)
    report["run"] = k

    # durable retraction intent BEFORE any commit: a crash anywhere
    # after this point either rolls the run back (intent dropped) or
    # replays the retraction (intent + committed run) — never loses
    # the superseded urls' old triples NOR leaves them duplicated
    if stale:
        with open(_intent_path(store_dir, k), "w") as fh:
            json.dump({"run": k, "urls": stale}, fh)

    triples = build_triples(
        changed.map_batches(
            lambda t: pa.table({"url": t.column("url"),
                                "text": t.column("text")}),
            batch_format="pyarrow"),
        extract=False, keep_src=True,
        emitter_concurrency=emitter_concurrency,
        n_rows_hint=n_rows_hint if n_rows_hint is not None else n_changed,
    )

    def with_src(t: pa.Table) -> pa.Table:
        return t.select(_TRIPLE5)

    canon = dedup_triples(
        triples.map_batches(with_src, batch_format="pyarrow"),
        extra_cols=("src",))
    tdir = _commit_run(
        os.path.join(store_dir, "triples"), k, canon,
        {"run": k, "kind": "triples", "status": "complete"})
    import glob

    import pyarrow.parquet as pq

    n_out = sum(pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(tdir, "*.parquet")))
    report["triples_out"] = n_out

    ledger_rows = changed.map_batches(
        lambda t: pa.table({
            "url": t.column("url"),
            "content_md5": t.column("content_md5"),
            "run": pa.array([k] * t.num_rows, pa.int64())}),
        batch_format="pyarrow")
    _commit_run(os.path.join(store_dir, "ledger"), k, ledger_rows,
                {"run": k, "kind": "ledger", "status": "complete"})

    # retract superseded provenance AFTER the commit (runs < K only);
    # the intent file outlives a crash in this window and is replayed
    # idempotently by the next ingest's gc
    if stale:
        report["retracted"] = _retract_srcs(
            store_dir, stale, before_run=k)["triples_deleted"]
        os.remove(_intent_path(store_dir, k))
    return report


def read_ingest_graph(store_dir: str, *, with_src: bool = False):
    """The store's current graph as a Dataset: all triple runs (the
    physical retract+append maintenance already removed superseded
    provenance).  4 triple columns, or 5 with ``with_src``.

    Read-only crash masking: if a committed run K's retraction intent
    is still pending (the commit-then-retract crash window), rows from
    runs < K whose src is in the intent are superseded and filtered
    out here — readers never see the duplicate window; the next
    ingest's gc makes the retraction physical."""
    import ray.data as rd

    from octoray.model import TRIPLE_SCHEMA
    from octoray.stages.canon import TRIPLE_COLS

    # manifest-less run dirs are crashed writes, and a triples run
    # without its paired ledger run is a torn commit — both invisible
    # here, gc'd by the next ingest (the pull.read_graph rule)
    led = {os.path.basename(d)
           for d in _runs(os.path.join(store_dir, "ledger"))
           if os.path.exists(os.path.join(d, MANIFEST))}
    run_dirs = [
        d for d in _runs(os.path.join(store_dir, "triples"))
        if os.path.exists(os.path.join(d, MANIFEST))
        and os.path.basename(d) in led
    ]
    intents = [doc for doc in _pending_intents(store_dir)
               if _run_committed(store_dir, doc["run"])]
    drop_by_dir: Dict[str, frozenset] = {}
    for d in run_dirs:
        j = int(os.path.basename(d).split("=")[1])
        urls = {u for doc in intents if doc["run"] > j for u in doc["urls"]}
        if urls:
            drop_by_dir[d] = frozenset(urls)

    clean_files = [
        os.path.join(d, f)
        for d in run_dirs if d not in drop_by_dir
        for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    cols = _TRIPLE5 if with_src else TRIPLE_COLS
    schema5 = pa.schema([(c, pa.string()) for c in _TRIPLE5])

    def norm(t: pa.Table) -> pa.Table:
        # parquet reads back large_string; downstream Arrow kernels
        # (canon key join, hash joins) want plain string
        t = t.select(cols)
        return t.cast(schema5 if with_src else TRIPLE_SCHEMA)

    parts = []
    if clean_files:
        parts.append(rd.read_parquet(clean_files).map_batches(
            norm, batch_format="pyarrow"))
    for d, drop in sorted(drop_by_dir.items()):
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.endswith(".parquet")]
        if not files:
            continue

        def masked(t: pa.Table, drop=drop) -> pa.Table:
            keep = pc.invert(pc.is_in(
                pc.cast(t.column("src"), pa.string()),
                value_set=pa.array(sorted(drop), pa.string())))
            return norm(t.filter(keep))

        parts.append(rd.read_parquet(files).map_batches(
            masked, batch_format="pyarrow"))
    if not parts:
        empty = TRIPLE_SCHEMA.empty_table()
        if with_src:
            empty = empty.append_column("src", pa.array([], pa.string()))
        return rd.from_arrow(empty)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def compact_store(store_dir: str, dst_dir: str) -> Dict:
    """Compact an ingest store: N ledger/triples run pairs -> ONE pair
    in a fresh store at ``dst_dir`` (the run-count growth bound — a
    long-lived recurring ingest otherwise accumulates a dir per
    snapshot and every read fans over all of them).

    Semantics preserved exactly:
      * triples: the current graph with provenance, re-canonicalized
        (src-leading dedup sort) into run=0000
      * ledger: the collapsed (url, content_md5) state, all rows
        re-stamped run=0 — recency collapses to a no-op and change
        detection behaves identically afterwards
    The destination is built complete and self-consistent; swap it in
    (or point readers at it) only after this returns."""
    import pyarrow.parquet as pq

    from octoray.stages.canon import dedup_triples

    if os.path.abspath(dst_dir) == os.path.abspath(store_dir):
        raise ValueError("compact_store writes a FRESH store; dst == src")
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(dst_dir, exist_ok=True)

    triples = dedup_triples(
        read_ingest_graph(store_dir, with_src=True), extra_cols=("src",))
    tdir = _commit_run(os.path.join(dst_dir, "triples"), 0, triples,
                       {"run": 0, "kind": "triples", "status": "complete",
                        "compacted_from": store_dir})

    def restamp(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("url"),
            "content_md5": t.column("content_md5"),
            "run": pa.array([0] * t.num_rows, pa.int64()),
        })

    led = ledger_state(store_dir).map_batches(restamp, batch_format="pyarrow")
    _commit_run(os.path.join(dst_dir, "ledger"), 0, led,
                {"run": 0, "kind": "ledger", "status": "complete",
                 "compacted_from": store_dir})

    import glob

    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(tdir, "*.parquet")))
    return {"dst": dst_dir, "triples": n}
