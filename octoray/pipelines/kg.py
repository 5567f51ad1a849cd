"""End-to-end KG construction pipeline (the flagship).

Ray shape (SURVEY.md §3.1):

    pages (url, warc_ts, html, text, lang)
      -> map_batches(extract_text)          stateless, Arrow zero-copy
      -> map_batches(MentionEmitter, ...)   actor pool (lexicons in __init__)
      -> local dedup combiner               per-batch Arrow group_by
      -> groupby(s,p,o,dt)                  the dedup shuffle (D1)
      -> sort(s,p,o,dt)                     deterministic golden order
      -> write_parquet per shard            + lineage manifest (resume)

The whole thing streams: no driver-side row loops, no mid-pipeline
materialization.  Replaces the reference's single-process prep path
(ui.py:903-929) and its in-RAM rdflib graph (ui.py:20-39, X5).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

from octoray.sources.webtext import pages_batch, pages_dataset
from octoray.stages.canon import TRIPLE_COLS, canonicalize, dedup_triples
from octoray.stages.extract import extract_text_batch
from octoray.stages.scan import MentionEmitter


def build_triples(
    pages_ds,
    *,
    emitter_concurrency=None,
    batch_size: int = 4096,
    keep_src: bool = False,
    extract: bool = True,
    n_rows_hint: Optional[int] = None,
):
    """pages Dataset -> raw (pre-dedup) triples Dataset.

    ``extract=False`` skips the html->text stage for inputs that carry
    text directly (e.g. a documents table adapted via docs_as_pages).
    ``n_rows_hint`` (expected page count) caps the actor pool at the
    number of batches the job actually has."""
    ds = pages_ds
    if extract:
        ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    if emitter_concurrency is None:
        # FIXED actor pool sized cpus-2.  Profiling at 32 CPUs
        # (scripts/profile_stats.py) showed every autoscaling variant —
        # floor 8, even floor 24, ceiling 30 — holds the emitter at
        # implied parallelism ~7-9 for the whole run (the pool never
        # ramps under streaming backpressure), 27k pages/s; a fixed
        # (30,30) pool hits 39k.  Everything upstream of the emitter is
        # fused into the actor stage, so reserving more than 2 CPUs for
        # "upstream reads" just idles them.  A pool larger than the
        # job's batch count only pays startup (measured 4x on a
        # 20k-page query), so the hint caps it; tiny runs without a
        # hint should pass emitter_concurrency=2 explicitly.
        import ray

        n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        emitter_concurrency = max(2, n - 2)
        if n_rows_hint is not None:
            n_batches = -(-int(n_rows_hint) // batch_size)
            emitter_concurrency = max(2, min(emitter_concurrency, n_batches))
    ds = ds.map_batches(
        MentionEmitter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=emitter_concurrency,
    )
    if not keep_src:
        ds = ds.select_columns(TRIPLE_COLS)
    return ds


def docs_as_pages(docs_ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Adapt a documents-style table to the (url, text) contract the
    mention scanner reads — the 'any delimited document' generalization
    of the reference's FASTA/TSV readers (SURVEY.md §1.3)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pc.cast(t.column(id_col), pa.string()),
                "text": t.column(text_col),
            }
        )

    return docs_ds.map_batches(f, batch_format="pyarrow")


def kg_from_pages(pages_ds, *, emitter_concurrency=None, local_only: bool = False,
                  extract: bool = True, n_rows_hint: Optional[int] = None):
    """pages -> canonical sorted+deduped triple Dataset."""
    triples = build_triples(pages_ds, emitter_concurrency=emitter_concurrency,
                            extract=extract, n_rows_hint=n_rows_hint)
    return canonicalize(triples, local_only=local_only)


def synth_kg(n_pages: int, seed: int = 42, **kwargs):
    """Synthesized pages -> canonical triples (test/bench entry)."""
    kwargs.setdefault("n_rows_hint", n_pages)
    return kg_from_pages(pages_dataset(n_pages, seed=seed), **kwargs)


def run_kg_build(
    n_pages: int,
    out_dir: str,
    *,
    seed: int = 42,
    n_shards: int = 8,
    emitter_concurrency=None,
    resume: bool = True,
    max_concurrent_shards: int = 1,  # obsolete, kept for API compat
) -> dict:
    """Sharded, resumable KG build over the synthetic crawl.

    Each shard covers a contiguous page-id range and lands in
    ``shard=K/`` with a lineage manifest — the scale analogue of the
    reference's per-month ttl cache (ui.py:756-758).  Dedup within a
    shard is exact; the optional ``compact`` pass gives global
    exactness.

    ALL pending shards are built in ONE streaming pipeline (VERDICT r1
    pipeline audit: sequential per-shard executions left the cluster
    idle between shards; concurrent driver-thread pipelines stalled on
    this Ray version).  The shard id becomes a column derived from the
    page id, rides the canonicalization sort as the LEADING key (one
    all-to-all gives per-shard-exact dedup in canonical order), and a
    hive-partitioned ``write_parquet(partition_cols=["shard"])`` lands
    every shard dir in the same pass.  Resume granularity is
    unchanged: manifests are written per shard AFTER the write, so a
    crash re-runs exactly the manifest-less shards.
    """
    import numpy as np

    from octoray.state import manifest as mf

    os.makedirs(out_dir, exist_ok=True)
    per = (n_pages + n_shards - 1) // n_shards
    shard_ids = [f"{k:05d}" for k in range(n_shards)]
    todo = mf.pending_shards(out_dir, shard_ids) if resume else shard_ids

    done: List[str] = []
    spans = []
    for sid in todo:
        k = int(sid)
        lo, hi = k * per, min((k + 1) * per, n_pages)
        if lo >= hi:
            mf.write_manifest(out_dir, sid, inputs=[], rows_in=0, triples_out=0)
            continue
        spans.append((sid, lo, hi))

    if spans:
        import shutil

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data as rd

        from octoray.sources.webtext import URL_PREFIX
        from octoray.stages.canon import dedup_triples

        # crash-safe resume: stale partial parquet from a died write
        # has execution-unique filenames, so clear pending dirs first —
        # a manifest always describes exactly one write's output
        for sid, _, _ in spans:
            d = mf.shard_dir(out_dir, sid)
            if os.path.isdir(d):
                shutil.rmtree(d)

        starts = np.cumsum([0] + [hi - lo for _, lo, hi in spans])
        lows = np.array([lo for _, lo, _ in spans], dtype=np.int64)
        total = int(starts[-1])

        def to_pages(b):
            idx = b["id"].astype(np.int64)
            span_i = np.searchsorted(starts, idx, side="right") - 1
            return pages_batch(idx - starts[span_i] + lows[span_i], seed=seed)

        pages = rd.range(total).map_batches(
            to_pages, batch_format="numpy", batch_size=4096
        )
        triples = build_triples(
            pages, emitter_concurrency=emitter_concurrency, keep_src=True,
            n_rows_hint=total,
        )

        def add_shard(t):
            # page id is the url's fixed-width 12-digit tail (URL_PREFIX
            # contract) — recovers the shard without threading an extra
            # column through the emitter
            pid = pc.cast(
                pc.utf8_slice_codeunits(
                    t.column("src"), len(URL_PREFIX), len(URL_PREFIX) + 12
                ),
                pa.int64(),
            )
            shard = pc.utf8_lpad(pc.cast(pc.divide(pid, per), pa.string()), 5, "0")
            return t.select(TRIPLE_COLS).append_column("shard", shard)

        keyed = triples.map_batches(add_shard, batch_format="pyarrow")
        deduped = dedup_triples(keyed, extra_cols=("shard",))
        t0 = time.monotonic()
        deduped.write_parquet(out_dir, partition_cols=["shard"])
        wall_s = round(time.monotonic() - t0, 3)

        for sid, lo, hi in spans:
            d = mf.shard_dir(out_dir, sid)
            n_out, n_bytes = 0, 0
            if os.path.isdir(d):
                for f in os.listdir(d):
                    if f.endswith(".parquet"):
                        p = os.path.join(d, f)
                        n_out += pq.ParquetFile(p).metadata.num_rows
                        n_bytes += os.path.getsize(p)
            mf.write_manifest(
                out_dir,
                sid,
                inputs=[f"synth:pages[{lo}:{hi}]"],
                rows_in=hi - lo,
                triples_out=n_out,
                # per-partition metrics (north rule: lineage + metrics):
                # bytes landed, this build pass's wall clock and
                # aggregate throughput (the pass builds every pending
                # shard in ONE streaming pipeline, so per-shard wall is
                # the shared pass wall)
                extra={
                    "bytes_out": n_bytes,
                    "build_wall_s": wall_s,
                    "build_pages": total,
                    "build_pages_per_s": round(total / wall_s, 1)
                    if wall_s > 0 else None,
                },
            )
            done.append(sid)

    return {
        "out_dir": out_dir,
        "shards": len(shard_ids),
        "built": done,
        "skipped": [s for s in shard_ids if s not in done],
        "manifests": mf.read_all(out_dir),
    }


def read_kg(out_dir: str):
    """Read a built KG (all shards + derived steps) as one normalized
    triple Dataset: parquet files only (manifests skipped), hive
    partition column pruned, large_string cast back to the in-memory
    schema (see pull.read_graph for the join-compat rationale)."""
    import glob

    import pyarrow as pa
    import ray.data as rd

    from octoray.model import TRIPLE_SCHEMA

    files = sorted(
        f for f in glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
    )

    def norm(t: "pa.Table") -> "pa.Table":
        return t.select(TRIPLE_COLS).cast(TRIPLE_SCHEMA)

    return rd.read_parquet(files if files else out_dir).map_batches(
        norm, batch_format="pyarrow"
    )


def compact(out_dir: str, compact_dir: str):
    """Global exact dedup + sort across shards (idempotent-upload
    semantics of K4 at the whole-graph level)."""
    ds = canonicalize(read_kg(out_dir))
    ds.write_parquet(compact_dir)
    return compact_dir
