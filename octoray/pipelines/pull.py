"""The incremental KG-build orchestrator (reference `octofludb pull`,
ui.py:368-433 / SURVEY.md §3.2).

A pull is: base build (sharded, resumable) followed by FIXPOINT
derived-attribute steps.  Each step queries the current graph for
entities MISSING the derived attribute (anti-join, the NOT-EXISTS
family J8 — fetch-unclassified-swine.rq:8-12, subtypes.rq:18-21),
computes only those, and lands the new triples in a per-step derived
partition with a manifest.  Re-running any step is a no-op once the
pending set is empty — the reference's skip-if-ttl-exists cache
(ui.py:756-758) and idempotent uploads (README.md:94-96) combined.

Steps shipped (each one stage of the reference's pull sequence):
  quarters   strains with f:date but no f:collection_q -> derive the
             calendar quarter (F9, recipes.py:261-272)
  located    subjects with f:state/f:country but no f:locatedIn ->
             geography expansion (rules.expand_locations)
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List

import pyarrow as pa
import pyarrow.compute as pc

from octoray.functions.dates import quarter_from_date
from octoray.model import DT_PLAIN, triples_to_table
from octoray.pipelines.kg import read_kg, run_kg_build
from octoray.query import anti_join, values_of
from octoray.stages.canon import canonicalize
from octoray.state import manifest as mf


def _subjects_with(triples, predicate: str):
    """Distinct subjects bearing ``predicate`` (small projection)."""

    def f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("predicate"), pa.scalar(predicate)))
        return pa.table({"subject": sel.column("subject")})

    return triples.map_batches(f, batch_format="pyarrow").groupby("subject").count() \
        .select_columns(["subject"])


def _derive_quarters(pending_triples):
    """(subject, f:date value) -> (subject, f:collection_q, quarter)."""

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for s, d in zip(t.column("subject").to_pylist(), t.column("value").to_pylist()):
            q = quarter_from_date(d)
            if q:
                rows.append((s, "f:collection_q", q, DT_PLAIN))
        return triples_to_table(rows)

    return pending_triples.map_batches(f, batch_format="pyarrow")


def step_quarters(graph):
    """Pending = has f:date, lacks f:collection_q (anti-join J8)."""
    dates = values_of(graph, "f:date")
    have = _subjects_with(graph, "f:collection_q")
    pending = anti_join(dates, have, on="subject")
    return _derive_quarters(pending)


def step_located(graph):
    """Pending = has f:state/f:country, lacks f:locatedIn; derived =
    the locatedIn expansion for just those subjects."""
    from octoray.stages.rules import expand_locations

    def geo_rows(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t.column("predicate"),
                     value_set=pa.array(["f:state", "f:country"], pa.string()))
        )

    geo = graph.map_batches(geo_rows, batch_format="pyarrow")
    have = _subjects_with(graph, "f:locatedIn")
    pending = anti_join(geo, have, on="subject")
    expanded = expand_locations(pending)

    def only_derived(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("predicate"), pa.scalar("f:locatedIn")))

    return expanded.map_batches(only_derived, batch_format="pyarrow")


STEPS: Dict[str, Callable] = {
    "quarters": step_quarters,
    "located": step_located,
}


def _derived_dir(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "derived", f"step={name}")


def read_graph(out_dir: str):
    """Base shards + every completed derived step as one Dataset."""
    import ray.data as rd

    dirs = [os.path.join(out_dir, d) for d in sorted(os.listdir(out_dir))
            if d.startswith("shard=")]
    droot = os.path.join(out_dir, "derived")
    if os.path.isdir(droot):
        dirs.extend(os.path.join(droot, d) for d in sorted(os.listdir(droot)))
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    # the hive-style shard=K path segments would otherwise be inferred
    # as an extra partition column on the triple schema; parquet also
    # reads back large_string, which Arrow hash joins refuse to match
    # against the plain string the in-memory stages emit
    from octoray.model import TRIPLE_SCHEMA
    from octoray.stages.canon import TRIPLE_COLS

    def norm(t: pa.Table) -> pa.Table:
        return t.select(TRIPLE_COLS).cast(TRIPLE_SCHEMA)

    return rd.read_parquet(files).map_batches(norm, batch_format="pyarrow")


def pull(n_pages: int, out_dir: str, *, seed: int = 42, n_shards: int = 4,
         steps: List[str] = ("quarters", "located"), resume: bool = True,
         emitter_concurrency=None, max_concurrent_shards: int = 1) -> dict:
    """Full incremental build: base KG (resumable shards) then each
    derived step at its fixpoint.  Returns per-step row counts; zero
    everywhere on a re-run."""
    base = run_kg_build(n_pages, out_dir, seed=seed, n_shards=n_shards,
                        resume=resume, emitter_concurrency=emitter_concurrency,
                        max_concurrent_shards=max_concurrent_shards)
    report = {"base": base, "steps": {}}
    for name in steps:
        graph = read_graph(out_dir)
        derived = canonicalize(STEPS[name](graph)).materialize()
        ddir = _derived_dir(out_dir, name)
        # same crash-safety as run_kg_build: clear any partial output
        # from a previous interrupted run before re-writing the step
        if os.path.isdir(ddir):
            import shutil

            shutil.rmtree(ddir)
        os.makedirs(ddir, exist_ok=True)
        n = derived.count()
        if n > 0:
            derived.write_parquet(ddir)
        # per-step lineage manifest (same contract as base shards):
        # inputs = the graph state the step's anti-join saw
        with open(os.path.join(ddir, "_MANIFEST.json"), "w") as fh:
            import json

            json.dump({"step": name, "inputs": ["graph@" + out_dir],
                       "triples_out": n}, fh)
        report["steps"][name] = n
    return report
