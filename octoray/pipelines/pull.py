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
from octoray.query import semi_join_auto, values_of
from octoray.stages.canon import canonicalize
from octoray.state import manifest as mf

from octoray import plan


def _subjects_with(triples, predicate: str):
    """Subjects bearing ``predicate`` (projection only — NOT distinct:
    the consumer is semi_join_auto, which runs the one distinct)."""

    def f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("predicate"), pa.scalar(predicate)))
        return pa.table({"subject": sel.column("subject")})

    return triples.map_batches(f, batch_format="pyarrow")


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


def _anti_have(pending, have_keys, graph, derived_pred: str):
    """Anti-join ``pending`` against the step's have-set: a precomputed
    broadcast frozenset when the fused path supplies one (ONE combined
    planning scan for all steps), else the stats-gated switch over a
    fresh projection of the graph."""
    from octoray.query import broadcast_anti_join

    if have_keys is not None:
        return broadcast_anti_join(pending, "subject", have_keys)
    return semi_join_auto(
        pending, "subject", _subjects_with(graph, derived_pred), anti=True
    )


def step_quarters(graph, have_keys=None):
    """Pending = has f:date, lacks f:collection_q (anti-join J8,
    via the stats-gated broadcast switch — derived-subject sets are
    broadcast when small, hash-joined when not)."""
    dates = values_of(graph, "f:date")
    pending = _anti_have(dates, have_keys, graph, "f:collection_q")
    return _derive_quarters(pending)


def step_located(graph, have_keys=None):
    """Pending = has f:state/f:country, lacks f:locatedIn; derived =
    the locatedIn expansion for just those subjects."""
    from octoray.stages.rules import expand_locations

    def geo_rows(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t.column("predicate"),
                     value_set=pa.array(["f:state", "f:country"], pa.string()))
        )

    geo = graph.map_batches(geo_rows, batch_format="pyarrow")
    pending = _anti_have(geo, have_keys, graph, "f:locatedIn")
    expanded = expand_locations(pending)

    def only_derived(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("predicate"), pa.scalar("f:locatedIn")))

    return expanded.map_batches(only_derived, batch_format="pyarrow")


STEPS: Dict[str, Callable] = {
    "quarters": step_quarters,
    "located": step_located,
}

# Predicates each step CONSUMES from the graph and the predicate it
# DERIVES.  Fusing steps into one execution is valid iff no fused step
# consumes another fused step's derived predicate (self-consumption --
# a step's own anti-join against its previous runs -- is fine: the
# shared graph read already includes every completed run).  A plugin
# step missing from these tables is treated as depending on everything
# and forces the sequential path.
STEP_CONSUMES: Dict[str, set] = {
    "quarters": {"f:date", "f:collection_q"},
    "located": {"f:state", "f:country", "f:locatedIn"},
}
STEP_DERIVES: Dict[str, str] = {
    "quarters": "f:collection_q",
    "located": "f:locatedIn",
}


def _fusable(names: List[str]) -> bool:
    if any(n not in STEP_CONSUMES or n not in STEP_DERIVES for n in names):
        return False
    return all(
        STEP_DERIVES[b] not in STEP_CONSUMES[a]
        for a in names
        for b in names
        if a != b
    )


def _derived_dir(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "derived", f"step={name}")


def _step_run_dirs(ddir: str) -> List[str]:
    """Completed + in-flight run partitions of one derived step."""
    if not os.path.isdir(ddir):
        return []
    return [os.path.join(ddir, d) for d in sorted(os.listdir(ddir))
            if d.startswith("run=")]


def read_graph(out_dir: str):
    """Base shards + every completed derived run as one Dataset.

    Derived steps are APPEND-ONLY run partitions
    (derived/step=N/run=K/): each pull that finds pending entities
    lands their new triples in a fresh run dir with its own manifest.
    A run dir without a manifest is a crashed write — skipped here and
    garbage-collected by the next pull.  (Round-1 overwrote the step
    dir per pull, which silently DELETED all derived triples once the
    step hit its fixpoint and produced an empty batch.)"""
    import ray.data as rd

    dirs = [os.path.join(out_dir, d) for d in sorted(os.listdir(out_dir))
            if d.startswith("shard=")]
    droot = os.path.join(out_dir, "derived")
    if os.path.isdir(droot):
        for step in sorted(os.listdir(droot)):
            for rdir in _step_run_dirs(os.path.join(droot, step)):
                if os.path.exists(os.path.join(rdir, "_MANIFEST.json")):
                    dirs.append(rdir)
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        from octoray.model import TRIPLE_SCHEMA

        return rd.from_arrow(TRIPLE_SCHEMA.empty_table())
    # the hive-style shard=K path segments would otherwise be inferred
    # as an extra partition column on the triple schema; parquet also
    # reads back large_string, which Arrow hash joins refuse to match
    # against the plain string the in-memory stages emit
    from octoray.model import TRIPLE_SCHEMA
    from octoray.stages.canon import TRIPLE_COLS

    def norm(t: pa.Table) -> pa.Table:
        return t.select(TRIPLE_COLS).cast(TRIPLE_SCHEMA)

    return rd.read_parquet(files).map_batches(norm, batch_format="pyarrow")


def _gc_crashed_runs(out_dir: str, names: List[str]) -> None:
    """gc crashed writes: a run dir without a manifest never became
    visible to read_graph, so dropping it is safe and keeps the
    numbering dense.  Leftover fused tmp roots are equally invisible."""
    import shutil

    for name in names:
        ddir = _derived_dir(out_dir, name)
        for rdir in _step_run_dirs(ddir):
            if not os.path.exists(os.path.join(rdir, "_MANIFEST.json")):
                shutil.rmtree(rdir)
    shutil.rmtree(os.path.join(out_dir, "derived", ".fused_tmp"),
                  ignore_errors=True)


def _commit_run(out_dir: str, name: str, src_dir: str, n: int) -> None:
    """Append ``src_dir`` as the step's next run partition atomically:
    manifest is written INTO the dir first, one rename makes it
    visible — a crash at any point leaves either an invisible tmp dir
    or a manifest-less run dir, both gc'd by the next pull."""
    import json

    ddir = _derived_dir(out_dir, name)
    os.makedirs(ddir, exist_ok=True)
    k = len(_step_run_dirs(ddir))
    with open(os.path.join(src_dir, "_MANIFEST.json"), "w") as fh:
        json.dump({"step": name, "run": k, "inputs": ["graph@" + out_dir],
                   "triples_out": n, "status": "complete"}, fh)
    os.replace(src_dir, os.path.join(ddir, f"run={k:04d}"))


def _run_steps_fused(out_dir: str, names: List[str]) -> Dict[str, int]:
    """ALL pending derived steps in ONE streaming execution (round-2
    residual: per-step canonicalize+materialize+write made kg_pull
    per-execution-overhead-bound at toy scale).  Each step's triples
    get a leading ``step`` tag; one union rides one dedup sort
    (extra_cols=("step",), exactly the sharded-build trick) and one
    hive-partitioned write lands every step dir; per-step rows come
    from parquet metadata.  Valid because _fusable() proved no step
    reads another fused step's derived predicate."""
    import shutil

    import pyarrow.parquet as pq

    from octoray.stages.canon import dedup_triples

    from octoray.query import distinct_values

    graph = read_graph(out_dir)

    # ONE planning scan computes every step's have-set: distinct
    # (predicate, subject) restricted to the steps' derived predicates.
    # Broadcast per-step frozensets when the combined set fits (the
    # usual case: one row per already-derived entity), else fall back
    # to per-step stats-gated anti-joins.
    derive_preds = sorted({STEP_DERIVES[n] for n in names})

    def derived_rows(t: pa.Table) -> pa.Table:
        sel = t.filter(
            pc.is_in(t.column("predicate"),
                     value_set=pa.array(derive_preds, pa.string()))
        )
        return pa.table(
            {"predicate": sel.column("predicate"), "subject": sel.column("subject")}
        )

    hv = distinct_values(
        graph.map_batches(derived_rows, batch_format="pyarrow"),
        ["predicate", "subject"],
    ).materialize()
    have_sets: Dict[str, frozenset] = None
    if hv.count() <= plan.BROADCAST_ROWS:
        by_pred: Dict[str, set] = {p: set() for p in derive_preds}
        for b in hv.iter_batches(batch_format="pyarrow"):
            for p, s in zip(b.column("predicate").to_pylist(),
                            b.column("subject").to_pylist()):
                by_pred[p].add(s)
        have_sets = {n: frozenset(by_pred[STEP_DERIVES[n]]) for n in names}

    tagged = []
    for name in names:
        def tag(t: pa.Table, name=name) -> pa.Table:
            return t.append_column(
                "step", pa.array([name] * t.num_rows, pa.string())
            )

        step_ds = STEPS[name](
            graph, have_keys=None if have_sets is None else have_sets[name]
        )
        tagged.append(step_ds.map_batches(tag, batch_format="pyarrow"))
    union = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]
    derived = dedup_triples(union, extra_cols=("step",))

    tmp = os.path.join(out_dir, "derived", ".fused_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    derived.write_parquet(tmp, partition_cols=["step"])

    report: Dict[str, int] = {}
    for name in names:
        sdir = os.path.join(tmp, f"step={name}")
        n = 0
        if os.path.isdir(sdir):
            n = sum(
                pq.ParquetFile(os.path.join(sdir, f)).metadata.num_rows
                for f in os.listdir(sdir)
                if f.endswith(".parquet")
            )
        if n > 0:
            _commit_run(out_dir, name, sdir, n)
        report[name] = n
    shutil.rmtree(tmp, ignore_errors=True)
    return report


def pull(n_pages: int, out_dir: str, *, seed: int = 42, n_shards: int = 4,
         steps: List[str] = ("quarters", "located"), resume: bool = True,
         emitter_concurrency=None, max_concurrent_shards: int = 1,
         refresh: List[str] = (), fused: bool = True) -> dict:
    """Full incremental build: base KG (resumable shards) then each
    derived step at its fixpoint.  Returns per-step row counts; zero
    everywhere on a re-run.

    ``refresh`` names derived steps to RETRACT first (partition drop,
    update.retract_step) so they recompute from the current graph —
    the reference's delete-then-recompute update cycle
    (ui.py:544-560): after a classifier or rule change the anti-join
    alone would keep stale derivations forever.

    ``fused`` (default) runs every mutually-independent step in a
    single canonicalize+write execution (see _run_steps_fused); steps
    whose declared dependencies overlap — or plugin steps without
    declarations — fall back to the sequential per-step path."""
    from octoray.pipelines.update import retract_step

    for name in refresh:
        retract_step(out_dir, name)
    base = run_kg_build(n_pages, out_dir, seed=seed, n_shards=n_shards,
                        resume=resume, emitter_concurrency=emitter_concurrency,
                        max_concurrent_shards=max_concurrent_shards)
    report = {"base": base, "steps": {}}
    names = list(steps)
    _gc_crashed_runs(out_dir, names)
    if fused and len(names) > 1 and _fusable(names):
        report["steps"] = _run_steps_fused(out_dir, names)
        return report
    for name in names:
        graph = read_graph(out_dir)
        derived = canonicalize(STEPS[name](graph)).materialize()
        n = derived.count()
        if n > 0:
            import shutil

            ddir = _derived_dir(out_dir, name)
            tmp = os.path.join(ddir, "_run.tmp")
            shutil.rmtree(tmp, ignore_errors=True)
            derived.write_parquet(tmp)
            _commit_run(out_dir, name, tmp, n)
        report["steps"][name] = n
    return report
