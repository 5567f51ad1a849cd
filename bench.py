"""Benchmark harness (driver contract + local feedback loop).

  python bench.py              # full suite over $GRAFT_SF_DIR -> ONE json line
  python bench.py --headline   # flagship KG build only -> one json line
  python bench.py --scaling    # headline at 8 and 32 cpus in FRESH processes,
                               # reports throughput at both + scaling efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries from the driver contract that form the bench suite (each must
# finish in seconds at sf0.1; jaccard_pairs is excluded until its pair
# expansion is join-based)
SUITE = [
    "kg_build",
    "pricing_summary",
    "orders_per_nation",
    "building_priority",
    "monthly_rollup",
    "session_stats",
    "token_counts",
    "quality_scores",
    "lang_id",
    "fingerprints",
    "exact_dups",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "knn_brute",
    "cosine_dup_pairs",
]


def _sf() -> float:
    import re

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else 0.1


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def _consume(res) -> int:
    """Materialize a result enough to count rows (stream, don't collect)."""
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    return len(res)


def run_headline() -> dict:
    """Flagship: synthetic crawl -> KG triples (scan/emit/canonicalize)."""
    from octoray.pipelines.kg import synth_kg

    n_pages = max(200, int(200_000 * _sf()))
    _init_ray()
    t0 = time.time()
    n_triples = synth_kg(n_pages).count()
    dt = time.time() - t0
    return {
        "metric": "kg_build_wall",
        "value": round(dt, 3),
        "unit": "sec",
        "n_pages": n_pages,
        "n_triples": n_triples,
        "pages_per_sec": round(n_pages / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
        "sf": _sf(),
        "num_cpus": NUM_CPUS,
    }


def run_suite() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    _init_ray()
    qs = E.queries()
    times: dict[str, float] = {}
    total = 0.0
    for name in SUITE:
        t0 = time.time()
        _consume(qs[name](SF_DIR))
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
    return {
        "metric": "suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf(),
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    """Same headline job at 8 and 32 CPUs in fresh processes (the
    in-sandbox evidence for the north rule's N vs 4N criterion)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["pages_per_sec"]
    thr32 = results[32]["pages_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "pages_per_sec_8cpu": thr8,
        "pages_per_sec_32cpu": thr32,
        "wall_8cpu": results[8]["value"],
        "wall_32cpu": results[32]["value"],
        "sf": _sf(),
        "num_cpus": [8, 32],
    }


def main() -> None:
    if "--scaling" in sys.argv:
        res = run_scaling()
    elif "--headline" in sys.argv:
        res = run_headline()
    else:
        res = run_suite()
    print(json.dumps(res))


if __name__ == "__main__":
    try:
        main()
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()
