"""Per-operator ds.stats() profile of the headline KG build.

Answers VERDICT r1's open question ("back the 16->32 plateau claim with
per-operator ds.stats() at 32 CPUs"): runs the flagship pages->triples
pipeline in a FRESH Ray session at each requested CPU count and prints,
per operator, wall-clock span, summed task CPU time, and the implied
parallelism (cpu_time / wall) — if an operator's implied parallelism
tracks the CPU count, the pipeline scales and any plateau is the host;
if it saturates below the CPU count, that operator is the bottleneck.

Usage:
    python scripts/profile_stats.py [n_pages] [cpus ...]
defaults: 400000 pages, cpus 16 32.  Each CPU count runs in a
subprocess so sessions never share state.  Writes nothing outside /tmp.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

CHILD = r"""
import json, re, sys, time
import ray
n_pages, cpus = int(sys.argv[1]), int(sys.argv[2])
ray.init(address="local", num_cpus=cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from octoray.pipelines import kg
import shutil
out = f"/tmp/profile_kg_{cpus}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
ds = kg.synth_kg(n_pages)
ds.write_parquet(out)
wall = time.time() - t0
stats = ds.stats()
ray.shutdown()
# parse the per-operator summary lines out of the stats blob
ops = []
cur = None
for line in stats.splitlines():
    m = re.match(r"Operator (\d+) (.+?): .*\bin ([0-9.]+)s\s*$", line)
    if m:
        cur = {"op": m.group(2), "wall_s": float(m.group(3))}
        ops.append(cur)
        continue
    if cur is None:
        continue
    m = re.search(r"Remote wall time:.*?([0-9.]+(?:ms|s|us)) total", line)
    if m:
        v = m.group(1)
        mult = 1.0
        if v.endswith("ms"): v, mult = v[:-2], 1e-3
        elif v.endswith("us"): v, mult = v[:-2], 1e-6
        elif v.endswith("s"): v = v[:-1]
        # sum across Sort's suboperators (SortMap + SortReduce)
        cur["task_wall_total_s"] = (
            cur.get("task_wall_total_s", 0.0) + float(v) * mult)
print("@@RESULT@@" + json.dumps({
    "cpus": cpus, "n_pages": n_pages, "wall_s": round(wall, 2),
    "pages_per_s": round(n_pages / wall),
    "operators": [
        {**o, "implied_parallelism":
            round(o.get("task_wall_total_s", 0) / o["wall_s"], 1)
            if o["wall_s"] else None}
        for o in ops
    ],
}))
print(stats, file=sys.stderr)
"""


def run(n_pages: int, cpus: int) -> dict:
    env = dict(os.environ, PYTHONPATH="/root/repo")
    p = subprocess.run(
        [sys.executable, "-u", "-c", CHILD, str(n_pages), str(cpus)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(f"profile child failed at cpus={cpus}")
    for line in p.stdout.splitlines():
        if line.startswith("@@RESULT@@"):
            res = json.loads(line[len("@@RESULT@@"):])
            res["raw_stats_tail"] = p.stderr[-6000:]
            return res
    raise SystemExit("no result line from child")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpu_list = [int(c) for c in sys.argv[2:]] or [16, 32]
    results = [run(n_pages, c) for c in cpu_list]
    for r in results:
        print(f"\n=== {r['cpus']} CPUs: {r['n_pages']} pages in "
              f"{r['wall_s']}s ({r['pages_per_s']} pages/s) ===")
        for o in r["operators"]:
            tw = o.get("task_wall_total_s")
            print(f"  {o['op'][:72]:74s} wall {o['wall_s']:7.2f}s"
                  + (f"  task-cpu {tw:8.2f}s  implied-par "
                     f"{o['implied_parallelism']}" if tw else ""))
    if len(results) >= 2:
        a, b = results[0], results[-1]
        eff = (b["pages_per_s"] / a["pages_per_s"]) / (b["cpus"] / a["cpus"])
        print(f"\nscaling {a['cpus']}->{b['cpus']}: "
              f"{a['pages_per_s']} -> {b['pages_per_s']} pages/s, "
              f"efficiency {eff:.2f}")
    with open("/tmp/profile_stats.json", "w") as f:
        json.dump([{k: v for k, v in r.items() if k != "raw_stats_tail"}
                   for r in results], f, indent=1)
    print("full per-CPU JSON: /tmp/profile_stats.json "
          "(raw ds.stats() on each child's stderr)")


if __name__ == "__main__":
    main()
