"""P/R gate: pipeline triples vs the reference-semantics truth emitter.

The north rule requires P/R >= 0.95 on emitted (s, p, o) triples vs the
reference emitter.  ``truth_triples(pid)`` replays the reference's
Datum-cast ragged Phrase semantics (classes.py:300-316 + Phrase.connect)
per page; the pipeline must recover exactly the union of those sets
from raw page text via the mention scanner.

Usage: python scripts/pr_gate.py [n_pages]
Prints one JSON line: {"precision": .., "recall": .., "n_pages": ..}.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from octoray.pipelines.kg import synth_kg
    from octoray.sources.webtext import truth_triples

    got = {
        (r["subject"], r["predicate"], r["object"], r["object_datatype"])
        for r in synth_kg(n_pages).take_all()
    }
    want = set()
    for pid in range(n_pages):
        want |= truth_triples(pid)

    tp = len(got & want)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(want) if want else 1.0
    print(json.dumps({
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "n_pipeline": len(got),
        "n_truth": len(want),
        "n_pages": n_pages,
        "gate": "P/R >= 0.95",
        "pass": precision >= 0.95 and recall >= 0.95,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
