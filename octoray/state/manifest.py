"""Per-partition lineage manifests + resumable checkpoints.

Generalizes the reference's skip-if-ttl-exists build cache
(ui.py:174-178, 756-758) and its fixpoint anti-join steps (§3.2):
each input shard's output lands in its own directory with a JSON
manifest recording input -> output lineage and row counts; a re-run
anti-joins the shard list against completed manifests (J9) and only
processes what's missing.  A crashed run leaves no manifest for the
in-flight shard, so resume re-does exactly that shard (output dirs are
overwritten deterministically — same idempotency contract as the
reference's duplicate-ignoring GraphDB upload, README.md:94-96).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, List, Optional


def manifest_path(out_dir: str, shard_id: str) -> str:
    return os.path.join(out_dir, f"shard={shard_id}", "_MANIFEST.json")


def shard_dir(out_dir: str, shard_id: str) -> str:
    return os.path.join(out_dir, f"shard={shard_id}")


def is_complete(out_dir: str, shard_id: str) -> bool:
    p = manifest_path(out_dir, shard_id)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as fh:
            return json.load(fh).get("status") == "complete"
    except (json.JSONDecodeError, OSError):
        return False


def write_manifest(
    out_dir: str,
    shard_id: str,
    *,
    inputs: List[str],
    rows_in: int,
    triples_out: int,
    extra: Optional[Dict] = None,
) -> str:
    """Atomic write (tmp + rename) AFTER the shard's parquet lands, so
    a manifest existing implies the data is complete."""
    d = shard_dir(out_dir, shard_id)
    os.makedirs(d, exist_ok=True)
    doc = {
        "shard": shard_id,
        "inputs": inputs,
        "rows_in": rows_in,
        "triples_out": triples_out,
        "status": "complete",
    }
    if extra:
        doc.update(extra)
    p = manifest_path(out_dir, shard_id)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, p)
    return p


def pending_shards(out_dir: str, shard_ids: List[str]) -> List[str]:
    """The resume anti-join: shards without a complete manifest."""
    return [s for s in shard_ids if not is_complete(out_dir, s)]


def read_all(out_dir: str) -> List[Dict]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name, "_MANIFEST.json")
        if name.startswith("shard=") and os.path.exists(p):
            try:
                with open(p) as fh:
                    out.append(json.load(fh))
            except (json.JSONDecodeError, OSError):
                pass
    return out
