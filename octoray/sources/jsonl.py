"""JSONL source/sink for document corpora.

The interchange format of the LLM-data world (one JSON object per
line; The Pile, C4 releases, RedPajama all ship this way).  Reading
uses ray.data.read_json (pyarrow JSON reader per file — streaming,
splittable by file); writing uses Dataset.write_json (one shard per
block, resumable the same way the parquet sinks are).

Schema contract mirrors the documents parquet table:
(doc_id:int64, text:string, lang:string, source:string, n_chars:int64).
"""

from __future__ import annotations

import pyarrow as pa

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])


def read_docs_jsonl(path: str):
    """JSONL file/dir -> documents Dataset, cast to the canonical
    schema (the JSON reader infers per-file; casting pins column order
    and integer width so downstream stages see one stable schema)."""
    import ray.data as rd

    def norm(t: pa.Table) -> pa.Table:
        return t.select([f.name for f in DOC_SCHEMA]).cast(DOC_SCHEMA)

    return rd.read_json(path).map_batches(norm, batch_format="pyarrow")


def write_docs_jsonl(ds, path: str) -> str:
    """Write a documents Dataset as JSONL shards.  The target dir is
    cleared first (execution-unique filenames would otherwise
    accumulate stale shards — same crash-safety rule as the parquet
    sinks)."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ds.write_json(path)
    return path
