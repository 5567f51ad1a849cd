"""JSONL source/sink: schema-stable roundtrip, unicode, stale shards."""

import os

import pyarrow as pa
import ray.data as rd

from octoray.sources.jsonl import DOC_SCHEMA, read_docs_jsonl, write_docs_jsonl


def _docs_tbl():
    return pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["héllo wörld", 'quote " and \\ backslash'], pa.string()),
        "lang": pa.array(["de", "en"], pa.string()),
        "source": pa.array(["s1", "s2"], pa.string()),
        "n_chars": pa.array([11, 23], pa.int64()),
    })


def test_roundtrip_exact(ray_session, tmp_path):
    d = str(tmp_path / "docs")
    write_docs_jsonl(rd.from_arrow(_docs_tbl()), d)
    back = read_docs_jsonl(d)
    assert back.schema().base_schema == DOC_SCHEMA
    got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _docs_tbl().to_pandas()
    assert got.equals(want)


def test_rewrite_clears_stale_shards(ray_session, tmp_path):
    d = str(tmp_path / "docs")
    write_docs_jsonl(rd.from_arrow(_docs_tbl()), d)
    # plant a stale shard that a naive re-write would leave behind
    with open(os.path.join(d, "stale.json"), "w") as f:
        f.write('{"doc_id": 99, "text": "x", "lang": "en", '
                '"source": "s", "n_chars": 1}\n')
    write_docs_jsonl(rd.from_arrow(_docs_tbl()), d)
    got = read_docs_jsonl(d).to_pandas()
    assert sorted(got["doc_id"]) == [1, 2]
