"""End-to-end corpus-release composition (pipelines/release.py)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def test_corpus_release_semantics(ray_session):
    from octoray.pipelines.release import corpus_release

    body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu")
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array([
            body,                             # 0: clean, kept
            body,                             # 1: exact dup of 0 -> dropped
            "tiny",                           # 2: under min_tokens -> dropped
            "1 2 3 4 5 6 7 8 9 10 11 12",     # 3: no alpha -> dropped
            "email me at a@b.com " + body,    # 4: redacted, then kept
            body + ". " + body,               # 5: second line is a corpus
                                              #    dup -> collapses to body
                                              #    -> exact-dups with 0
        ], pa.string()),
    })
    out = {r["doc_id"]: r for r in corpus_release(
        rd.from_arrow(docs), min_tokens=5, min_alpha=0.5).take_all()}
    assert set(out) == {0, 4}
    assert out[0]["n_tokens"] == 12
    # redaction happened before anything else: doc 4's email never
    # reaches the released text, and its line differs from doc 0's
    assert out[4]["md5"] != out[0]["md5"]
    assert all(r["split"] in ("train", "val") for r in out.values())


def test_corpus_release_deterministic(ray_session):
    from octoray.pipelines.release import corpus_release

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    key = lambda r: (r["doc_id"], r["md5"], r["n_tokens"], r["split"])
    a = sorted(map(key, corpus_release(docs).take_all()))
    docs2 = rd.read_parquet("/root/testdata/sf0.001/documents.parquet"
                            ).repartition(13)
    b = sorted(map(key, corpus_release(docs2).take_all()))
    assert a == b and len(a) > 0
