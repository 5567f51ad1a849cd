"""Decontamination: gram-set semantics + distributed pipeline."""

import pyarrow as pa
import ray.data as rd

from octoray.stages.decontam import _gram_set, decontaminate


def test_gram_set_short_doc_empty():
    assert _gram_set("a b", 3) == frozenset()
    assert _gram_set("a b c", 3) == frozenset({"a b c"})


def test_gram_set_distinct():
    # repeated gram counted once
    g = _gram_set("x y x y x y", 2)
    assert g == frozenset({"x y", "y x"})


def test_decontaminate_flags_overlap(ray_session):
    # doc 0 is the benchmark; doc 1 shares a 3-gram, doc 2 does not
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta",
                    "noise alpha beta gamma more noise",
                    "unrelated words only here",
                ]
            ),
        }
    )
    out = (
        decontaminate(rd.from_arrow(docs), n=3, bench_mod=100)
        .to_pandas()
        .set_index("doc_id")
    )
    # benchmark doc itself excluded from the output
    assert sorted(out.index) == [1, 2]
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_hits"] == 1
    assert not bool(out.loc[2, "contaminated"]) and out.loc[2, "n_hits"] == 0
