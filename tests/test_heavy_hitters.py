"""Heavy hitters (stages/vocab.py::heavy_hitters): the block-frequent
candidate union must be complete (every phi-heavy token survives) and
the final counts exact — pinned against brute force."""

from collections import Counter

import pyarrow as pa


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)


def _brute(texts, phi):
    import math

    c = Counter()
    for t in texts:
        c.update(t.split())
    n = sum(c.values())
    thresh = max(1, math.ceil(phi * n))
    return {tok: k for tok, k in c.items() if k >= thresh}


def test_heavy_hitters_exact_vs_brute(ray_session):
    from octoray.stages.vocab import heavy_hitters

    # skewed corpus: a few hot tokens + a long tail, spread so no
    # single block sees the whole distribution
    texts = []
    for i in range(40):
        hot = "alpha " * 12 + "beta " * 6 + "gamma " * 3
        tail = " ".join(f"tail{i}_{j}" for j in range(25))
        texts.append(hot + tail)
    got = {r["token"]: r["count"]
           for r in heavy_hitters(_docs_ds(texts), phi=0.01).take_all()}
    assert got == _brute(texts, 0.01)
    assert "alpha" in got and "beta" in got


def test_heavy_hitters_empty_and_whitespace_docs(ray_session):
    from octoray.stages.vocab import heavy_hitters

    texts = ["", "   ", "x x x x", "x y"]
    got = {r["token"]: r["count"]
           for r in heavy_hitters(_docs_ds(texts), phi=0.5).take_all()}
    assert got == _brute(texts, 0.5) == {"x": 5}


def test_heavy_hitters_sorted_output(ray_session):
    from octoray.stages.vocab import heavy_hitters

    texts = ["b b b a a a c c c c"] * 3
    rows = heavy_hitters(_docs_ds(texts), phi=0.1).take_all()
    keys = [(-r["count"], r["token"]) for r in rows]
    assert keys == sorted(keys)
