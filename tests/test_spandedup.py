"""Exact duplicate-span trimming (stages/spandedup.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _brute(docs, k):
    """Driver-side reference: corpus-wide first occurrence per k-gram,
    later occurrences' spans removed."""
    first = {}
    toks = {}
    for i, text in docs:
        ts = text.split()
        toks[i] = ts
        for p in range(len(ts) - k + 1):
            g = " ".join(ts[p:p + k])
            if g not in first or (i, p) < first[g]:
                first[g] = (i, p)
    out = {}
    for i, text in docs:
        ts = toks[i]
        n = len(ts)
        covered = np.zeros(n, bool)
        for p in range(n - k + 1):
            g = " ".join(ts[p:p + k])
            if first[g] != (i, p):
                covered[p:p + k] = True
        kept = [w for w, c in zip(ts, covered) if not c]
        out[i] = (n, int(covered.sum()), " ".join(kept))
    return out


def _run(docs_rows, k, **kw):
    from octoray.stages.spandedup import trim_duplicate_spans

    tbl = pa.table({
        "doc_id": pa.array([i for i, _ in docs_rows], pa.int64()),
        "text": pa.array([t for _, t in docs_rows], pa.string()),
    })
    got = trim_duplicate_spans(rd.from_arrow(tbl).repartition(8), k=k, **kw)
    return {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_trimmed"])
            for r in got.take_all()}


def _corpus(n=120, seed=3):
    rng = np.random.default_rng(seed)
    shared = ["the quick brown fox jumps over the lazy dog again and again",
              "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"]
    rows = []
    for i in range(n):
        parts = [f"u{i} tail{rng.integers(0, 5)}"]
        if rng.random() < 0.6:
            parts.append(shared[int(rng.integers(0, 2))])
        if rng.random() < 0.3:
            parts.append(shared[0])  # second copy -> within-doc repeats too
        parts.append(f"unique closing {i} {rng.integers(0, 9)}")
        rng.shuffle(parts)
        rows.append((i, " ".join(parts)))
    return rows


def test_trim_matches_bruteforce(ray_session):
    rows = _corpus()
    assert _run(rows, 6) == _brute(rows, 6)


def test_trim_paths_agree(ray_session):
    rows = _corpus(60, seed=9)
    assert _run(rows, 6, broadcast_limit=1) == _run(rows, 6)


def test_trim_exact_under_tiny_blocks(ray_session):
    """The gram keep-first sorts on gram ONLY (a multi-column shuffle
    key would let a gram group straddle partitions — the exact bug the
    first implementation had); stress under forced tiny sort blocks."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024
    try:
        rows = _corpus(200, seed=5)
        assert _run(rows, 6) == _brute(rows, 6)
    finally:
        ctx.target_max_block_size = old
