"""Benchmark decontamination: flag training documents that share a
token n-gram with a held-out benchmark set.

The GPT-3 / Pile decontamination recipe: collect the benchmark's
distinct n-grams (13-grams in the published setting), then scan every
training document for overlap.  The benchmark side is small by
construction (eval suites are MBs even when the corpus is 100 TB), so
the gram set is computed DISTRIBUTED (per-doc distinct grams -> exact
global distinct via one combiner sort), collected once, and broadcast
via ``ray.put`` — the scan side then streams with zero shuffle.

Tokenization is whitespace (identical to textops.token_counts and the
DuckDB twin's ``regexp_extract_all(text, '\\S+')``).
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa


def _mod_mask(t: pa.Table, mod: int, *, keep_zero: bool) -> pa.Array:
    # pyarrow.compute has no modulo kernel; numpy over the int64
    # column is zero-copy
    import numpy as np

    m = np.mod(t.column("doc_id").to_numpy(zero_copy_only=False), mod) == 0
    return pa.array(m if keep_zero else ~m)


def _gram_set(text: str, n: int) -> frozenset:
    toks = text.split()
    if len(toks) < n:
        return frozenset()
    return frozenset(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))


def benchmark_ngram_set(docs_ds, *, n: int, bench_mod: int):
    """Distinct n-grams of the benchmark slice (doc_id % bench_mod == 0)
    as a Dataset of one ``gram`` column."""
    from octoray.query import distinct_values

    def grams(t: pa.Table) -> pa.Table:
        out: list = []
        for text in t.column("text").to_pylist():
            out.extend(_gram_set(text, n))
        return pa.table({"gram": pa.array(out, pa.string())})

    bench = docs_ds.map_batches(
        lambda t: t.filter(_mod_mask(t, bench_mod, keep_zero=True)),
        batch_format="pyarrow",
    )
    return distinct_values(bench.map_batches(grams, batch_format="pyarrow"),
                           ["gram"])


def decontaminate(docs_ds, *, n: int = 13, bench_mod: int = 20):
    """Per non-benchmark document: how many distinct benchmark n-grams
    it contains, and a contaminated flag.

    Partitioning assumption (documented per the custom-operator rule):
    the BENCHMARK gram set fits in one object-store value — true for
    real eval suites; the training side streams unbounded."""
    import ray

    gram_rows = benchmark_ngram_set(
        docs_ds, n=n, bench_mod=bench_mod).take_all()
    bench_ref = ray.put(frozenset(r["gram"] for r in gram_rows))

    def scan(t: pa.Table) -> pa.Table:
        bench = bench_ref if isinstance(bench_ref, frozenset) else ray.get(bench_ref)
        t = t.filter(_mod_mask(t, bench_mod, keep_zero=False))
        hits = [len(_gram_set(text, n) & bench)
                for text in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array([h > 0 for h in hits], pa.bool_()),
        })

    return docs_ds.map_batches(scan, batch_format="pyarrow")
