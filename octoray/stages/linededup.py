"""Corpus-wide sentence/line-level exact dedup (the C4 recipe).

C4 removed any line occurring more than once across the corpus,
keeping one occurrence; here "first" is defined deterministically as
the minimum (doc id, line_no) so reruns and repartitions agree.

Plan (two genuinely different shuffle keys, so two exchanges):
  explode docs -> (id, line_no, line[, n_lines])       map_batches
  sort by (line, id, line_no)                          exchange 1
  keep first row per line                              block-local
  sort by (id, line_no) + reassemble text per doc      exchange 2
The keep-first pass uses the sorted-block invariant
(query.block_map_groups's contract, pinned by test_block_invariant):
Ray's range sort co-locates equal keys and emits sorted blocks, so a
``drop_duplicates(keep="first")`` per block is globally exact.

A document whose every line was seen earlier disappears entirely —
the same contract as the SQL twin (group over kept lines).
"""

from __future__ import annotations


import pandas as pd
import pyarrow as pa


from octoray.plan import colocated_sort


def explode_lines(batch: pa.Table, *, id_col: str, text_col: str,
                  sep: str) -> pa.Table:
    ids_out: list = []
    nos: list = []
    lines: list = []
    totals: list = []
    ids = batch.column(id_col).to_pylist()
    for i, text in zip(ids, batch.column(text_col).to_pylist()):
        parts = text.split(sep)
        for j, line in enumerate(parts, start=1):
            ids_out.append(i)
            nos.append(j)
            lines.append(line)
            totals.append(len(parts))
    return pa.table({
        id_col: pa.array(ids_out, batch.schema.field(id_col).type),
        "line_no": pa.array(nos, pa.int64()),
        "line": pa.array(lines, pa.string()),
        "n_lines": pa.array(totals, pa.int64()),
    })


def line_dedup(docs, *, id_col: str = "url", text_col: str = "text",
               sep: str = ". "):
    """docs (id, text) -> (id, text_dedup, n_lines, n_kept) with every
    corpus-duplicate line removed except its first occurrence."""
    exploded = docs.map_batches(
        lambda t: explode_lines(t, id_col=id_col, text_col=text_col, sep=sep),
        batch_format="pyarrow",
    )

    def first_per_line(df: pd.DataFrame) -> pd.DataFrame:
        # The sort key MUST be exactly the dedup key: range partitioning
        # co-locates equal keys, but a composite sort (line, id, line_no)
        # may split prefix-equal tuples across partitions.  Equal-key
        # row order within the block is arbitrary, so establish the
        # (id, line_no) tiebreak here — block-local and exact.
        df = df.sort_values(["line", id_col, "line_no"], kind="mergesort")
        return df.drop_duplicates(subset=["line"], keep="first")

    kept = colocated_sort(exploded, ["line"]).map_batches(
        first_per_line, batch_format="pandas", batch_size=None)

    def rebuild_block(df: pd.DataFrame) -> pd.DataFrame:
        # one whole-block groupby-agg (NOT a DataFrame per group — that
        # costs ~0.5 ms per doc and dominated the stage at 20k docs)
        if not len(df):
            return pd.DataFrame({id_col: [], "text_dedup": [],
                                 "n_lines": [], "n_kept": []})
        df = df.sort_values([id_col, "line_no"], kind="mergesort")
        g = df.groupby(id_col, sort=False)
        out = pd.DataFrame({
            "text_dedup": g["line"].agg(sep.join),
            "n_lines": g["n_lines"].first(),
            "n_kept": g.size(),
        }).reset_index()
        return out

    # sort key == group key only (same prefix-split rule as above);
    # rebuild_block() establishes line_no order inside the block


    by_doc = colocated_sort(kept, [id_col])
    return by_doc.map_batches(rebuild_block, batch_format="pandas",
                              batch_size=None)
