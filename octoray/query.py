"""Mini triple-pattern query layer over the triple Dataset.

Replaces the reference's SPARQL/GraphDB analytics path (§3.3) with
Ray-Data-native building blocks:

  - ``values_of``        predicate-filtered (subject, object) projection
                         — one `?s f:p ?o` pattern
  - ``pivot_subjects``   multi-predicate pivot: one row per subject with
                         list-valued columns — the SPARQL subject
                         self-join family (J3) done as ONE groupby
                         instead of N-1 hash joins
  - ``hash_join``        Dataset.join wrapper (J3 across entities)
  - ``broadcast_semi_join`` / ``broadcast_anti_join``
                         tag restriction (J7) / NOT-EXISTS (J8) against
                         a small key set shipped once via ray.put
  - ``tagged_subjects``  tag id-resolution union (J6)

Partitioning note (north rule): every helper keys its shuffle on the
subject URI, the same key the canonicalization shuffle uses, so a
pipeline that chains them re-uses co-location instead of re-keying.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from octoray import plan
from octoray.plan import colocated_sort


def values_of(triples, predicate: str, *, subject_col: str = "subject", value_col: str = "value"):
    """`?s <predicate> ?o` -> Dataset[(subject, value)] (vectorized)."""

    def f(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column("predicate"), pa.scalar(predicate))
        sel = t.filter(mask)
        return pa.table({subject_col: sel.column("subject"), value_col: sel.column("object")})

    return triples.map_batches(f, batch_format="pyarrow")


def filter_predicates(triples, predicates: Sequence[str]):
    preds = pa.array(list(predicates), pa.string())

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("predicate"), value_set=preds))

    return triples.map_batches(f, batch_format="pyarrow")


def pivot_subjects(triples, spec: Dict[str, str], *, key: str = "subject"):
    """One row per subject; ``spec`` maps output column -> predicate.
    Values are '+'-joined distinct strings (the reference's
    GROUP_CONCAT(DISTINCT ...; separator='+') convention,
    masterlist.rq:8-21), so downstream code can reuse the reference's
    split-on-'+' accessor semantics (recipes.py:229-241).
    """
    pred_to_col = {p: c for c, p in spec.items()}
    wanted = filter_predicates(triples, list(spec.values()))

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        out = {key: [g["subject"].iloc[0]]}
        for col, pred in spec.items():
            vals = g.loc[g["predicate"] == pred, "object"]
            # SORTED distinct values: within-group row order after a
            # sort keyed only on subject is not stable across
            # partitionings, so first-seen order would make the
            # '+'-join nondeterministic run-to-run.  Sorting also makes
            # `split('+')[0]` downstream a true min() (kg_monthly).
            out[col] = ["+".join(sorted(set(vals)))]
        return pd.DataFrame(out)

    return sorted_map_groups(wanted, ["subject"], pivot)


def hash_join(left, right, on: str, right_on: Optional[str] = None, *,
              how: str = "inner", num_partitions: int = 16,
              broadcast_limit: int = plan.BROADCAST_ROWS):
    """Relational join, stats-gated (the map-side-join switch used
    throughout this engine): when the RIGHT side fits comfortably it
    is broadcast once via ``ray.put`` and every left batch does a
    C-speed pandas merge against it — the whole join streams with ZERO
    shuffle; otherwise fall back to ``merge_join`` (one task-based
    range sort + per-block merge).

    Neither path uses Ray 2.49's actor-based JoinOperator: measured in
    this session, each JoinOperator execution leaves its hash-shuffle
    aggregator worker processes behind, and a session that runs joins
    repeatedly degrades 3-4x by the third execution (5.1s -> 4.7s ->
    17.9s on the same query, 166 lingering workers).  Both replacement
    paths use plain tasks — nothing lingers."""
    import ray

    if right_on and right_on != on:
        right = right.rename_columns({right_on: on})
    right = right.materialize()
    if right.count() > broadcast_limit:
        return merge_join(left, right, [on], how=how)
    rdf = right.to_pandas()
    ref = ray.put(rdf)
    pd_how = "left" if how == "left_outer" else how

    def f(df):
        import ray as _ray

        r = _ray.get(ref)
        return df.merge(r, on=on, how=pd_how)

    return left.map_batches(f, batch_format="pandas")


def _schema_of(ds):
    """Dataset schema, robust to Ray 2.49's schema-less empty blocks:
    ``Dataset.schema(fetch_if_missing=True)`` returns None when the
    first fetched block is one of the empty schema-less RefBundles the
    hash-shuffle/filter operators emit (see util.drop_empty_blocks).
    Fall back to streaming until a block that carries a schema; a
    truly empty schema-less dataset is an error the caller must
    normalize (explicit schema / drop_empty_blocks)."""
    s = ds.schema(fetch_if_missing=True)
    if s is not None:
        return s
    for b in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        if b.schema.names:
            return b.schema
    raise ValueError(
        "dataset is empty AND schema-less (Ray empty-block quirk); "
        "normalize upstream with an explicit schema")


def merge_join(left, right, on: Sequence[str], *, how: str = "inner"):
    """Sort-merge join on the block-colocation machinery every other
    wide op here already trusts: tag each side, union under a common
    (nullable) schema, ONE range-partitioned sort on the keys, then a
    vectorized per-block pandas merge of the two sides.  Equal keys
    land in one block, so the block-local merge is globally exact.

    ``how``: "inner" or "left_outer".  Non-key column-name collisions
    between the sides are an error (rename first), matching the
    engine's explicit-schema style."""
    import pandas as pd

    on = list(on)
    ls = _schema_of(left)
    rs = _schema_of(right)
    lcols = [c for c in ls.names if c not in on]
    rcols = [c for c in rs.names if c not in on]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"merge_join column collision: {sorted(clash)}")
    types = {}
    for sch in (ls, rs):
        for name, typ in zip(sch.names, sch.types):
            types[name] = typ
    all_cols = on + lcols + rcols

    def widen(side: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for c in all_cols:
                if c in t.schema.names:
                    cols[c] = t.column(c).cast(types[c])
                else:
                    cols[c] = pa.nulls(n, types[c])
            cols["_side"] = pa.array([side] * n, pa.int8())
            return pa.table(cols)

        return f

    both = left.map_batches(widen(0), batch_format="pyarrow").union(
        right.map_batches(widen(1), batch_format="pyarrow")
    )

    out_schema = pa.schema([(c, types[c]) for c in all_cols])

    def block_merge(df: "pd.DataFrame") -> pa.Table:
        # emit ARROW with the statically known schema: pandas would
        # coerce unmatched left-outer ints to NaN floats and downstream
        # arrow-block APIs (rename_columns etc.) reject pandas blocks
        if len(df) == 0:
            return out_schema.empty_table()
        l = df[df["_side"] == 0][on + lcols]
        r = df[df["_side"] == 1][on + rcols]
        out = l.merge(r, on=on, how="left" if how == "left_outer" else "inner")
        return pa.table({c: pa.array(out[c], type=types[c], from_pandas=True)
                         for c in all_cols})

    return colocated_sort(both, on).map_batches(
        block_merge, batch_format="pandas", batch_size=None)


def broadcast_keys(keys) -> "ray.ObjectRef":  # noqa: F821
    """Ship a small key set to the cluster ONCE (ray.put), to be read
    inside map_batches by every task — never per batch."""
    import ray

    return ray.put(frozenset(keys))


def _key_array(keys, col_type: pa.DataType) -> pa.Array:
    """Key set -> Arrow array typed to match the probe column."""
    return pa.array(list(keys), type=col_type)


def broadcast_semi_join(ds, col: str, keys_ref):
    """Keep rows whose ``col`` is in the broadcast key set (J7)."""

    def f(t: pa.Table) -> pa.Table:
        import ray

        keys = keys_ref if isinstance(keys_ref, frozenset) else ray.get(keys_ref)
        arr = _key_array(keys, t.schema.field(col).type)
        return t.filter(pc.is_in(t.column(col), value_set=arr))

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_anti_join(ds, col: str, keys_ref):
    """Drop rows whose ``col`` is in the broadcast key set (J8/J9 —
    NOT EXISTS / incremental-resume anti-join)."""

    def f(t: pa.Table) -> pa.Table:
        import ray

        keys = keys_ref if isinstance(keys_ref, frozenset) else ray.get(keys_ref)
        arr = _key_array(keys, t.schema.field(col).type)
        return t.filter(pc.invert(pc.is_in(t.column(col), value_set=arr)))

    return ds.map_batches(f, batch_format="pyarrow")


def sorted_groupby_count(ds, keys: Sequence[str], *, alias: str = "count"):
    """Exact global count-per-group via ONE range-partitioned sort +
    per-block Arrow group_by.  Equal keys land in one sort partition,
    so block-local aggregation is globally exact — ~10x cheaper than
    Ray's sort-aggregate, whose per-group accumulators dominate (see
    BASELINE.md dedup note).  Output: keys + ``alias`` (int64)."""
    keys = list(keys)

    def f(t: pa.Table) -> pa.Table:
        g = t.group_by(keys, use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(keys + [alias])

    return colocated_sort(ds, keys).map_batches(
        f, batch_format="pyarrow", batch_size=None)


def sorted_groupby_sum(ds, keys: Sequence[str], value_col: str, *,
                       alias: str = "sum"):
    """Exact global sum-per-group, same one-sort plan as
    ``sorted_groupby_count``.  The combiner half of a pre-aggregated
    count: callers that can cheaply produce PARTIAL counts per block
    (e.g. jaccard pair expansion, where a pair repeats once per shared
    shingle within a block) collapse them locally first, so this sort
    moves partial rows, not raw ones.  Output: keys + ``alias``
    (int64)."""
    keys = list(keys)

    def f(t: pa.Table) -> pa.Table:
        g = t.group_by(keys, use_threads=False).aggregate([(value_col, "sum")])
        return g.rename_columns(keys + [alias])

    return colocated_sort(ds, keys).map_batches(
        f, batch_format="pyarrow", batch_size=None)


def distinct_values(ds, cols: Sequence[str]):
    """Exact global DISTINCT over ``cols``: block-local arrow distinct
    (map-side combiner) -> ONE range sort -> block-local distinct
    again.  The shuffle moves one row per (block, key) instead of one
    per raw row, and the sorted pass is globally exact because equal
    keys co-locate — the same plan as sorted_groupby_count minus the
    counts.  ~10x cheaper than ``groupby(col).count()`` (Ray's
    sort-aggregate; see the BASELINE.md dedup note)."""
    cols = list(cols)

    def local(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols, use_threads=False).aggregate([])

    pre = ds.map_batches(local, batch_format="pyarrow")
    return colocated_sort(pre, cols).map_batches(
        local, batch_format="pyarrow", batch_size=None)


def sorted_groupby_min(ds, keys: Sequence[str], value_col: str, *,
                       alias: str = "min"):
    """Exact global min-per-group, same one-sort plan as
    ``sorted_groupby_count``.  Min is idempotent, so callers can (and
    should) pre-combine per block first — the sort then moves one row
    per (block, key), not one per raw row."""
    keys = list(keys)

    def f(t: pa.Table) -> pa.Table:
        g = t.group_by(keys, use_threads=False).aggregate([(value_col, "min")])
        return g.rename_columns(keys + [alias])

    return colocated_sort(ds, keys).map_batches(
        f, batch_format="pyarrow", batch_size=None)


def combined_groupby_count(ds, keys: Sequence[str], *, alias: str = "count"):
    """Count-per-group with a MAP-SIDE COMBINE: each block pre-counts
    locally (low-cardinality keys collapse to a handful of partial
    rows), then one tiny sort sums the partials.  Use when the key
    cardinality is far below the row count (e.g. 25 nations over 150k
    orders) — the all-to-all then moves partial rows, not data rows."""
    keys = list(keys)

    def local(t: pa.Table) -> pa.Table:
        g = t.group_by(keys, use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["_n"])

    partial = ds.map_batches(local, batch_format="pyarrow")
    return sorted_groupby_sum(partial, keys, "_n", alias=alias)


def assert_block_colocation(ds, keys: Sequence[str]) -> None:
    """Back-compat alias for :func:`octoray.plan.verify_block_colocation`
    (the single implementation of the invariant check since round 5 —
    the older native-typed copy here had diverged env semantics and
    missed the empty-schema-less-block case)."""
    plan.verify_block_colocation(ds, keys)


def block_map_groups(ds, keys: Sequence[str], fn):
    """Apply ``fn`` per key-group WITHIN each block (pandas groupby —
    per-group dispatch ~100x cheaper than Ray's map_groups).  Caller
    must guarantee all rows of a key share one block — i.e. hand in
    the output of :func:`octoray.plan.colocated_sort` (as
    ``sorted_map_groups`` and every production caller do), which
    verifies the invariant on by default."""
    import pandas as pd

    keys = list(keys)

    def apply_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return df
        parts = [fn(g) for _, g in df.groupby(keys, sort=False, group_keys=False)]
        parts = [p for p in parts if p is not None]
        if not parts:
            return pd.DataFrame()
        return pd.concat(parts, ignore_index=True)

    return ds.map_batches(apply_block, batch_format="pandas", batch_size=None)


def sorted_map_groups(ds, keys: Sequence[str], fn):
    """``groupby(keys).map_groups(fn)`` replacement: one global sort,
    then ``block_map_groups``."""
    return block_map_groups(colocated_sort(ds, keys), keys, fn)


def grouped_top_k(ds, group_cols: Sequence[str], order_col: str, k: int, *,
                  tie_cols: Sequence[str] = (), descending: bool = True):
    """Exact per-group top-k by ``order_col`` (ties broken by
    ``tie_cols`` ascending — a unique total order makes the k-boundary
    deterministic).

    Plan: a MAP-SIDE partial top-k (each block keeps at most k rows
    per group — a row can only be in the global top-k of its group if
    it is in its block's top-k) prunes before the exchange, then ONE
    range sort co-locates groups in (group, order, ties) order and a
    block-local vectorized head(k) finishes.  The shuffle moves at most
    k x blocks rows per group, never the raw table — the same
    partial-combine discipline as ``sorted_groupby_count``.

    Reference analogue: the per-document keyword cut in tfidf and the
    reference's per-strain 'latest record wins' selections; generalized
    here as the group-wise top-k every curation pipeline needs
    (best-k documents per domain/source by quality score)."""
    gcols, tcols = list(group_cols), list(tie_cols)
    sort_cols = gcols + [order_col] + tcols
    asc = [True] * len(gcols) + [not descending] + [True] * len(tcols)

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return df
        df = df.sort_values(sort_cols, ascending=asc, kind="mergesort")
        return df.groupby(gcols, sort=False, group_keys=False).head(k)

    pre = ds.map_batches(partial, batch_format="pandas")

    # Global sort keys are the GROUP columns only: sorting by the full
    # (group, order) composite could put a range boundary INSIDE a
    # group.  Equal group keys co-locate in one block (the same
    # invariant sorted_groupby_count pins), and the within-block
    # re-sort is cheap because the partial pass already pruned to at
    # most k rows per (group, block).
    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return df
        df = df.sort_values(sort_cols, ascending=asc, kind="mergesort")
        return df.groupby(gcols, sort=False, group_keys=False).head(k)

    return colocated_sort(pre, gcols).map_batches(
        finish, batch_format="pandas", batch_size=None)


def group_sample(ds, group_cols: Sequence[str], id_col: str, k: int):
    """Deterministic uniform sample of k ROWS per group (bottom-k by
    md5(id) — the same hash-as-randomness convention as
    weighted_sample / approx_quantiles, so the sample is reproducible
    run-to-run and engine-to-oracle).  The curation use-case: "show me
    k examples per source/domain" over a corpus too large to sort.

    Plan: attach the md5 key in a streaming map, then
    :func:`grouped_top_k` ascending on it — map-side partial bottom-k
    per block, one group-key range sort over at most k x blocks rows
    per group."""
    import pyarrow as pa

    from octoray.stages.sketch import _md5_lower64

    def keyed(t: "pa.Table") -> "pa.Table":
        ids = [str(v) for v in t.column(id_col).to_pylist()]
        hv = _md5_lower64(ids)
        return t.append_column("_hv", pa.array(hv, pa.uint64()))

    top = grouped_top_k(ds.map_batches(keyed, batch_format="pyarrow"),
                        list(group_cols), "_hv", k,
                        tie_cols=[id_col], descending=False)
    return top.map_batches(lambda t: t.drop_columns(["_hv"]),
                           batch_format="pyarrow")


def sql_group_sample(table: str, group_cols: Sequence[str], id_col: str,
                     k: int, cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`group_sample`: identical md5 bottom-k."""
    gl = ", ".join(group_cols)
    cl = ", ".join(cols)
    return f"""
        SELECT {cl} FROM (
            SELECT {cl},
                   row_number() OVER (
                       PARTITION BY {gl}
                       ORDER BY md5_number_lower(
                           CAST({id_col} AS VARCHAR)), {id_col}) AS rn
            FROM {table})
        WHERE rn <= {k}
    """


def salted_groupby_sum(ds, key: str, value_col: str, *, n_salts: int = 16,
                       alias: str = "sum"):
    """Two-phase salted aggregation for hot keys (SURVEY.md §4.3, the
    north rule's explicit skew strategy): phase 1 groups by
    (key, salt) where salt spreads a hub key's rows over ``n_salts``
    reducers, phase 2 collapses the (at most n_salts) partial rows per
    key.  Equality with the unsalted aggregate is pinned by
    tests/test_query_layer.py.  Salt derives from a value hash, never
    the wall clock, so the plan is deterministic."""
    import numpy as np
    from ray.data.aggregate import Sum

    def add_salt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # cheap deterministic spread: row position within block
        salt = pa.array(np.arange(n, dtype=np.int64) % n_salts, pa.int64())
        return t.select([key, value_col]).append_column("_salt", salt)

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .aggregate(Sum(value_col, alias_name="_partial"))
    )
    return partial.groupby(key).aggregate(Sum("_partial", alias_name=alias))


def semi_join_auto(left, col: str, keys_ds, *, key_col: Optional[str] = None,
                   anti: bool = False, broadcast_limit: int = plan.BROADCAST_ROWS,
                   num_partitions: int = 16):
    """Stats-gated semi/anti-join against a key Dataset: the key set is
    computed DISTRIBUTED (distinct aggregate — never an
    iter_batches/take_all scan of the raw table through the driver),
    then EITHER broadcast via ray.put when it fits comfortably, or
    hash-joined when it doesn't — the same map-side-join switch
    jaccard_pairs uses.  This is the scale-safe replacement for
    driver-side key-set builds (VERDICT r1 #3/#8)."""
    kc = key_col or col
    distinct = distinct_values(keys_ds, [kc]).materialize()
    n = distinct.count()
    if n == 0:
        return left if anti else left.limit(0)
    if n <= broadcast_limit:
        keys = {r[kc] for r in distinct.take_all()}
        ref = broadcast_keys(keys)
        return (broadcast_anti_join if anti else broadcast_semi_join)(left, col, ref)
    if anti:
        return anti_join(left, distinct.rename_columns({kc: col}) if kc != col
                         else distinct, on=col, num_partitions=num_partitions)
    right = distinct if kc == col else distinct.rename_columns({kc: col})
    return merge_join(left, right, [col])


def anti_join(left, right_keys, on: str, *, num_partitions: int = 16):
    """Distributed anti-join (J8): rows of ``left`` whose ``on`` value
    does NOT appear in ``right_keys`` (a Dataset holding column ``on``).
    Left-outer hash join + null-probe filter — use this when the right
    side is too big to broadcast; ``broadcast_anti_join`` otherwise."""
    import pyarrow.compute as pc  # noqa: F811

    marked = (
        distinct_values(right_keys, [on])
        .map_batches(
            lambda t: t.select([on]).append_column(
                "_present", pa.array([1] * t.num_rows, pa.int8())
            ),
            batch_format="pyarrow",
        )
    ).materialize()
    if marked.count() == 0:
        # an empty right side loses its schema and breaks the hash
        # join; semantically anti-join against nothing keeps everything
        return left
    joined = merge_join(left, marked, [on], how="left_outer")

    def keep_missing(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("_present"))).drop_columns(["_present"])

    return joined.map_batches(keep_missing, batch_format="pyarrow")


def subjects_matching_all(triples, clauses: Sequence[tuple]):
    """Conjunctive triple-pattern match: subjects satisfying EVERY
    clause — the SPARQL multi-clause subject self-join (J3), e.g.
    [("f:subtype", "H1N1"), ("f:state", None)] = 'H1N1 strains with
    any state'.  A clause is (predicate, object|None); None matches
    any object.

    ONE pass + ONE shuffle instead of N-1 joins: each triple maps to
    (subject, clause_idx) for the clauses it satisfies; a subject
    matches iff it hits all len(clauses) distinct clause indices."""
    n_clauses = len(clauses)

    def hits(t: pa.Table) -> pa.Table:
        # one vectorized mask per clause (clauses are few, rows many) —
        # no per-row Python (VERDICT r1 #7)
        parts = []
        for i, (cp, co) in enumerate(clauses):
            mask = pc.equal(t.column("predicate"), pa.scalar(cp))
            if co is not None:
                mask = pc.and_(mask, pc.equal(t.column("object"), pa.scalar(co)))
            sel = t.filter(mask)
            parts.append(pa.table({
                "subject": sel.column("subject"),
                "clause": pa.array([i] * sel.num_rows, pa.int64()),
            }))
        return pa.concat_tables(parts)

    hit_ds = triples.map_batches(hits, batch_format="pyarrow")

    def all_clauses(df):
        import pandas as pd

        ok = df.groupby("subject", sort=False)["clause"].nunique() == n_clauses
        return pd.DataFrame({"subject": ok.index[ok].to_numpy()})

    return colocated_sort(hit_ds, ["subject"]).map_batches(
        lambda df: all_clauses(df) if len(df) else df.iloc[0:0][["subject"]],
        batch_format="pandas", batch_size=None,
    )


ID_PREDICATES = ["f:strain_name", "f:barcode", "f:epi_isolate", "f:genbank_id", "f:epi_id"]


def tagged_subjects(triples, ids: Sequence[str], *, id_predicates: Sequence[str] = ID_PREDICATES):
    """Resolve free-form identifiers to subject URIs — the UNION
    id-resolution of get-tagged-strain.rq:21-31 (J6): a subject
    matches if ANY of its id-predicate objects is in the tag set.
    Small side broadcast; big side streams."""
    keys = broadcast_keys(ids)
    idt = filter_predicates(triples, list(id_predicates))

    def f(t: pa.Table) -> pa.Table:
        import ray

        kk = keys if isinstance(keys, frozenset) else ray.get(keys)
        arr = pa.array(list(kk), pa.string())
        sel = t.filter(pc.is_in(t.column("object"), value_set=arr))
        return pa.table({"subject": sel.column("subject")})

    # NOT deduplicated: the only consumers feed semi_join_auto, which
    # runs its own single distinct — a second one here would double the
    # shuffle work for nothing
    return idt.map_batches(f, batch_format="pyarrow")


def asof_join(left, right, *, by: str, on: str, right_suffix: str = "_r"):
    """Distributed backward as-of join (the custom operator the brief
    names as missing from Ray Data): for each left row, attach the
    right row with the largest ``on`` <= left's ``on`` within the same
    ``by`` group — event attribution, price-as-of-trade, sensor
    alignment.

    Plan: tag sides, align schemas with typed null columns, ONE range
    sort on the group key (equal keys co-locate — the same pinned
    invariant as the rest of the block-local family), then a
    block-local vectorized ``pandas.merge_asof`` per block.  Right
    rows' ``on`` value survives as ``on + right_suffix``.  Left rows
    with no prior right row keep typed nulls."""
    import numpy as np
    import pandas as pd

    lf_schema = left.schema().base_schema
    rf_schema = right.schema().base_schema
    lcols = list(lf_schema.names)
    rextra = [c for c in rf_schema.names if c not in (by, on)]

    # right's on value must survive the merge (merge_asof consumes the
    # shared `on` column), so duplicate it under the suffixed name
    def prep_right(t: pa.Table) -> pa.Table:
        t = t.append_column(on + right_suffix, t.column(on))
        return t

    right = right.map_batches(prep_right, batch_format="pyarrow")
    rcols = [by, on] + rextra + [on + right_suffix]

    r_arrow = {f.name: f.type for f in rf_schema}
    r_arrow[on + right_suffix] = r_arrow[on]
    l_arrow = {f.name: f.type for f in lf_schema}

    union_cols = lcols + rextra + [on + right_suffix]

    def pad(t: pa.Table, missing: dict, side: int) -> pa.Table:
        for name, typ in missing.items():
            t = t.append_column(name, pa.nulls(t.num_rows, typ))
        t = t.append_column(
            "_side", pa.array(np.full(t.num_rows, side, np.int8)))
        # both union sides must agree on column ORDER, not just names
        return t.select(union_cols + ["_side"])

    lpad = {c: r_arrow[c] for c in rextra + [on + right_suffix]}
    rpad = {c: l_arrow[c] for c in lcols if c not in (by, on)}
    both = left.map_batches(
        lambda t: pad(t, lpad, 0), batch_format="pyarrow").union(
        right.map_batches(lambda t: pad(t, rpad, 1), batch_format="pyarrow"))

    out_cols = lcols + rextra + [on + right_suffix]

    def block_asof(df: pd.DataFrame) -> pd.DataFrame:
        lf = df[df["_side"] == 0][lcols]
        rf = df[df["_side"] == 1][rcols]
        if not len(lf):
            return pd.DataFrame({c: [] for c in out_cols})
        lf = lf.sort_values(on, kind="mergesort")
        rf = rf.sort_values(on, kind="mergesort")
        merged = pd.merge_asof(lf, rf, on=on, by=by, direction="backward",
                               suffixes=("", "_dup"))
        return merged[out_cols]

    return colocated_sort(both, [by]).map_batches(block_asof, batch_format="pandas",
                                       batch_size=None)


def range_join_count(left, right, *, by: str, on: str, window,
                     alias: str = "n_in_window"):
    """Distributed range join (count form): for each left row, how
    many right rows share its ``by`` group with ``on`` in
    [left.on - window, left.on] — trailing-window feature joins
    (clicks before a purchase, readings before an alarm).

    Same one-sort group-co-location plan as asof_join; inside each
    block the count is two vectorized merge_asof rank lookups against
    the right side's per-group cumulative count (count_le(ts) -
    count_lt(ts - window)) — no per-row loop, no pair expansion, so a
    dense window never blows up the intermediate."""
    import numpy as np
    import pandas as pd

    lcols = list(left.schema().base_schema.names)

    def tag(side):
        def f(t: pa.Table) -> pa.Table:
            t = t.select([by, on] if side else list(lcols))
            for c in lcols:
                if side and c not in (by, on):
                    t = t.append_column(
                        c, pa.nulls(t.num_rows,
                                    left.schema().base_schema.field(c).type))
            t = t.append_column(
                "_side", pa.array(np.full(t.num_rows, side, np.int8)))
            return t.select(lcols + ["_side"])
        return f

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        lf = df[df["_side"] == 0][lcols].sort_values(on, kind="mergesort")
        rf = df[df["_side"] == 1][[by, on]].sort_values(on, kind="mergesort")
        if not len(lf):
            return pd.DataFrame({c: [] for c in lcols + [alias]})
        rf = rf.assign(_cum=rf.groupby(by, sort=False).cumcount() + 1)
        hi = pd.merge_asof(lf[[by, on]], rf, on=on, by=by,
                           direction="backward")["_cum"].fillna(0)
        lo_keys = lf[[by, on]].copy()
        # keep the original dtype: Timedelta arithmetic silently
        # upcasts us-resolution timestamps to ns, and merge_asof
        # refuses mixed-resolution keys
        lo_keys[on] = (lo_keys[on] - window).astype(lf[on].dtype)
        lo_keys = lo_keys.sort_values(on, kind="mergesort")
        lo = pd.merge_asof(lo_keys, rf, on=on, by=by,
                           direction="backward",
                           allow_exact_matches=False)["_cum"].fillna(0)
        # lo came back in lo_keys order; realign to lf order
        lo = lo.set_axis(lo_keys.index).reindex(lf.index)
        out = lf.copy()
        out[alias] = (hi.set_axis(lf.index) - lo).astype("int64")
        return out

    return colocated_sort(both, [by]).map_batches(block, batch_format="pandas",
                                       batch_size=None)


def sorted_prefix_sum(ds, value_col: str, *, order_col: str,
                      alias: str = "offset"):
    """Distributed EXCLUSIVE prefix sum (the classic two-pass scan):
    each output row gets the sum of ``value_col`` over all rows
    strictly before it in ``order_col`` order.

    Pass 1: sort + collect one (first_key, block_sum) pair per block —
    a driver reduce bounded by BLOCK COUNT, not rows.  Pass 2:
    broadcast the exclusive block offsets keyed by each block's first
    row key; every block adds its offset to a local cumsum.  Requires
    ``order_col`` values unique (id columns), so the first-key lookup
    is unambiguous."""
    import numpy as np
    import ray

    s = ds.sort([order_col]).materialize()

    def bounds(t: pa.Table) -> pa.Table:
        return pa.table({
            "_kv": t.column(order_col).slice(0, min(1, t.num_rows)),
            "_sum": pa.array(
                [int(pc.sum(t.column(value_col)).as_py() or 0)]
                if t.num_rows else [], pa.int64())})

    blocks = s.map_batches(bounds, batch_format="pyarrow",
                           batch_size=None).take_all()
    blocks.sort(key=lambda r: r["_kv"])
    acc = 0
    off_by_key = {}
    for r in blocks:
        off_by_key[r["_kv"]] = acc
        acc += r["_sum"]
    ref = ray.put(off_by_key)

    def add(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column(alias, pa.array([], pa.int64()))
        off = ray.get(ref)[t.column(order_col)[0].as_py()]
        v = np.asarray(t.column(value_col).to_numpy(zero_copy_only=False),
                       np.int64)
        ex = off + np.cumsum(v) - v
        return t.append_column(alias, pa.array(ex, pa.int64()))

    return s.map_batches(add, batch_format="pyarrow", batch_size=None)
