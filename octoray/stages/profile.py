"""One-pass distributed data profiling with mergeable sketches.

The first thing anyone does to a new 100-TB table is ask what's in
it: row counts, null rates, distinct cardinalities, value ranges.
``profile_columns`` answers for every requested column in ONE corpus
scan: each block emits one stats partial per column (n / n_null /
min / max over the lexical form) plus the column's KMV k-minimum
hash partial (stages/sketch.py) — so the exchange carries
O(columns x blocks x k) tiny rows, never the data.  Distinct counts
are the KMV estimate (exact below k survivors), mergeable across
blocks by construction.

Lexical form parity (the oracle contract): values compare as DuckDB's
``CAST(x AS VARCHAR)``.  Python ``str()`` matches DuckDB for ints,
floats ('1.0', '1e-07') and strings; timestamps differ only in
trailing fractional zeros (pandas pads to 6 digits, DuckDB strips) —
``_lexical`` strips them the same way.

Reference analogue: octofludb's column-vote type inference
(recipes.py table ingestion) profiles columns to pick classifiers;
this is that profiling pass made corpus-scale.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from octoray.stages.sketch import _TWO64, _md5_lower64
from octoray.util import round_half_up_scalar

from octoray.plan import colocated_sort


def _lexical(arr: pa.ChunkedArray | pa.Array) -> pd.Series:
    """Non-null Arrow values as DuckDB-CAST-compatible strings.

    Typed on the ARROW column, not a pandas block: an int64 column
    with nulls becomes float64 in pandas and would render '3.0' where
    DuckDB casts '3'."""
    import pyarrow.compute as pc

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    arr = arr.drop_null()
    t = arr.type
    if pa.types.is_integer(t) or pa.types.is_string(t) \
            or pa.types.is_large_string(t) or pa.types.is_boolean(t):
        return pc.cast(arr, pa.string()).to_pandas()
    if pa.types.is_timestamp(t):
        # explicit format: pandas astype(str) renders date-only when a
        # whole block happens to be midnight values; DuckDB never does
        out = arr.to_pandas().dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return out.str.rstrip("0").str.rstrip(".")
    # floats (and anything else Python str() renders like DuckDB)
    return arr.to_pandas().astype(str)


def profile_columns(ds, columns: Sequence[str], *, k: int = 256):
    """(column, n, n_null, approx_distinct, min_val, max_val) — one
    row per profiled column, ordered by column name."""
    from ray.data.aggregate import Max, Min, Sum

    columns = list(columns)

    # ONE corpus scan: stats partials and KMV hash partials ride the
    # same output block (kind 0 = stats, kind 1 = hash row) and are
    # split by a cheap filter downstream — the split operates on tiny
    # partial rows, never on the data
    def partials(tb: pa.Table) -> pd.DataFrame:
        rows = {"column": [], "kind": [], "n": [], "n_null": [],
                "min_val": [], "max_val": [], "hv": []}
        for c in columns:
            s = tb.column(c)
            nn = s.null_count
            vals = _lexical(s)
            rows["column"].append(c)
            rows["kind"].append(0)
            rows["n"].append(len(s))
            rows["n_null"].append(nn)
            rows["min_val"].append(vals.min() if len(vals) else None)
            rows["max_val"].append(vals.max() if len(vals) else None)
            rows["hv"].append(0)
            if len(vals):
                for h in np.unique(_md5_lower64(vals.unique()))[:k]:
                    rows["column"].append(c)
                    rows["kind"].append(1)
                    rows["n"].append(0)
                    rows["n_null"].append(0)
                    rows["min_val"].append(None)
                    rows["max_val"].append(None)
                    rows["hv"].append(h)
        out = pd.DataFrame(rows)
        out["hv"] = out["hv"].astype(np.uint64)
        return out

    both = ds.map_batches(partials, batch_format="pyarrow",
                          batch_size=None).materialize()
    stats_ds = both.filter(expr="kind == 0")
    kmv_ds = both.filter(expr="kind == 1").select_columns(["column", "hv"])

    agg = (stats_ds.groupby("column")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_null", alias_name="n_null"),
                      Min("min_val", alias_name="min_val"),
                      Max("max_val", alias_name="max_val")))

    def kmv_finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"column": df.get("column", []),
                                 "approx_distinct":
                                 pd.Series([], dtype="float64")})
        cols, ests = [], []
        for c, sub in df.groupby("column", sort=False):
            hv = np.unique(sub["hv"].to_numpy())
            nd = len(hv)
            est = (float(nd) if nd < k
                   else (k - 1) / (float(hv[k - 1]) / _TWO64))
            cols.append(c)
            ests.append(round_half_up_scalar(est, 6))
        return pd.DataFrame({"column": cols, "approx_distinct": ests})

    kmv = colocated_sort(kmv_ds, ["column"]).map_batches(
        kmv_finish, batch_format="pandas", batch_size=None)

    # both sides are <= len(columns) rows — a driver combine is exact
    # and bounded regardless of corpus size
    import ray.data as rd

    srows = {r["column"]: r for r in agg.take_all()}
    krows = {r["column"]: r["approx_distinct"] for r in kmv.take_all()}
    out = []
    for c in sorted(srows):
        r = srows[c]
        out.append((c, int(r["n"]), int(r["n_null"]),
                    float(krows.get(c, 0.0)), r["min_val"], r["max_val"]))
    return rd.from_arrow(pa.table({
        "column": pa.array([o[0] for o in out], pa.string()),
        "n": pa.array([o[1] for o in out], pa.int64()),
        "n_null": pa.array([o[2] for o in out], pa.int64()),
        "approx_distinct": pa.array([o[3] for o in out], pa.float64()),
        "min_val": pa.array([o[4] for o in out], pa.string()),
        "max_val": pa.array([o[5] for o in out], pa.string()),
    }))


def sql_profile_columns(table: str, columns: Sequence[str], *,
                        k: int = 256) -> str:
    """DuckDB twin: per-column UNION ALL of the same stats + the same
    KMV estimator over ``md5_number_lower(CAST(col AS VARCHAR))``."""
    parts = []
    for c in sorted(columns):
        parts.append(f"""
        SELECT '{c}' AS column, n, n_null, approx_distinct,
               min_val, max_val FROM
          (SELECT count(*) AS n,
                  count(*) - count({c}) AS n_null,
                  min(CAST({c} AS VARCHAR)) AS min_val,
                  max(CAST({c} AS VARCHAR)) AS max_val
           FROM {table})
          CROSS JOIN
          (SELECT floor((CASE WHEN nd < {k} THEN CAST(nd AS DOUBLE)
                   ELSE ({k} - 1) / (CAST(hv AS DOUBLE)
                                     / 18446744073709551616.0) END)
                  * 1000000 + 0.5) / 1000000 AS approx_distinct
           FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
                        count(*) OVER () AS nd
                 FROM (SELECT DISTINCT
                         md5_number_lower(CAST({c} AS VARCHAR)) AS hv
                       FROM {table} WHERE {c} IS NOT NULL))
           WHERE rn = least(nd, {k}))
        """)
    return " UNION ALL ".join(parts)


def void_stats(triples):
    """W3C VoID-style property-partition statistics over the deduped
    triple store: (predicate, n_triples, n_subjects, n_objects) — the
    void:triples / void:distinctSubjects / void:distinctObjects
    descriptors every published RDF dataset ships, and the first
    profile anyone pulls of a freshly-built KG (reference analogue:
    octofludb exposes no dataset profile; this is profile_columns'
    idea applied to the graph itself).

    Scale shape: the triple count per predicate is a map-side partial
    combine (predicate vocabulary is tiny); the two distinct counts
    each ride ONE distinct exchange over slim 2-column pairs followed
    by a partial-combine count; the three predicate-keyed tables meet
    in two stats-gated hash joins.  Nothing wider than (predicate,
    value) ever shuffles."""
    from octoray.query import (distinct_values, hash_join,
                               sorted_groupby_count)

    nt = sorted_groupby_count(triples.select_columns(["predicate"]),
                              ["predicate"], alias="n_triples")
    ns = sorted_groupby_count(
        distinct_values(triples.select_columns(["predicate", "subject"]),
                        ["predicate", "subject"]),
        ["predicate"], alias="n_subjects")
    no = sorted_groupby_count(
        distinct_values(triples.select_columns(["predicate", "object"]),
                        ["predicate", "object"]),
        ["predicate"], alias="n_objects")
    return hash_join(hash_join(nt, ns, on="predicate"), no, on="predicate")


def sql_void_stats(src: str) -> str:
    """DuckDB twin of void_stats; boundary: raw emitted triples (the
    dedup is re-derived here, like every KG oracle)."""
    return f"""
        WITH d AS (SELECT DISTINCT subject, predicate, object,
                          object_datatype FROM {src})
        SELECT predicate, count(*) AS n_triples,
               count(DISTINCT subject) AS n_subjects,
               count(DISTINCT object) AS n_objects
        FROM d GROUP BY predicate
    """


def predicate_ranges(triples):
    """VoID-style range profile one level deeper than void_stats:
    per (predicate, object_datatype) the triple count and the
    lexical min/max object — the datatype/range audit that catches
    mis-typed emissions (a date under xsd:integer, a URI under a
    literal predicate) before they poison downstream queries.

    One map-side partial (count/min/max per block per key) + ONE tiny
    key sort + block-local final combine; object values never shuffle
    beyond the per-block winners."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "predicate": t.column("predicate").to_pylist(),
            "object_datatype": t.column("object_datatype").to_pylist(),
            "object": t.column("object").to_pylist()})
        g = df.groupby(["predicate", "object_datatype"], sort=False)
        out = pd.DataFrame({
            "n": g.size().astype("int64"),
            "min_lex": g["object"].min(),
            "max_lex": g["object"].max(),
        }).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return df
        g = df.groupby(["predicate", "object_datatype"], sort=False)
        return pd.DataFrame({
            "n": g["n"].sum().astype("int64"),
            "min_lex": g["min_lex"].min(),
            "max_lex": g["max_lex"].max(),
        }).reset_index()

    partials = triples.map_batches(partial, batch_format="pyarrow")
    return colocated_sort(partials, ["predicate", "object_datatype"]).map_batches(
        final, batch_format="pandas", batch_size=None)


def sql_predicate_ranges(src: str) -> str:
    """DuckDB twin; boundary: raw emitted triples (dedup re-derived
    like every KG oracle)."""
    return f"""
        WITH d AS (SELECT DISTINCT subject, predicate, object,
                          object_datatype FROM {src})
        SELECT predicate, object_datatype, count(*) AS n,
               min(object) AS min_lex, max(object) AS max_lex
        FROM d GROUP BY 1, 2
    """


def predicate_functionality(triples):
    """Ontology-induction signal: per predicate, how functional is it
    — does each subject carry at most one object?  (predicate,
    n_subjects, n_multi, functionality = 1 - n_multi/n_subjects,
    rounded half-up to 6) — the schema-discovery stat that separates
    key-like predicates (strain_name, date) from set-valued ones
    (has_segment, locatedIn).

    Two chained slim combine-counts (per (predicate, subject) object
    count, then per predicate), vectorized threshold — the object
    values themselves never shuffle."""
    import pandas as pd

    from octoray.query import distinct_values, sorted_groupby_count

    po = distinct_values(
        triples.map_batches(
            lambda t: pa.table({"predicate": t.column("predicate"),
                                "subject": t.column("subject"),
                                "object": t.column("object")}),
            batch_format="pyarrow"),
        ["predicate", "subject", "object"])
    per_subj = sorted_groupby_count(
        po.select_columns(["predicate", "subject"]),
        ["predicate", "subject"], alias="n_obj")

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({
                "predicate": pd.Series([], dtype=object),
                "n_subjects": pd.Series([], dtype="int64"),
                "n_multi": pd.Series([], dtype="int64")})
        g = df.groupby("predicate", sort=False)
        return pd.DataFrame({
            "n_subjects": g.size().astype("int64"),
            "n_multi": g["n_obj"].apply(
                lambda s: int((s > 1).sum())).astype("int64"),
        }).reset_index()

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return df.assign(functionality=pd.Series([], dtype="float64"))
        g = df.groupby("predicate", sort=False)
        out = pd.DataFrame({
            "n_subjects": g["n_subjects"].sum().astype("int64"),
            "n_multi": g["n_multi"].sum().astype("int64"),
        }).reset_index()
        out["functionality"] = np.floor(
            (1.0 - out["n_multi"] / out["n_subjects"]) * 1e6 + 0.5) / 1e6
        return out

    partials = per_subj.map_batches(partial, batch_format="pandas")
    return colocated_sort(partials, ["predicate"]).map_batches(
        final, batch_format="pandas", batch_size=None)


def sql_predicate_functionality(src: str) -> str:
    return f"""
        WITH d AS (SELECT DISTINCT predicate, subject, object FROM {src}),
        ps AS (SELECT predicate, subject, count(*) AS n_obj
               FROM d GROUP BY 1, 2),
        a AS (SELECT predicate, count(*) AS n_subjects,
                     CAST(sum(CASE WHEN n_obj > 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_multi
              FROM ps GROUP BY 1)
        SELECT predicate, n_subjects, n_multi,
               floor((1.0 - n_multi * 1.0 / n_subjects) * 1000000 + 0.5)
                 / 1000000 AS functionality
        FROM a
    """


def predicate_symmetry(triples):
    """Ontology-induction signal #2: per uri-valued predicate, how
    often the REVERSE triple also exists — (predicate, n_edges,
    n_symmetric, symmetry) flags owl:SymmetricProperty candidates
    (sameAs-like relations) vs strictly directed ones (locatedIn).

    One distinct slim pass + a swapped-composite-key self semi-join
    per the reciprocity pattern, keyed so one exchange covers ALL
    predicates at once."""
    import pyarrow.compute as pc

    import pandas as pd

    from octoray.query import distinct_values, semi_join_auto

    def uri_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("object_datatype"),
                              pa.scalar("uri")))
        p = t.column("predicate").cast(pa.string())
        s = t.column("subject").cast(pa.string())
        o = t.column("object").cast(pa.string())
        k = pc.binary_join_element_wise(p, s, o, "\x1f")
        rk = pc.binary_join_element_wise(p, o, s, "\x1f")
        return pa.table({"predicate": p, "k": k, "rk": rk})

    rows = distinct_values(
        triples.map_batches(uri_rows, batch_format="pyarrow"),
        ["predicate", "k", "rk"]).materialize()
    sym = semi_join_auto(rows, "k", rows.select_columns(["rk"]),
                         key_col="rk")

    from octoray.query import sorted_groupby_count

    ne = sorted_groupby_count(rows.select_columns(["predicate"]),
                              ["predicate"], alias="n_edges")
    ns = sorted_groupby_count(sym.select_columns(["predicate"]),
                              ["predicate"],
                              alias="n_symmetric").materialize()

    from octoray.query import hash_join

    if ns.count() == 0:
        # fully asymmetric graph: an empty right side reaches the
        # pandas merge without typed columns — short-circuit
        j = ne.map_batches(
            lambda t: t.append_column(
                "n_symmetric", pa.array([0] * t.num_rows, pa.int64())),
            batch_format="pyarrow")
    else:
        j = hash_join(ne, ns, on="predicate", how="left_outer")

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        nsym = df["n_symmetric"].fillna(0).astype("int64")
        return pd.DataFrame({
            "predicate": df["predicate"],
            "n_edges": df["n_edges"].astype("int64"),
            "n_symmetric": nsym,
            "symmetry": np.floor(nsym / df["n_edges"] * 1e6 + 0.5) / 1e6})

    return j.map_batches(finish, batch_format="pandas")


def sql_predicate_symmetry(src: str) -> str:
    return f"""
        WITH d AS (SELECT DISTINCT predicate, subject, object FROM {src}
                   WHERE object_datatype = 'uri'),
        s AS (SELECT d.predicate,
                     CASE WHEN r.subject IS NOT NULL THEN 1 ELSE 0 END
                       AS is_sym
              FROM d LEFT JOIN d r
                ON d.predicate = r.predicate
               AND d.subject = r.object AND d.object = r.subject)
        SELECT predicate, count(*) AS n_edges,
               CAST(sum(is_sym) AS BIGINT) AS n_symmetric,
               floor(sum(is_sym) * 1.0 / count(*) * 1000000 + 0.5)
                 / 1000000 AS symmetry
        FROM s GROUP BY predicate
    """
