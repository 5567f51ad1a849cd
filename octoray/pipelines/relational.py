"""Relational pipelines over the TPC-H-ish test tables.

These exercise the engine's join/aggregate family (SURVEY.md §2.5-2.6)
on tables with clean DuckDB oracles: every helper here has a matching
SQL string in ``__ray_entry__.oracle_sql`` and identical output column
names.  Float aggregates are rounded identically on both sides.

Shapes used (and the reference operator they evidence):
  pricing_summary      combined groupby-aggregate (A1/A5 family)
  orders_per_nation    chained hash joins on dimension keys (J3)
  customers_no_urgent_orders  anti-join via broadcast key set (J8)
  building_priority    broadcast semi-join then aggregate (J7)
  nation_segments      GROUP_CONCAT(DISTINCT, sorted, '+') pivot (A1)
  order_quarters       scalar date function F9 (quarter_from_date)
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from octoray.functions.dates import quarter_from_date
from octoray.query import hash_join
from octoray.util import cents


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped rollup on lineitem (column-pruned read).

    Exact cross-engine floats (octoray.util): quantities are integral
    and prices cents-exact, so both are summed as int64 — summation
    order then cannot matter — and converted to float by ONE division
    at the end, the same op the DuckDB oracle runs."""
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def pre(t: pa.Table) -> pa.Table:
        # partial combine INSIDE the batch (Arrow group_by): the
        # all-to-all exchange then moves ~|groups| rows per block, not
        # |rows| — the pre-aggregation pattern SURVEY.md §4.3 mandates
        # for the wide steps at scale.
        proj = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_i": pc.cast(pc.round(t.column("l_quantity"), 0), pa.int64()),
                "price_c": cents(t.column("l_extendedprice")),
            }
        )
        g = proj.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("qty_i", "sum"), ("price_c", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "qty_sum_i", "price_sum_c", "n"]
        )

    g = (
        li.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_sum_i", alias_name="qty_sum_i"),
            Sum("price_sum_c", alias_name="price_sum_c"),
            Sum("n", alias_name="count_order"),
        )
    )

    def post(t: pa.Table) -> pa.Table:
        qty = pc.cast(t.column("qty_sum_i"), pa.float64())
        n = pc.cast(t.column("count_order"), pa.float64())
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": qty,
                "sum_base_price": pc.divide(pc.cast(t.column("price_sum_c"), pa.float64()), 100.0),
                "avg_qty": pc.divide(qty, n),
                "count_order": t.column("count_order"),
            }
        )

    return g.map_batches(post, batch_format="pyarrow")


def orders_per_nation(sf_dir: str):
    """orders -> customer -> nation joins (stats-gated broadcast when
    the dimension side is small), then a map-side-combined count per
    nation (25 keys over 150k rows: the all-to-all moves ~25 partial
    rows per block, not orders)."""
    from octoray.query import combined_groupby_count

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    j = hash_join(orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=8)
    j = hash_join(j, nation, on="c_nationkey", right_on="n_nationkey", num_partitions=8)
    return combined_groupby_count(j.select_columns(["n_name"]), ["n_name"],
                                  alias="n_orders")


def customers_no_urgent_orders(sf_dir: str):
    """Customers with no 1-URGENT order (anti-join J8): (c_custkey).

    The key set (distinct urgent custkeys) is computed DISTRIBUTED —
    a filter + distinct aggregate, not a driver-side scan — then the
    stats-gated broadcast-vs-hash-join switch applies it (the
    NOT-EXISTS pattern of fetch-unclassified-swine.rq:8-12)."""
    from octoray.query import semi_join_auto

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    urgent = orders.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("o_orderpriority"), pa.scalar("1-URGENT"))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    return semi_join_auto(cust, "c_custkey", urgent, key_col="o_custkey", anti=True)


def building_priority(sf_dir: str):
    """Orders from BUILDING-segment customers, per priority (semi-join
    J7) — distributed distinct key set + broadcast switch."""
    from octoray.query import semi_join_auto

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    building = cust.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("c_mktsegment"), pa.scalar("BUILDING"))
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    sel = semi_join_auto(orders, "o_custkey", building, key_col="c_custkey")
    from octoray.query import combined_groupby_count

    return combined_groupby_count(sel.select_columns(["o_orderpriority"]),
                                  ["o_orderpriority"], alias="n_orders")


def nation_segments(sf_dir: str):
    """Per nation: '+'-joined sorted distinct market segments — the
    GROUP_CONCAT(DISTINCT ...; separator='+') convention of
    masterlist.rq:8-21, over customer x nation."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    j = hash_join(cust, nation, on="c_nationkey", right_on="n_nationkey", num_partitions=8)

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        segs = sorted(set(g["c_mktsegment"]))
        return pd.DataFrame({"n_name": [g["n_name"].iloc[0]], "segments": ["+".join(segs)]})

    from octoray.query import sorted_map_groups

    return sorted_map_groups(j, ["n_name"], concat)


def order_quarters(sf_dir: str):
    """Orders per calendar quarter string (F9 quarter_from_date)."""
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", columns=["o_orderdate"])

    def q(t: pa.Table) -> pa.Table:
        days = pc.strftime(t.column("o_orderdate"), format="%Y-%m-%d")
        quarters = [quarter_from_date(d) for d in days.to_pylist()]
        return pa.table({"quarter": pa.array(quarters, pa.string())})

    return orders.map_batches(q, batch_format="pyarrow").groupby("quarter").aggregate(
        Count(alias_name="n_orders")
    )
