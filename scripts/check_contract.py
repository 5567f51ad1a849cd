"""Driver-mimic: run every __ray_entry__ query against its DuckDB
oracle at a given sf_dir and report row-count / schema / exact-value
matches (the CORRECTNESS_r{N}.json gate, approximated locally).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA cols ray={sorted(a.columns)} sql={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS ray={len(a)} sql={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            eq = av.astype(object) == bv.astype(object)
        if not np.all(eq):
            i = int(np.argmin(eq))
            return f"VALUES col={c} row={i} ray={av[i]!r} sql={bv[i]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # accept both space- and comma-separated query filters; a name that
    # matches nothing is an ERROR, not a vacuous pass
    only = set()
    for a in sys.argv[2:]:
        if a != "--only":
            only |= {x for x in a.split(",") if x}

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    n_fail = 0
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL  unknown query filter(s): {sorted(unknown)}")
        n_fail += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:22s} ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t1 = time.time()
        if name in oracles:
            try:
                sql_df = con.sql(oracles[name]).df()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name:22s} sql error: {type(e).__name__}: {e}")
                n_fail += 1
                continue
            verdict = compare(ray_df, sql_df)
        else:
            verdict = f"rows-only ({len(ray_df)} rows)"
        ok = verdict == "OK" or verdict.startswith("rows-only")
        n_fail += 0 if ok else 1
        print(f"{'ok' if ok else 'FAIL':4s}  {name:22s} {t1 - t0:6.1f}s  {verdict}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
