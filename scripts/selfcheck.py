"""Mini-driver: run every queries() entry against its DuckDB oracle and
compare row count, column names, and order-insensitive values — a local
replica of the driver's correctness gate. Usage:

    python scripts/selfcheck.py [--sf-dir /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from graphiti_spark.session import get_spark

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args.names or list(qs)

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{args.sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            got = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok~  {name}: rows-only ({len(got)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        g, w = norm(got.copy()), norm(want.copy())
        status = None
        if list(g.columns) != list(w.columns):
            status = f"columns differ: spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            status = f"rowcount differ: spark={len(g)} duck={len(w)}"
        elif not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            rows = diff.any(axis=1)
            status = (f"values differ in {int(rows.sum())} rows; first:\n"
                      f"spark: {g[rows].head(2).to_dict('records')}\n"
                      f"duck:  {w[rows].head(2).to_dict('records')}")
        if status:
            print(f"FAIL {name}: {status}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
