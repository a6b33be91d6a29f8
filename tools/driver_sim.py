"""Local simulation of the verify driver's correctness gate.

For each registered query with an oracle, runs the Spark query AND the
DuckDB oracle at the given scale factor on a VANILLA SparkSession (the
driver does not use our tuned session factory), canonicalizes both frames
the way the driver does (columns sorted by name, rows sorted over all
columns), and compares row count / column names / values.

Usage::

    python tools/driver_sim.py                 # all oracle-backed queries
    python tools/driver_sim.py q1 q2 ...       # a subset
    SIM_SF_DIR=/root/testdata/sf0.001 python tools/driver_sim.py ...
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _values(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(None if pd.isna(v) else v for v in row))
    return out


def main(names: list[str]) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    todo = names or [k for k in qs if k in oracles]
    n_fail = 0
    for name in todo:
        t0 = time.time()
        try:
            sdf = _canon(qs[name](spark, SF_DIR).toPandas())
            if name not in oracles:
                print(f"  {name}: rows-only, spark_rows={len(sdf)} "
                      f"({time.time() - t0:.1f}s)")
                continue
            odf = _canon(con.execute(oracles[name]).df())
            rows_ok = len(sdf) == len(odf)
            cols_ok = list(sdf.columns) == list(odf.columns)
            vals_ok = rows_ok and cols_ok and _values(sdf) == _values(odf)
            status = "OK" if (rows_ok and cols_ok and vals_ok) else "FAIL"
            if status == "FAIL":
                n_fail += 1
            print(f"  {name}: {status} rows={len(sdf)}/{len(odf)} "
                  f"cols_ok={cols_ok} vals_ok={vals_ok} ({time.time() - t0:.1f}s)")
            if status == "FAIL" and rows_ok and cols_ok:
                sv, ov = _values(sdf), _values(odf)
                for i, (a, b) in enumerate(zip(sv, ov)):
                    if a != b:
                        print(f"    first diff row {i}: spark={a} oracle={b}")
                        break
        except Exception as e:  # noqa: BLE001 — mirror the driver's err column
            n_fail += 1
            print(f"  {name}: ERR {type(e).__name__}: {str(e)[:300]}")
    print(f"done: {len(todo)} queries, {n_fail} failures")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
