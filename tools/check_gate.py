"""Local mirror of the driver's correctness gate: run every __spark_entry__
query on Spark AND its oracle SQL on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values.

Usage:
    python tools/check_gate.py [--sf-dir DIR] [--only q1,q2] [--oracle-only]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canon(spark_df), canon(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
                import numpy as np

                bad = ~np.isclose(
                    pd.to_numeric(a[c]), pd.to_numeric(b[c]), atol=1e-9, rtol=0, equal_nan=True
                )
            else:
                bad = av.astype(str) != bv.astype(str)
            if bad.any():
                i = int(bad.argmax())
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at sorted-row {i}: "
                    f"spark={av[i]!r} duck={bv[i]!r}"
                )
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--oracle-only", action="store_true", help="just run the SQL")
    ap.add_argument("--json", default="", help="write full result matrix to this path")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    con = duck_conn(args.sf_dir)

    spark = None
    if not args.oracle_only:
        from graphscope_spark.session import get_spark

        spark = get_spark(
            "gate-check",
            master="local[8]",
            shuffle_partitions=16,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )

    n_ok = n_fail = 0
    matrix: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            duck_df = con.execute(oracles[name]).df() if name in oracles else None
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            matrix[name] = {"ok": False, "err": f"oracle SQL error: {e}"}
            continue
        if args.oracle_only:
            n = len(duck_df) if duck_df is not None else "(no oracle)"
            print(f"ok-oracle {name}: {n} rows {time.time()-t0:.1f}s")
            continue
        try:
            spark_df = fn(spark, args.sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            matrix[name] = {"ok": False, "err": f"spark error: {type(e).__name__}: {e}"}
            continue
        problems = compare(name, spark_df, duck_df) if duck_df is not None else []
        dt = round(time.time() - t0, 1)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt}s):")
            for p in problems:
                print(f"   {p}")
            matrix[name] = {"ok": False, "rows": len(spark_df),
                            "oracle_rows": len(duck_df) if duck_df is not None else None,
                            "problems": problems, "sec": dt}
        else:
            n_ok += 1
            print(f"ok   {name}: {len(spark_df)} rows ({dt}s)")
            matrix[name] = {"ok": True, "rows": len(spark_df),
                            "oracle_rows": len(duck_df) if duck_df is not None else None,
                            "sec": dt}
    print(f"\n{n_ok} ok, {n_fail} fail")
    if args.json and not args.oracle_only:
        import json as _json

        Path(args.json).write_text(_json.dumps(
            {"sf_dir": args.sf_dir, "ok": n_ok, "fail": n_fail, "queries": matrix},
            indent=1))
        print(f"wrote {args.json}")
    if spark:
        spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
