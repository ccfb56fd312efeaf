"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf dir, compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive values).

Run: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        if np.issubdtype(df[c].dtype, np.floating):
            # 12 significant digits BEFORE the absolute 6-decimal round:
            # a double SUM over 1e8+ rows differs between engines by
            # summation order alone (measured at sf100: q01 group sums
            # of magnitude 5.3e12 drifting at the 1e-1 level, relative
            # error 3e-14) — absolute rounding can't absorb relative
            # drift at 1e12 magnitudes. Values below 1e6 carry <= 12
            # significant digits after round(6) anyway, so gate-scale
            # behavior is unchanged.
            df[c] = df[c].map(
                lambda x: float(f"{x:.12g}") if pd.notna(x) else x
            ).round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from h3_rs_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only) [{dt:.1f}s]")
            if len(got) == 0:
                failures.append(name)
                print(f"FAIL {name}: zero rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        g, x = normalize(got), normalize(exp)
        if list(g.columns) != list(x.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            continue
        if len(g) != len(x):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            continue
        try:
            pd.testing.assert_frame_equal(
                g, x, check_dtype=False, check_exact=False, rtol=0, atol=1e-6
            )
            print(f"ok   {name}: rows={len(g)} MATCH [{dt:.1f}s]")
        except AssertionError as e:
            failures.append(name)
            print(f"FAIL {name}: value mismatch: {str(e)[:500]}")
    print("\n===", "ALL PASS" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
