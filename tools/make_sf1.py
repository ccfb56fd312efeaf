"""Synthesize an sf1-scale dataset for the sf-independence proof run
(VERDICT r4 #3): a 10x FK-PRESERVING key-shifted replication of the
driver's sf0.1 tables into a writable directory (default /tmp/sf1).

Replica r shifts every table's primary key — and every foreign key, by
the SAME per-table shift — by r * (max natural key + 1), so join
structure, value distributions, and skew are preserved exactly while
keys never collide across replicas. Because the catalog's derived
geography is pure key arithmetic, shifted keys produce genuinely NEW
points (not 10 copies of the same geography); text/embedding payloads
ARE duplicated across replicas, which deliberately stress-tests the
dedup family (10-member exact-duplicate groups, far below the 10k
bucket cap, so the 100%-exact-recall contract must still hold).
region/nation stay constant — TPC-H's fixed dimension tables don't
scale with sf.

Run: python tools/make_sf1.py [dst_dir] [replicas]
Then: python tools/check_correctness.py /tmp/sf1
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> list of (column, shift_source_table_key) for key columns;
# every other column passes through unchanged
KEYED = {
    "customer": [("c_custkey", "c")],
    "supplier": [("s_suppkey", "s")],
    "part": [("p_partkey", "p")],
    "orders": [("o_orderkey", "o"), ("o_custkey", "c")],
    "lineitem": [
        ("l_orderkey", "o"),
        ("l_partkey", "p"),
        ("l_suppkey", "s"),
    ],
    "events": [("event_id", "e"), ("user_id", "u")],
    "documents": [("doc_id", "d")],
    "embeddings": [("vec_id", "v")],
}

SHIFT_SQL = {
    "c": ("customer", "c_custkey"),
    "s": ("supplier", "s_suppkey"),
    "p": ("part", "p_partkey"),
    "o": ("orders", "o_orderkey"),
    "e": ("events", "event_id"),
    "u": ("events", "user_id"),
    "d": ("documents", "doc_id"),
    "v": ("embeddings", "vec_id"),
}


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    shifts = {}
    for tag, (table, key) in SHIFT_SQL.items():
        shifts[tag] = int(
            con.execute(
                f"SELECT MAX({key}) + 1 FROM "
                f"read_parquet('{SRC}/{table}.parquet')"
            ).fetchone()[0]
        )

    for name in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{name}.parquet", f"{dst}/{name}.parquet")
        print(f"{name}: copied (fixed dimension)")

    for table, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchall()
        ]
        keyed = dict(keys)
        sel = ", ".join(
            f"{c} + r * {shifts[keyed[c]]} AS {c}" if c in keyed else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{SRC}/{table}.parquet'), "
            f"range({replicas}) t(r)) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({replicas}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
