#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), registers
each fixture parquet as a DuckDB view named after the table, runs every
oracle SQL, and compares against the Spark result parquet dumped by Verify:
columns sorted by name, rows compared in order, exact value equality
(floats compared bitwise; small diffs reported with context).

This is a builder-side debugging tool only — the engine itself is pure
Scala/Spark.
"""
import json
import math
import os
import sys
import glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    return v


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    result_dirs = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))

    n_pass = n_fail = 0
    for name in result_dirs:
        parts = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not parts:
            print(f"[FAIL] {name}: no spark parquet output")
            n_fail += 1
            continue
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet({parts!r})")
        s_cols = sorted(spark_rel.columns)
        s_rows = con.sql(
            "SELECT " + ", ".join(f'"{c}"' for c in s_cols)
            + f" FROM read_parquet({parts!r})").fetchall()

        if name not in oracle:
            status = "rows>0" if len(s_rows) > 0 else "EMPTY"
            print(f"[{'ok  ' if s_rows else 'FAIL'}] {name}: no oracle, {status}, {len(s_rows)} rows")
            n_pass += bool(s_rows)
            n_fail += not s_rows
            continue

        try:
            o_rel = con.sql(oracle[name])
            o_cols = sorted(o_rel.columns)
            o_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in o_cols)
                + f" FROM ({oracle[name]}) oracle_q").fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue

        if s_cols != o_cols:
            print(f"[FAIL] {name}: column mismatch spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        s_types = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
        o_types = dict(zip(o_rel.columns, [str(t) for t in o_rel.types]))
        type_diff = {c: (s_types[c], o_types[c]) for c in s_types
                     if s_types[c] != o_types[c]}
        if type_diff:
            print(f"[WARN] {name}: dtype diff {type_diff}")
        if len(s_rows) != len(o_rows):
            print(f"[FAIL] {name}: row count spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            for j, (a, b) in enumerate(zip(sr, orow)):
                if not values_equal(norm(a), norm(b)):
                    bad = (i, s_cols[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"[FAIL] {name}: first diff row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(s_rows)} rows, {len(s_cols)} cols")
            n_pass += 1

    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
