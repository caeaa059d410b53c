#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query directory under verifyOutDir: load the Spark parquet
result, run the matching oracle SQL (from oracle_sql.json) in DuckDB
with every test table registered as a view, sort columns by name,
sort rows, and compare cell-by-cell (exact; doubles must be
bit-identical, mirroring a hash compare).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(
        (x is None, str(type(x)), str(x)) for x in r))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_types = dict(zip(spark_rel.columns, map(str, spark_rel.types)))
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
            duck_rel = con.sql(sql)
            d_types = dict(zip(duck_rel.columns, map(str, duck_rel.types)))
            d_cols, d_rows = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        mismatched = {c: (s_types[c], d_types[c]) for c in s_cols
                      if s_types[c] != d_types[c]}
        if mismatched:
            print(f"FAIL {name}: dtype mismatch {mismatched}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            for j, (x, y) in enumerate(zip(a, b)):
                same = (x == y) or (x is None and y is None) or (
                    isinstance(x, float) and isinstance(y, float)
                    and math.isnan(x) and math.isnan(y))
                if not same:
                    bad = (i, s_cols[j], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
