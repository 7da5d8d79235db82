#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 oracle compare (SURVEY §5.2.2).

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB 1.0.0 with bare table
names bound as views over <sfDir>/*.parquet, and compares values exactly:
columns sorted by name, rows in result order, NaN-safe, bitwise for floats.
Exit code 1 if any query mismatches.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    # decimals -> exact string; floats stay floats (bitwise compare)
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v.hex())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures, passed, skipped = [], 0, 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            failures.append((name, "spark result missing (query failed in Verify)"))
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            failures.append((name, f"cannot read spark result: {e}"))
            continue
        try:
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {str(e)[:200]}"))
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            failures.append((name, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"))
            continue
        # driver sorts columns by name before hashing
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = [tuple(canon(r[i]) for i in s_idx) for r in spark_rows]
        dk = [tuple(canon(r[i]) for i in d_idx) for r in duck_rows]
        if len(s) != len(dk):
            failures.append((name, f"row count: spark={len(s)} duck={len(dk)}"))
            continue
        bad = None
        for i, (a, b) in enumerate(zip(s, dk)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            cols = sorted(spark_cols)
            diffs = [(cols[j], a[j], b[j]) for j in range(len(cols)) if a[j] != b[j]]
            failures.append((name, f"row {i} differs: {diffs[:4]}"))
        else:
            passed += 1
            print(f"  OK   {name} ({len(s)} rows)")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg}")
    print(f"\npassed={passed} failed={len(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
