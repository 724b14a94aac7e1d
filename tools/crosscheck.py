#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify output parquet against its DuckDB oracle SQL.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    """Sort columns by name, then rows; normalize floats/None."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(round(v, 9))
        return repr(v)

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional third arg: comma-separated key subset (local iteration)
    keys = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if keys is not None:
        oracle = {k: v for k, v in oracle.items() if k in keys}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            ecols, erows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}")
            n_fail += 1
        elif grows != erows:
            diff = [(a, b) for a, b in zip(grows, erows) if a != b]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows; first diffs: {diff[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
