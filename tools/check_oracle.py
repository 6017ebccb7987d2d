#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
sfDir parquet tables, and compares row counts, sorted column names,
and cell values (exact for ints/strings, tight tolerance for floats).
"""
import json
import math
import sys

import duckdb


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # decimals -> float for comparison
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_of(df):
    cols = sorted(df.columns)
    recs = df[cols].to_dict("records")
    rows = [tuple(norm_cell(r[c]) for c in cols) for r in recs]
    return cols, sorted(rows, key=lambda t: tuple(str(x) for x in t))


def cmp_cell(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cmp_cell(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.execute(sql).df()
            gc, gr = rows_of(got)
            ec, er = rows_of(exp)
            if gc != ec:
                print(f"FAIL {name}: columns {gc} != {ec}")
                n_fail += 1
                continue
            if len(gr) != len(er):
                print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(gr, er)
                   if not all(cmp_cell(x, y) for x, y in zip(a, b))]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(gr)} mismatched rows; "
                      f"first: got={bad[0][0]} exp={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
