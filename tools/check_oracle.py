#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
sfDir parquet tables, and compares row counts, sorted column names,
and cell values EXACTLY — floats included. The driver's gate hashes
cell values bit-for-bit, so a tolerance here would pass queries the
driver fails (this bit round 1: 5 hash mismatches slipped through a
1e-9 tolerance). Pass --tol for the old approximate mode when
debugging how far off a value is.
"""
import json
import math
import struct
import sys

import duckdb

TOL = False


def norm_cell(v):
    """Normalize a cell to a string that is equal iff the driver's
    value hash would be equal: floats map to their IEEE bit pattern
    (so 99111 vs 99111.0 — e.g. a DuckDB HUGEINT sum surfacing as
    float64 in pandas — is a MISMATCH, and so is 0.0 vs -0.0), ints
    to their decimal string regardless of width (int32 vs int64 is
    fine; the driver stringifies)."""
    if v is None:
        return None
    import decimal
    import numpy as np
    if isinstance(v, (bool, np.bool_)):
        return "b:" + str(bool(v))
    if isinstance(v, (float, np.floating)):
        # np.floating catches np.float32, which is NOT a float
        # subclass and previously fell through to the raw-value
        # branch; widening to float64 is exact for every float32.
        f = float(v)
        if math.isnan(f):
            return "f:NaN"
        return "f:" + struct.pack(">d", f).hex()
    if isinstance(v, (int, np.integer)):
        return "i:" + str(int(v))
    if isinstance(v, decimal.Decimal):
        # str(), not normalize(): the driver stringifies, so a
        # scale-only difference (100.00 vs 100) must be a MISMATCH,
        # and normalize()'s exponent form (1E+2) would hide it.
        return "d:" + str(v)
    if hasattr(v, "isoformat"):
        return "t:" + v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return "x:" + v.hex()
    return v


def rows_of(df):
    cols = sorted(df.columns)
    recs = df[cols].to_dict("records")
    rows = [tuple(norm_cell(r[c]) for c in cols) for r in recs]
    return cols, sorted(rows, key=lambda t: tuple(str(x) for x in t))


def _unbits(s):
    return struct.unpack(">d", bytes.fromhex(s[2:]))[0]


def cmp_cell(a, b):
    if a == b:
        return True
    if TOL:
        # approximate mode: compare float bit patterns numerically,
        # and let int/float dtype mismatches through
        def num(v):
            if isinstance(v, str) and v.startswith("f:") and v != "f:NaN":
                return _unbits(v)
            if isinstance(v, str) and v.startswith(("i:", "d:")):
                return float(v[2:])
            return None
        x, y = num(a), num(b)
        if x is not None and y is not None:
            return x == y or abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cmp_cell(x, y) for x, y in zip(a, b))
    return False


def main():
    global TOL
    args = [a for a in sys.argv[1:] if a != "--tol"]
    TOL = "--tol" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
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
