#!/usr/bin/env python3
"""Partition-invariance check: two graft.Verify dumps produced at
DIFFERENT parallelism (e.g. SPARK_GRAFT_CPUS=4 vs 7) must be
row-identical for every query — same normalization as the oracle gate
(float BIT PATTERNS, no tolerance). An engine whose answers depend on
the partition count cannot be oracle-gated, cached, or trusted across
cluster resizes.

Usage: python3 tools/check_invariance.py <outDirA> <outDirB>
"""
import sys

import duckdb

from check_oracle import rows_of


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    import json
    import os

    # union BOTH dumps' query sets (oracle_sql.json keys + result
    # subdirectories): a query present in only one dump — e.g. a newer
    # build with extra queries on one side — must FAIL the missing
    # side's read, not be silently skipped
    def names_of(d):
        names = set()
        try:
            names |= set(json.load(open(f"{d}/oracle_sql.json")))
        except FileNotFoundError:
            pass
        names |= {n for n in os.listdir(d)
                  if os.path.isdir(os.path.join(d, n))}
        return names

    names = sorted(names_of(a_dir) | names_of(b_dir))
    n_pass = n_fail = 0
    for name in names:
        try:
            ga = duckdb.sql(f"SELECT * FROM '{a_dir}/{name}/*.parquet'").df()
            gb = duckdb.sql(f"SELECT * FROM '{b_dir}/{name}/*.parquet'").df()
            ca, ra = rows_of(ga)
            cb, rb = rows_of(gb)
            if ca != cb:
                print(f"FAIL {name}: columns {ca} != {cb}")
                n_fail += 1
            elif ra != rb:
                bad = sum(1 for x, y in zip(ra, rb) if x != y) \
                    + abs(len(ra) - len(rb))
                first = next(((x, y) for x, y in zip(ra, rb) if x != y),
                             ("<row-count>", f"{len(ra)} vs {len(rb)}"))
                print(f"FAIL {name}: {bad} differing rows; first: "
                      f"a={first[0]} b={first[1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(ra)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
