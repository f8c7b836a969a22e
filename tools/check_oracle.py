#!/usr/bin/env python3
"""Self-check harness (build-time only, not part of the library): mimics the
driver's correctness gate. Reads each query result parquet dumped by
graft.Verify, runs the corresponding oracle SQL in DuckDB against the same
testdata tables, and compares values column-by-column (columns sorted by
name, exact equality).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
n_pass = n_fail = 0
for qname in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, qname)
    if not os.path.isdir(qdir):
        continue
    got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    got = got[sorted(got.columns)]
    if qname not in oracle:
        print(f"  [rows-only] {qname}: {len(got)} rows")
        continue
    exp = con.execute(oracle[qname]).fetchdf()
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"columns {list(got.columns)} != {list(exp.columns)}")
    elif len(got) != len(exp):
        status.append(f"rows {len(got)} != {len(exp)}")
    else:
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype) != str(b.dtype):
                status.append(f"dtype[{c}] {a.dtype} != {b.dtype}")
            neq = (a != b) & ~(a.isna() & b.isna())
            if neq.any():
                i = neq.idxmax()
                status.append(f"value[{c}] row {i}: {a[i]!r} != {b[i]!r} ({int(neq.sum())} diffs)")
    if status:
        n_fail += 1
        print(f"  [FAIL] {qname}: " + "; ".join(status[:4]))
    else:
        n_pass += 1
        print(f"  [ok]   {qname}: {len(got)} rows")
print(f"passed {n_pass}, failed {n_fail}")
sys.exit(1 if n_fail else 0)
