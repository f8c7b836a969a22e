#!/usr/bin/env python3
"""Regression tests for tools/check_oracle.py's soundness guarantees
(build-time tooling test, run with plain `python3 tools/test_check_oracle.py`).

The sf1 oracle gate's authority rests on check_oracle.py, so its known
false-pass paths stay closed by test:

  1. NaN-vs-finite float divergence must be a hard FAIL, never 'ulp'
     (pandas .max() skips NaN, so an unguarded worst_rel stays 0.0).
  2. --only merge mode must compute the exit code from the MERGED
     artifact: a re-check of one now-green query must still exit 1
     while a standing 'fail' entry remains in the artifact.
  3. A genuine sub-1e-9 float divergence still classifies 'ulp' and
     exits 0 (the class the NaN guard must not destroy).

Each scenario builds a tiny sfDir + Verify-style outDir with DuckDB
(parquet write via COPY), runs check_oracle.py as a subprocess, and
asserts on exit code + artifact JSON.
"""
import json, os, shutil, subprocess, sys, tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
CHECKER = os.path.join(HERE, "check_oracle.py")


def build_case(root, spark_sql, oracle_sql, qname="q01_t"):
    """sfDir with one table + outDir with one query result and oracle."""
    sf_dir = os.path.join(root, "sf")
    out_dir = os.path.join(root, "out")
    qdir = os.path.join(out_dir, qname)
    os.makedirs(sf_dir, exist_ok=True)
    os.makedirs(qdir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1, 1.5), (2, 2.5)) v(id, x)")
    con.execute(f"COPY t TO '{sf_dir}/t.parquet' (FORMAT parquet)")
    con.execute(
        f"COPY ({spark_sql}) TO '{qdir}/part-0.parquet' (FORMAT parquet)")
    with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
        json.dump({qname: oracle_sql}, f)
    con.close()
    return sf_dir, out_dir


def run_checker(sf_dir, out_dir, *extra):
    p = subprocess.run(
        [sys.executable, CHECKER, sf_dir, out_dir, *extra],
        capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


failures = []


def check(name, cond, detail=""):
    status = "ok  " if cond else "FAIL"
    print(f"[test-check-oracle] {status} {name}  {detail}")
    if not cond:
        failures.append(name)


# --- 1. NaN-vs-finite float divergence must FAIL, not pass as ulp -----
root = tempfile.mkdtemp(prefix="chk_nan_")
try:
    # Spark-side result has NaN where the oracle has a finite value; the
    # other rows match exactly, so every mismatch is in a float column —
    # the exact shape that used to slip through as 'ulp'.
    sf, out = build_case(
        root,
        spark_sql="SELECT 1 AS id, 'NaN'::DOUBLE AS x "
                  "UNION ALL SELECT 2, 2.5::DOUBLE ORDER BY id",
        oracle_sql="SELECT id::INTEGER AS id, x::DOUBLE AS x FROM t ORDER BY id")
    art = os.path.join(root, "r.json")
    rc, log_txt = run_checker(sf, out, "--json", art)
    rec = json.load(open(art))
    st = rec["queries"]["q01_t"]["status"]
    check("nan_vs_finite_is_fail", rc == 1 and st == "fail",
          f"rc={rc} status={st}")
finally:
    shutil.rmtree(root, ignore_errors=True)

# --- 2. merge mode: standing fail in the artifact keeps exit 1 --------
root = tempfile.mkdtemp(prefix="chk_merge_")
try:
    # the re-checked query is green...
    sf, out = build_case(
        root,
        spark_sql="SELECT 1 AS id, 1.5::DOUBLE AS x "
                  "UNION ALL SELECT 2, 2.5::DOUBLE ORDER BY id",
        oracle_sql="SELECT id::INTEGER AS id, x::DOUBLE AS x FROM t ORDER BY id")
    # ...but the pre-existing artifact carries an unrelated standing fail
    art = os.path.join(root, "r.json")
    with open(art, "w") as f:
        json.dump({"queries": {
            "q01_t": {"status": "fail", "rows": 2, "detail": "stale"},
            "q99_broken": {"status": "fail", "rows": 5, "detail": "standing"},
        }}, f)
    rc, log_txt = run_checker(sf, out, "--json", art, "--only", "q01_t")
    rec = json.load(open(art))
    st1 = rec["queries"]["q01_t"]["status"]
    st99 = rec["queries"]["q99_broken"]["status"]
    check("merge_mode_counts_standing_fails",
          rc == 1 and st1 == "ok" and st99 == "fail" and rec["n_fail"] == 1,
          f"rc={rc} q01={st1} q99={st99} n_fail={rec.get('n_fail')}")
finally:
    shutil.rmtree(root, ignore_errors=True)

# --- 3. genuine tiny float noise still classifies ulp, exit 0 ---------
root = tempfile.mkdtemp(prefix="chk_ulp_")
try:
    sf, out = build_case(
        root,
        spark_sql="SELECT 1 AS id, (1.5::DOUBLE + 1e-13) AS x "
                  "UNION ALL SELECT 2, 2.5::DOUBLE ORDER BY id",
        oracle_sql="SELECT id::INTEGER AS id, x::DOUBLE AS x FROM t ORDER BY id")
    art = os.path.join(root, "r.json")
    rc, log_txt = run_checker(sf, out, "--json", art)
    rec = json.load(open(art))
    st = rec["queries"]["q01_t"]["status"]
    check("sub_1e9_rel_err_is_ulp_pass", rc == 0 and st == "ulp",
          f"rc={rc} status={st}")
finally:
    shutil.rmtree(root, ignore_errors=True)

if failures:
    print(f"[test-check-oracle] {len(failures)} FAILURES: {failures}")
    sys.exit(1)
print("[test-check-oracle] all pass")
