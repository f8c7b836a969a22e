#!/usr/bin/env python3
"""Self-check harness (build-time only, not part of the library): mimics the
driver's correctness gate. Reads each query result parquet dumped by
graft.Verify, runs the corresponding oracle SQL in DuckDB against the same
testdata tables, and compares values column-by-column (columns sorted by
name, exact equality).

At scale factors above the fixtures' (sf0.1 / sf1) a second, weaker verdict
class appears: "ulp" — every mismatching column is floating-point and the
worst relative error is < 1e-9. That is cross-engine summation-order noise
(Spark's partial-aggregate tree vs DuckDB's sequential fold), not a wrong
answer; the scale gate treats it as a pass but records it separately so a
real divergence (q236-style overflow, dropped rows, wrong join) can never
hide behind the float class.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
         [--json out.json] [--only q121,q294] [--timeout secs]

--only re-checks just the named query prefixes; with --json it MERGES
into an existing artifact (post-fix re-verification without recomputing
every oracle). --timeout interrupts any single DuckDB oracle after the
given seconds and records status "timeout" (counted apart from fail):
at sf1 the deliberately-quadratic pair-family derivations can take
DuckDB hours that the store-backed Spark side amortizes away — a
timeout there is a cost statement about the ORACLE, not a correctness
verdict about the engine.
"""
import sys, json, glob, os, time, threading
import duckdb
import numpy as np

flag_vals = {"--json", "--only", "--timeout"}
args = [a for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("--") and sys.argv[i - 1] not in flag_vals]
sf_dir, out_dir = args[0], args[1]
json_out = None
if "--json" in sys.argv:
    json_out = sys.argv[sys.argv.index("--json") + 1]
only = None
if "--only" in sys.argv:
    only = [p.strip() for p in
            sys.argv[sys.argv.index("--only") + 1].split(",") if p.strip()]
timeout_s = None
if "--timeout" in sys.argv:
    timeout_s = float(sys.argv[sys.argv.index("--timeout") + 1])

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver testdata ships single files; ScaleGen corpora are
    # Spark-written directories of part files — read either layout
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    # events.ts ships under several physical encodings (TESTDATA/ScaleGen);
    # graft.Tables.events normalizes all of them to TIMESTAMP via
    # `timestamp_micros(ts div 1000)` on the raw-nanos layout — mirror
    # that here or every ts-surfacing oracle dtype-mismatches at sf1
    if name == "events":
        t = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
        if t and t[0] == "BIGINT":
            con.execute(
                f"CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) FROM '{src}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
n_pass = n_fail = n_ulp = 0
record = {}
for qname in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, qname)
    if not os.path.isdir(qdir):
        continue
    if only is not None and not any(qname.startswith(p) for p in only):
        continue
    t0 = time.time()
    # the fetch itself can fail (corrupt dump, or a stray interrupt from a
    # racing timeout timer of the PREVIOUS query) — record a fail rather
    # than crashing the whole run
    try:
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    except Exception as e:
        n_fail += 1
        print(f"  [FAIL] {qname}: result fetch error {e}")
        record[qname] = {"status": "fail", "rows": -1,
                         "detail": f"result fetch error: {e}",
                         "secs": round(time.time() - t0, 2)}
        continue
    got = got[sorted(got.columns)]
    if qname not in oracle:
        print(f"  [rows-only] {qname}: {len(got)} rows")
        record[qname] = {"status": "rows_only", "rows": len(got),
                         "secs": round(time.time() - t0, 2)}
        continue
    timer = None
    timed_out = [False]
    # the timer may fire AFTER the oracle returned but BEFORE cancel() —
    # con.interrupt() would then abort the NEXT DuckDB call. Guard the
    # interrupt with a still-running flag flipped under a lock before
    # cancel, so a late timer becomes a no-op instead of a stray abort.
    run_lock = threading.Lock()
    running = [True]
    if timeout_s:
        def _interrupt():
            with run_lock:
                if running[0]:
                    timed_out[0] = True
                    con.interrupt()
        timer = threading.Timer(timeout_s, _interrupt)
        timer.start()
    try:
        exp = con.execute(oracle[qname]).fetchdf()
    except Exception as e:
        if timed_out[0]:
            print(f"  [timeout] {qname}: oracle exceeded {timeout_s}s")
            record[qname] = {"status": "timeout", "rows": len(got),
                             "secs": round(time.time() - t0, 2)}
        else:
            n_fail += 1
            print(f"  [FAIL] {qname}: oracle error {e}")
            record[qname] = {"status": "fail", "rows": len(got),
                             "detail": f"oracle error: {e}",
                             "secs": round(time.time() - t0, 2)}
        continue
    finally:
        with run_lock:
            running[0] = False
        if timer is not None:
            timer.cancel()
    exp = exp[sorted(exp.columns)]
    status = []
    float_only = True          # every mismatch so far is a float column
    worst_rel = 0.0            # worst relative error across float mismatches
    if list(got.columns) != list(exp.columns):
        status.append(f"columns {list(got.columns)} != {list(exp.columns)}")
        float_only = False
    elif len(got) != len(exp):
        status.append(f"rows {len(got)} != {len(exp)}")
        float_only = False
    else:
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype) != str(b.dtype):
                status.append(f"dtype[{c}] {a.dtype} != {b.dtype}")
                float_only = False
                continue
            neq = (a != b) & ~(a.isna() & b.isna())
            if neq.any():
                i = neq.idxmax()
                status.append(f"value[{c}] row {i}: {a[i]!r} != {b[i]!r}"
                              f" ({int(neq.sum())} diffs)")
                if str(a.dtype).startswith("float"):
                    d = (a[neq] - b[neq]).abs()
                    # a NaN/inf-vs-finite divergence must NEVER pass as
                    # 'ulp': (a-b) is NaN there, pandas .max() skips NaN,
                    # and worst_rel would stay 0 — exactly the real
                    # divergence the class is documented to never hide.
                    # Treat any NaN-pattern mismatch or non-finite diff
                    # as a hard mismatch.
                    if bool(((a[neq].isna() != b[neq].isna())
                             | ~np.isfinite(d.fillna(np.inf))).any()):
                        float_only = False
                    else:
                        scale = b[neq].abs().clip(lower=1e-300)
                        worst_rel = max(worst_rel, float((d / scale).max()))
                else:
                    float_only = False
    secs = round(time.time() - t0, 2)
    if not status:
        n_pass += 1
        print(f"  [ok]   {qname}: {len(got)} rows ({secs}s)")
        record[qname] = {"status": "ok", "rows": len(got), "secs": secs}
    elif float_only and worst_rel < 1e-9:
        n_ulp += 1
        print(f"  [ulp]  {qname}: rel_err {worst_rel:.2e}; "
              + "; ".join(status[:2]))
        record[qname] = {"status": "ulp", "rows": len(got), "secs": secs,
                         "worst_rel_err": worst_rel,
                         "detail": "; ".join(status[:4])}
    else:
        n_fail += 1
        print(f"  [FAIL] {qname}: " + "; ".join(status[:4]))
        record[qname] = {"status": "fail", "rows": len(got), "secs": secs,
                         "detail": "; ".join(status[:4])}
n_to = sum(1 for v in record.values() if v["status"] == "timeout")
print(f"passed {n_pass}, ulp {n_ulp}, timeout {n_to}, failed {n_fail}")
# the exit code (and the artifact's counters) must reflect the WHOLE
# merged record, not just this run's slice: a partial --only re-check
# that leaves standing 'fail' entries in the artifact must still exit 1,
# or a post-fix re-verification can green-light a gate with old failures.
exit_fail = n_fail
if json_out:
    if only is not None and os.path.exists(json_out):
        # merge mode: overwrite just the re-checked entries of the
        # existing artifact and recompute its counters
        prior = json.load(open(json_out))
        merged = dict(prior.get("queries", {}))
        merged.update(record)
        record = merged
    top = {"sf_dir": sf_dir,
           "n_pass": sum(1 for v in record.values() if v["status"] == "ok"),
           "n_ulp": sum(1 for v in record.values() if v["status"] == "ulp"),
           "n_fail": sum(1 for v in record.values() if v["status"] == "fail"),
           "n_rows_only": sum(1 for v in record.values()
                              if v["status"] == "rows_only"),
           "n_timeout": sum(1 for v in record.values()
                            if v["status"] == "timeout"),
           "queries": record}
    json.dump(top, open(json_out, "w"), indent=0, separators=(",", ":"))
    exit_fail = top["n_fail"]
    if only is not None:
        print(f"merged totals: pass {top['n_pass']}, ulp {top['n_ulp']}, "
              f"timeout {top['n_timeout']}, failed {top['n_fail']}")
    print(f"wrote {json_out}")
sys.exit(1 if exit_fail else 0)
