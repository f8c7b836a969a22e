#!/usr/bin/env python3
"""Split a PlanAudit log into per-query plan files.

Usage: split_plans.py <planaudit.log> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for every '========== name =========='
section in the log (sbt [info] prefixes stripped, trailer dropped).
"""
import re, sys, os

log, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
txt = open(log).read()
txt = re.sub(r"^\[info\] ", "", txt, flags=re.M)
parts = re.split(r"^========== (\S+) ==========$", txt, flags=re.M)
os.makedirs(outdir, exist_ok=True)
for i in range(1, len(parts) - 1, 2):
    name, body = parts[i], parts[i + 1]
    body = body.split("[success]")[0].strip() + "\n"
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    open(path, "w").write(body)
    print(path, len(body))
