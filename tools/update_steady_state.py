#!/usr/bin/env python3
"""Fold a final bench recording into perf/steady_state.json.

The steady record is the per-query MINIMUM over every committed
uncontended recording at that scale — the bench uses it to derive its
contention budget and to order the partial second sweep, so it must
only ever move DOWN (a slower round must not raise the record and
loosen the budget). New queries (no record yet) enter at their first
recorded value.

Usage: tools/update_steady_state.py <bench_json> <sf_key>
"""
import json, sys

def main() -> int:
    bench_path, sf = sys.argv[1], sys.argv[2]
    b = json.load(open(bench_path))
    if b.get("contended"):
        print(f"refusing: {bench_path} is flagged contended", file=sys.stderr)
        return 1
    path = "perf/steady_state.json"
    d = json.load(open(path))
    cur = d.get(sf, {})
    new = {}
    added = updated = kept = 0
    for q, v in sorted(b["queries"].items()):
        if v < 0:
            continue  # failed measurement never becomes a record
        old = cur.get(q)
        if old is None:
            new[q] = round(v, 6); added += 1
        elif v < old:
            new[q] = round(v, 6); updated += 1
        else:
            new[q] = old; kept += 1
    # queries that vanished from the surface drop out of the record
    d[sf] = new
    json.dump(d, open(path, "w"), indent=1, sort_keys=True)
    print(f"{sf}: {len(new)} queries ({added} added, {updated} lowered, "
          f"{kept} kept); total {sum(new.values()):.1f}s")
    return 0

if __name__ == "__main__":
    sys.exit(main())
