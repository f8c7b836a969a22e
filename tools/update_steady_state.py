#!/usr/bin/env python3
"""Round-end maintenance (build-time only, not part of the library):
regenerate perf/steady_state.json — the committed per-query steady-state
record graft.Bench orders its contended partial sweep 2 by and labels
burst suspects against.

Usage: python3 tools/update_steady_state.py <bench_artifact.json> [...]

Each argument is a Bench artifact (first line = the full JSON record with
a "queries" map and an "sf" data-dir path). The new record is the
per-query MIN of each scale's artifacts merged with the EXISTING record,
so a noisy final run can only tighten entries, never loosen them.
"""
import json, os, sys

OUT = "perf/steady_state.json"


def sf_key(sf_dir: str) -> str:
    # mirrors graft.Bench.sfKey: basename, "testdata-" prefix stripped
    return os.path.basename(sf_dir.rstrip("/")).removeprefix("testdata-")


def main(paths):
    rec = {}
    if os.path.exists(OUT):
        old = json.load(open(OUT))
        rec = {k: dict(v) for k, v in old.items() if isinstance(v, dict)}
    for p in paths:
        d = json.loads(open(p).readline())
        key = sf_key(d["sf"])
        sec = rec.setdefault(key, {})
        for name, v in d["queries"].items():
            if v >= 0 and (name not in sec or v < sec[name]):
                sec[name] = round(v, 4)
        print(f"{p}: merged {len(d['queries'])} queries into section {key!r}"
              f" (now {len(sec)})")
    out = {"comment": "per-query steady-state record (min across final "
           "min-of-two recordings); Bench orders its contended partial "
           "sweep 2 by sweep1/steady anomaly ratio against this and "
           "labels burst suspects (final min > 3x steady)"}
    for k in sorted(rec):
        out[k] = dict(sorted(rec[k].items()))
    json.dump(out, open(OUT, "w"), indent=0, separators=(",", ":"))
    print(f"wrote {OUT}: " + ", ".join(f"{k}={len(v)}" for k, v in rec.items()))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
