#!/usr/bin/env python3
"""Refresh tools/bench_calm_ref.json — the primary-rung retime guard's
per-query calm reference (see Bench.calmRef) — as the elementwise MIN
of the existing reference and one or more new calm full-draw JSONs.

Usage: python3 tools/refresh_calm_ref.py <draw.json> [<draw2.json> ...]

Only draws whose "sf" basename matches the reference's (sf0.1) are
accepted; names new to the reference are added at their draw value.
The min-of-calm-draws statistic converges to the true cost under
co-tenant interference, same rationale as SPARK_GRAFT_BENCH_REPS.
"""
import json
import os
import sys

REF = os.path.join(os.path.dirname(__file__), "bench_calm_ref.json")


def main(paths):
    ref = {"sf": "sf0.1", "queries": {}}
    if os.path.isfile(REF):
        ref = json.load(open(REF))
    q = ref.get("queries", {})
    for p in paths:
        d = json.load(open(p))
        sf = os.path.basename(d.get("sf", "").rstrip("/"))
        if sf != ref.get("sf", "sf0.1"):
            print(f"SKIP {p}: sf {sf!r} != {ref.get('sf')!r}")
            continue
        added, lowered = 0, 0
        for name, sec in d.get("queries", {}).items():
            if name not in q:
                q[name] = sec
                added += 1
            elif sec < q[name]:
                q[name] = sec
                lowered += 1
        print(f"{p}: {added} added, {lowered} lowered, ref now {len(q)} names")
    ref["queries"] = dict(sorted(q.items()))
    with open(REF, "w") as f:
        json.dump(ref, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main(sys.argv[1:])
