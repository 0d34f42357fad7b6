#!/usr/bin/env python3
"""Compare two runs from target/bench.json (or any bench JSON files).

Usage: bench_compare.py [idxA] [idxB]   (negative indexes ok, default -2 -1)
Prints per-query before/after with speedup, sorted by after-seconds desc,
plus totals and regression list (>1.3x slower and >0.5s).
"""
import json, sys

def load_runs():
    runs = json.load(open("target/bench.json"))
    return runs if isinstance(runs, list) else [runs]

def main():
    a = int(sys.argv[1]) if len(sys.argv) > 1 else -2
    b = int(sys.argv[2]) if len(sys.argv) > 2 else -1
    runs = load_runs()
    ra, rb = runs[a]["queries"], runs[b]["queries"]
    qa = {k: v for k, v in ra.items() if not k.endswith("__engine")}
    qb = {k: v for k, v in rb.items() if not k.endswith("__engine")}
    common = sorted(set(qa) & set(qb), key=lambda k: -qb[k])
    print(f"{'query':38s} {'before':>8s} {'after':>8s} {'speedup':>8s}")
    regs = []
    import math
    logs = []
    for k in common:
        sp = qa[k] / qb[k] if qb[k] > 0 else float('inf')
        if qa[k] > 0 and qb[k] > 0:
            logs.append(math.log(sp))
        flag = ""
        if sp < 1/1.3 and qb[k] - qa[k] > 0.5:
            regs.append((k, qa[k], qb[k])); flag = "  <-- REGRESSED"
        print(f"{k:38s} {qa[k]:8.2f} {qb[k]:8.2f} {sp:8.2f}{flag}")
    ta = sum(qa[k] for k in common); tb = sum(qb[k] for k in common)
    print(f"\ncommon={len(common)} total before={ta:.1f}s after={tb:.1f}s "
          f"ratio={ta/tb if tb else 0:.2f}x geomean={math.exp(sum(logs)/len(logs)) if logs else 0:.2f}")
    print(f"only-in-before: {sorted(set(qa)-set(qb))}")
    print(f"only-in-after:  {sorted(set(qb)-set(qa))}")
    if regs:
        print(f"\n{len(regs)} regressions (>1.3x and >0.5s):")
        for k, x, y in sorted(regs, key=lambda r: r[1]-r[2]):
            print(f"  {k}: {x:.2f} -> {y:.2f}")

if __name__ == "__main__":
    main()
