#!/usr/bin/env python3
"""Rounding-boundary audit for the driver's hash compare.

Every gate query rounds float outputs to 6 decimals on both engines; a value
whose UNROUNDED 7th decimal sits at ~5 could round differently under
parallel-summation ulp drift and flip the hash. This scans every Verify
output column for values within `eps` of the round-6 boundary.

Usage: boundary_audit.py <verifyOutDir> [eps=1e-4]
Exit code 1 if any risky value is found.
"""
import glob, os, sys
import numpy as np
import pandas as pd

out_dir = sys.argv[1]
eps = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
risky = []
for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        continue
    df = pd.concat(pd.read_parquet(f) for f in files)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            v = df[c].dropna().values
            if len(v) == 0:
                continue
            frac = np.abs(v) * 1e6
            dist = np.abs((frac - np.floor(frac)) - 0.5)
            n = int((dist < eps).sum())
            if n:
                risky.append((os.path.basename(qdir), c, n, len(v), float(dist.min())))

for name, c, n, total, worst in sorted(risky, key=lambda x: x[4]):
    print(f"RISKY {name}.{c}: {n}/{total} values within {eps} of the round-6 boundary (min dist {worst:.2e})")
print(f"{'FAIL' if risky else 'OK'}: {len(risky)} risky columns")
sys.exit(1 if risky else 0)
