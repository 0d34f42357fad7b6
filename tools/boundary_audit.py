#!/usr/bin/env python3
"""Hash-hazard audit for the driver's bitwise compare of Verify outputs.

Two hazard classes:

1. SIGN hazard (the round-2 flake): a value that is bitwise -0.0, or a
   nonzero value within 1e-12 of 0 (an algebraic zero that escaped the
   gate's round-6 projection and could round to either sign of zero across
   engines). After SparkEntry.normalizeZeroSign + Verify.wrapOracle, every
   gate output must be free of both -> this audit enforces it.

2. ROUNDING-BOUNDARY hazard: a pre-rounding value whose 7th decimal sits at
   ~5 could round differently under parallel-summation ulp drift. NOTE:
   this check is only meaningful on UNROUNDED columns — gate outputs are
   already rounded decimal multiples (6 dp for most columns, 9 dp for the
   small-probability outputs like PageRank contributions and
   negative-sampling tails), where the distance-to-boundary statistic is
   structurally degenerate and the check cannot fire (the real cross-engine
   defense is tools/check_oracle.py's BITWISE compare, which sees exactly
   what the driver's hash sees). The boundary scan is kept for any column a
   query forgets to round: such values sit off BOTH the 1e-6 and 1e-9
   grids and do get flagged when near a boundary.

Usage: boundary_audit.py <verifyOutDir> [eps=1e-4]
Exit code 1 if any hazard is found.
"""
import glob, os, sys
import numpy as np
import pandas as pd

out_dir = sys.argv[1]
eps = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
risky = []
sign_hazards = []
NEG_ZERO = np.float64(-0.0).view(np.uint64)  # 0x8000000000000000
for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        continue
    df = pd.concat(pd.read_parquet(f) for f in files)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            v = df[c].dropna().values.astype(np.float64)
            if len(v) == 0:
                continue
            neg_zeros = int((v.view(np.uint64) == NEG_ZERO).sum())
            near_zeros = int(((np.abs(v) < 1e-12) & (v != 0.0)).sum())
            if neg_zeros or near_zeros:
                sign_hazards.append((os.path.basename(qdir), c, neg_zeros, near_zeros, len(v)))
            # boundary proximity only detectable off the rounded grids
            # (6 dp for most gate outputs, 9 dp for small-probability
            # columns — both are deliberate round() projections)
            frac = np.abs(v) * 1e6
            on_grid = np.abs(frac - np.rint(frac)) < 1e-9
            frac9 = np.abs(v) * 1e9
            on_grid9 = np.abs(frac9 - np.rint(frac9)) < 1e-5
            off = v[~on_grid & ~on_grid9]
            if len(off):
                f2 = np.abs(off) * 1e6
                dist = np.abs((f2 - np.floor(f2)) - 0.5)
                n = int((dist < eps).sum())
                if n:
                    risky.append((os.path.basename(qdir), c, n, len(v), float(dist.min())))

for name, c, nz, near, total in sign_hazards:
    print(f"SIGNHAZARD {name}.{c}: {nz} bitwise -0.0, {near} nonzero |v|<1e-12 of {total} values")
for name, c, n, total, worst in sorted(risky, key=lambda x: x[4]):
    print(f"RISKY {name}.{c}: {n}/{total} unrounded values within {eps} of the round-6 boundary (min dist {worst:.2e})")
bad = len(risky) + len(sign_hazards)
print(f"{'FAIL' if bad else 'OK'}: {len(sign_hazards)} sign hazards, {len(risky)} boundary-risky columns")
sys.exit(1 if bad else 0)
