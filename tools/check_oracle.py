#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet (Spark result), runs <out>/oracle_sql.json[name]
in DuckDB with the sf tables registered as views, sorts columns by name and
rows by all columns, and compares values (floats to 1e-9 rel).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# optional third arg: regex over query names (scale probes re-check subsets
# in fresh processes — one runaway oracle otherwise poisons the allocator
# for every query after it)
name_re = None
if len(sys.argv) > 3:
    import re
    name_re = re.compile(sys.argv[3])
con = duckdb.connect()
# spill instead of dying on the big scale-probe oracles
con.execute("SET temp_directory='/tmp/duckdb_spill'")
if os.environ.get("GRAFT_DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if name_re is not None:
    oracle = {k: v for k, v in oracle.items() if name_re.search(k)}
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in spark_files])
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]")
            if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes,)):
                pass
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    g, w = norm(got), norm(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}"); fails += 1; continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}"); fails += 1; continue
    ok = True
    for c in g.columns:
        a, b = g[c], w[c]
        # TYPE check first: the driver hashes typed bit patterns, so a DuckDB
        # HUGEINT (-> float64/object in pandas) vs Spark BIGINT (int64) is a
        # hash mismatch even when every value agrees (the round-3 q_pack_* /
        # q_sample_stratified reds). Replicate that sensitivity, but only for
        # numeric kinds — dates legitimately arrive as object (Spark parquet)
        # vs datetime64 (DuckDB .df()) and hash equal at the driver.
        NUMERIC = set("iuf")
        if (a.dtype.kind in NUMERIC or b.dtype.kind in NUMERIC) and a.dtype.kind != b.dtype.kind:
            ok = False
            print(f"FAIL {name}: col {c} dtype {a.dtype} (spark) != {b.dtype} (oracle)")
            break
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            import numpy as np
            # BITWISE: the driver hashes bit patterns, so -0.0 != +0.0 there.
            # np.array_equal is numeric (-0.0 == +0.0) and missed the round-2
            # sign-of-zero flake; compare uint64 views, allowing NaN==NaN.
            av = a.astype(float).values
            bv = b.astype(float).values
            bit_eq = av.view(np.uint64) == bv.view(np.uint64)
            both_nan = np.isnan(av) & np.isnan(bv)
            if not np.all(bit_eq | both_nan):
                ok = False; print(f"FAIL {name}: col {c} differs, e.g. {a.head(3).tolist()} vs {b.head(3).tolist()}")
        else:
            if not (a.astype(str).values == b.astype(str).values).all():
                ok = False
                diff = (a.astype(str).values != b.astype(str).values)
                print(f"FAIL {name}: col {c} differs at {diff.sum()} rows, e.g. {a[diff][:3].tolist()} vs {b[diff][:3].tolist()}")
        if not ok: break
    if ok:
        print(f"OK   {name} ({len(g)} rows)")
    else:
        fails += 1
sys.exit(1 if fails else 0)
