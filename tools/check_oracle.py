#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB against the sfDir
tables, sorts columns by name, and compares values exactly (the driver
hash-compares). Reports per-query: row match, schema match, value match,
and where floats mismatch, the max abs diff + first offending cell.
"""
import duckdb, glob, json, sys
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/part-*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sdf = load_spark(out, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            ddf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); failures += 1; continue
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        ddf = ddf.reindex(sorted(ddf.columns), axis=1)
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            failures += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            failures += 1; continue
        ok = True
        for c in sdf.columns:
            col_ok = True
            a, b = sdf[c], ddf[c]
            # normalize dtypes for comparison but report them
            note = "" if str(a.dtype) == str(b.dtype) else f" [dtype spark={a.dtype} duck={b.dtype}]"
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                av, bv = a.astype("float64").values, b.astype("float64").values
                both_nan = np.isnan(av) & np.isnan(bv)
                eq = (av == bv) | both_nan
                if not eq.all():
                    i = int(np.argmin(eq))
                    print(f"FAIL {name}.{c}{note}: {int((~eq).sum())}/{len(eq)} cells differ; "
                          f"first row {i}: spark={av[i]!r} duck={bv[i]!r} "
                          f"maxabs={np.nanmax(np.abs(av - bv))}")
                    ok = False; col_ok = False
            else:
                av = a.astype(object).where(pd.notna(a), None).values
                bv = b.astype(object).where(pd.notna(b), None).values
                # normalize date/timestamp-ish values to strings; a DATE read
                # back via pandas shows as datetime.date on the spark side and
                # midnight datetime64 on the duckdb side — same value
                def norm(x):
                    if x is None or isinstance(x, (str, int, float, bool)):
                        return x
                    if isinstance(x, pd.Timestamp) and x == x.normalize():
                        return str(x.date())
                    return str(x)
                av = [norm(x) for x in av]; bv = [norm(x) for x in bv]
                neq = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y]
                if neq:
                    i = neq[0]
                    print(f"FAIL {name}.{c}{note}: {len(neq)}/{len(av)} cells differ; "
                          f"first row {i}: spark={av[i]!r} duck={bv[i]!r}")
                    ok = False; col_ok = False
            if col_ok and note:
                print(f"WARN {name}.{c}: values match but{note}")
        if ok:
            print(f"PASS {name} ({len(sdf)} rows, {len(sdf.columns)} cols)")
        else:
            failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} / {len(oracle)} queries")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
