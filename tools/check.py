#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet dumps
written by graft.Verify, runs each oracle SQL in DuckDB over views named after
the testdata tables, and compares values exactly (columns sorted by name,
rows in emitted order)."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle SQL error: {e}"); continue
    got_s = got[sorted(got.columns)]
    exp_s = exp[sorted(exp.columns)]
    if list(got_s.columns) != list(exp_s.columns):
        fails.append(name)
        print(f"FAIL {name}: columns {list(got_s.columns)} vs {list(exp_s.columns)}")
        continue
    if len(got_s) != len(exp_s):
        fails.append(name)
        print(f"FAIL {name}: rows {len(got_s)} vs {len(exp_s)}")
        continue
    diff_cols = []
    for c in got_s.columns:
        a, b = got_s[c], exp_s[c]
        eq = (a.isna() & b.isna()) | (a.astype(object).where(~a.isna(), None) == b.astype(object).where(~b.isna(), None))
        if not eq.all():
            i = int((~eq).idxmax())
            diff_cols.append((c, i, a.iloc[i], b.iloc[i]))
    if diff_cols:
        fails.append(name)
        print(f"FAIL {name}: value diffs {diff_cols[:3]}")
    else:
        passes.append((name, len(got_s)))

print(f"\nPASS {len(passes)}: {[p[0] for p in passes]}")
print(f"ROWS-ONLY {len(skips)}: {skips}")
if fails:
    print(f"FAILED {len(fails)}: {fails}")
    sys.exit(1)
print("all oracle-checked queries match")
