#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet dumps
written by graft.Verify, runs each oracle SQL in DuckDB over views named after
the testdata tables, and compares values exactly (columns sorted by name,
rows in emitted order).

Stricter than round 1: the driver's hash is dtype/encoding-sensitive (decimal
and hugeint outputs hash-mismatched despite value-identical results), so this
now also (a) compares pandas dtypes, and (b) compares float columns by raw
IEEE bit pattern, not numeric equality."""
import json, sys, glob, os, struct, math
import duckdb
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def bits(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return struct.pack("<d", v).hex()
    return v

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
# A declared oracle query whose Verify dump is missing is a FAILURE, not a
# skip — Verify writes an _verify_error marker dump on exception, but guard
# against any other way a dump can go missing.
dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
for name in sorted(set(oracle) - dumped):
    fails.append(name)
    print(f"FAIL {name}: declared in oracle_sql.json but no Verify dump written")
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    # A _verify_error marker dump means the query CRASHED in graft.Verify —
    # fail it whether or not it has an oracle (a crashed hash-family query
    # must not hide in the ROWS-ONLY bucket).
    if list(got.columns) == ["_verify_error"]:
        fails.append(name)
        print(f"FAIL {name}: query failed in Verify: {got.iloc[0, 0]}")
        continue
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
    dtype_diff = [(c, str(got_s[c].dtype), str(exp_s[c].dtype))
                  for c in got_s.columns if str(got_s[c].dtype) != str(exp_s[c].dtype)]
    if dtype_diff:
        fails.append(name)
        print(f"FAIL {name}: dtype diffs {dtype_diff}")
        continue
    diff_cols = []
    for c in got_s.columns:
        a, b = got_s[c], exp_s[c]
        av = [bits(x) for x in a.astype(object).where(~a.isna(), None)]
        bv = [bits(x) for x in b.astype(object).where(~b.isna(), None)]
        for i, (x, y) in enumerate(zip(av, bv)):
            if x != y:
                diff_cols.append((c, i, a.iloc[i], b.iloc[i]))
                break
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
