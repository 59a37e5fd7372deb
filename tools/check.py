#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf dir tables, sort
columns by name, compare values (exact for non-floats, tiny epsilon for
floats so we can see *how* close we are; the real driver hash-compares).
Usage: check.py <sfdir> <verify_out_dir>
"""
import sys, os, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# optional 3rd arg: comma-separated query-name subset (matches Verify's
# subset mode for fast local iteration)
if len(sys.argv) > 3:
    keep = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = 0
for name, sql in sorted(oracle.items()):
    rp = f"{outdir}/{name}"
    if not os.path.isdir(rp):
        print(f"FAIL {name}: no result dir"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{rp}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    bad = None
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None: continue
            xf = isinstance(x, float); yf = isinstance(y, float)
            if xf and yf:
                if math.isnan(x) and math.isnan(y): continue
                if x != y:
                    bad = (c, i, x, y, "float-mismatch" if abs(x-y) > 1e-9*max(1,abs(x)) else "ulp")
                    break
            else:
                if str(x) != str(y):
                    bad = (c, i, x, y, "value"); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} got={bad[2]!r} want={bad[3]!r} ({bad[4]})")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
