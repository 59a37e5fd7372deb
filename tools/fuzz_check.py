#!/usr/bin/env python3
"""Differential check for graft.DialectFuzz dumps: run each case's ANSI
translation in DuckDB over the same sf-dir tables and compare against
the Executor's parquet dump as a MULTISET (both sides sorted by every
column) — ties in a plain ORDER BY are harmless by design, and
LIMIT/OFFSET cases ride a unique sort key so the selected set is
deterministic. Usage: fuzz_check.py <sfdir> <fuzz_out_dir>
"""
import sys, os, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["customer", "orders", "lineitem", "part"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

cases = json.load(open(f"{outdir}/fuzz_cases.json"))
fails = 0
for name, c in sorted(cases.items()):
    rp = f"{outdir}/{name}"
    if not os.path.isdir(rp):
        print(f"FAIL {name}: no result dir (exec failure?)  {c['dialect']}")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{rp}/*.parquet')").fetchdf()
        want = con.execute(c["ansi"]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}\n  dialect: {c['dialect']}\n  ansi: {c['ansi']}")
        fails += 1
        continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}\n  {c['dialect']}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}\n  dialect: {c['dialect']}\n  ansi: {c['ansi']}")
        fails += 1
        continue
    # multiset compare: sort both by all columns
    if len(got.columns):
        key = list(got.columns)
        got = got.sort_values(key, na_position="first").reset_index(drop=True)
        want = want.sort_values(key, na_position="first").reset_index(drop=True)
    bad = None
    for col in got.columns:
        for i, (x, y) in enumerate(zip(got[col].tolist(), want[col].tolist())):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or (isinstance(x, float) and isinstance(y, float)
                            and x != y) or (not isinstance(x, float)
                                            and str(x) != str(y)):
                bad = (col, i, x, y)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} got={bad[2]!r} want={bad[3]!r}\n  dialect: {c['dialect']}\n  ansi: {c['ansi']}")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")

total = len(cases)
print(f"\n{total - fails}/{total} passed")
sys.exit(1 if fails else 0)
