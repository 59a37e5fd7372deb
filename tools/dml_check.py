#!/usr/bin/env python3
"""DuckDB replay of the DML fuzzer (third engine of the differential):
DmlFuzz.main dumps each case's engine-final table as parquet plus
dml_cases.json with the case's ANSI statement script. This script
replays each script in DuckDB and compares the final table multiset
against the engine's parquet dump.
Usage: dml_check.py <fuzz_out_dir>
"""
import sys, os, json
import duckdb

outdir = sys.argv[1]
cases = json.load(open(f"{outdir}/dml_cases.json"))
fails = 0
for name, spec in sorted(cases.items()):
    rp = f"{outdir}/{name}"
    if not os.path.isdir(rp):
        print(f"FAIL {name}: no engine dump"); fails += 1; continue
    con = duckdb.connect()
    try:
        for stmt in spec["stmts"]:
            con.execute(stmt)
        want = con.execute(
            f"SELECT * FROM {spec['table']}").fetchdf()
        got = con.execute(
            f"SELECT * FROM read_parquet('{rp}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    key = lambda df: sorted("|".join("NULL" if v is None or v != v else repr(v)
                                     for v in row) for row in df.itertuples(index=False))
    if key(got) != key(want):
        print(f"FAIL {name}: multiset mismatch\n  got  {key(got)[:3]}\n  want {key(want)[:3]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(cases) - fails}/{len(cases)} passed")
sys.exit(1 if fails else 0)
