#!/usr/bin/env python3
"""DuckDB replay of the CSV-import fuzzer (third engine of the
differential): IngestFuzz.main writes each case's CSV plus parquet
dumps of every dialect SELECT's engine result, and ingest_cases.json
with the ANSI renderings. This script loads each CSV with
read_csv(all_varchar, null_padding, auto_detect=false) — the options
empirically matched to Spark's CSV defaults over the fuzz vocabulary —
and compares each ANSI SELECT's multiset against the engine dump.
Usage: ingest_check.py <fuzz_out_dir>
"""
import sys, os, json
import duckdb

outdir = sys.argv[1]
cases = json.load(open(f"{outdir}/ingest_cases.json"))
fails = 0
checks = 0
for name, spec in sorted(cases.items()):
    con = duckdb.connect()
    cols = ", ".join(f"'{c}': 'VARCHAR'" for c in spec["header"])
    try:
        con.execute(
            f"CREATE VIEW {spec['table']} AS SELECT * FROM read_csv("
            f"'{outdir}/{spec['csv']}', header=true, all_varchar=true, "
            f"null_padding=true, auto_detect=false, delim=',', "
            f"quote='\"', escape='\"', columns={{{cols}}})")
    except Exception as e:
        print(f"FAIL {name}: view: {e}"); fails += 1; continue
    for sel in spec["selects"]:
        checks += 1
        rp = f"{outdir}/{name}_{sel['label']}"
        if not os.path.isdir(rp):
            print(f"FAIL {name}/{sel['label']}: no engine dump")
            fails += 1; continue
        try:
            want = con.execute(sel["ansi"]).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{rp}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}/{sel['label']}: {e}"); fails += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if [c.lower() for c in got.columns] != [c.lower() for c in want.columns]:
            print(f"FAIL {name}/{sel['label']}: cols {list(got.columns)} vs {list(want.columns)}")
            fails += 1; continue

        def key(df):
            out = []
            for row in df.itertuples(index=False):
                cells = []
                for v in row:
                    if v is None or v != v:
                        cells.append("NULL")
                    elif isinstance(v, (int, float)):
                        cells.append(repr(float(v)))
                    else:
                        cells.append(repr(v))
                out.append("|".join(cells))
            return sorted(out)
        if key(got) != key(want):
            print(f"FAIL {name}/{sel['label']}: multiset mismatch\n"
                  f"  got  {key(got)[:3]}\n  want {key(want)[:3]}")
            fails += 1
        else:
            print(f"OK   {name}/{sel['label']} ({len(got)} rows)")
print(f"\n{checks - fails}/{checks} checks passed")
sys.exit(1 if fails else 0)
