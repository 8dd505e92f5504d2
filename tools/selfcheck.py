#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given sf, then compare each query's parquet output against its DuckDB
oracle (columns sorted by name, rows sorted, exact value compare with a
float-bit report). Usage: python3 tools/selfcheck.py [sfdir] [outdir] [--no-run]
"""
import sys, os, json, subprocess, glob
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
RUN = "--no-run" not in sys.argv

if RUN:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600)
    tail = (r.stdout + r.stderr)[-4000:]
    if r.returncode != 0:
        print("VERIFY FAILED:\n", tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
tables = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
for t in tables:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
npass = nfail = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{OUT}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); nfail += 1; continue
    try:
        mine = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetchdf()
        ref = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}"); nfail += 1; continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
        nfail += 1; continue
    if len(mine) != len(ref):
        print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}"); nfail += 1; continue
    mine = mine.sort_values(by=list(mine.columns), ignore_index=True)
    ref = ref.sort_values(by=list(ref.columns), ignore_index=True)
    bad = []
    for c in mine.columns:
        a, b = mine[c], ref[c]
        try:
            import pandas as pd
            eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
            if not eq.all():
                # float tolerance report
                try:
                    af, bf = a.astype(float), b.astype(float)
                    import numpy as np
                    close = np.isclose(af, bf, rtol=1e-9, equal_nan=True)
                    if close.all():
                        bad.append((c, "float-close-not-exact"))
                        continue
                except Exception:
                    pass
                i = (~eq).idxmax()
                bad.append((c, f"row{i}: {a[i]!r} vs {b[i]!r}"))
        except Exception as e:
            bad.append((c, f"cmp-error {str(e)[:80]}"))
    if bad:
        print(f"FAIL {name}: " + "; ".join(f"{c}[{m}]" for c, m in bad[:4]))
        nfail += 1
    else:
        print(f"PASS {name} ({len(mine)} rows)")
        npass += 1

print(f"\n{npass} passed, {nfail} failed, {len(oracle)} total")
sys.exit(1 if nfail else 0)
