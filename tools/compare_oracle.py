#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir> [names...]
Compares each <name>.parquet Spark result against the oracle SQL in
oracle_sql.json run by DuckDB over the sf_dir parquet tables: row count,
sorted-column schema, and a value hash (columns sorted by name, rows
sorted, floats rounded) — mirroring the driver's CORRECTNESS gate.
"""
import sys, json, hashlib, glob, os
import duckdb

def canon(vals):
    out = []
    for v in vals:
        if isinstance(v, float):
            out.append(f"{v:.6g}")
        elif v is None:
            out.append("NULL")
        else:
            out.append(str(v))
    return out

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(canon([r[i] for i in order])) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output")
            fails += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
        scols = [d[0] for d in con.description]
        try:
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            fails += 1
            continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and table_hash(scols, sdf) == table_hash(ocols, odf)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else \
            f"FAIL rows={rows_ok}({len(sdf)}/{len(odf)}) schema={schema_ok} hash={hash_ok}"
        print(f"{name}: {status}")
        if status != "OK":
            fails += 1
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
