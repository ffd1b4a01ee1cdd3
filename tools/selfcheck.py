#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf tables and compare (columns sorted by name, rows sorted, exact values).
Usage: selfcheck.py <sfDir> <outDir> [query...]
"""
import glob, json, math, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

import datetime, decimal

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime().isoformat()
    return v

def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            dd = con.execute(sql)
            dd_names = [d[0] for d in dd.description]
            dd_rows = dd.fetchall()
            parts = sorted(glob.glob(f"{out_dir}/{name}/part-*.parquet"))
            sp = pq.read_table(parts[0]) if len(parts) == 1 else \
                pq.ParquetDataset(parts).read()
            sp_names = sp.column_names
            sp_rows = [tuple(r.values()) for r in sp.to_pylist()]
            if sorted(dd_names) != sorted(sp_names):
                print(f"FAIL {name}: columns spark={sorted(sp_names)} duckdb={sorted(dd_names)}")
                n_fail += 1
                continue
            a, b = canon(sp_rows, sp_names), canon(dd_rows, dd_names)
            if len(a) != len(b):
                print(f"FAIL {name}: rowcount spark={len(a)} duckdb={len(b)}")
                n_fail += 1
                continue
            bad = [(x, y) for x, y in zip(a, b) if x != y]
            if bad:
                print(f"FAIL {name}: {len(bad)} mismatched rows; first: spark={bad[0][0]} duckdb={bad[0][1]}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
