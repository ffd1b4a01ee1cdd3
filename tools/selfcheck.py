#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf tables and compare (columns sorted by name, rows sorted, exact values),
PLUS an oracle-type portability gate calibrated to the driver hash's
MEASURED sensitivity. The driver compare canonicalizes within a type
family (int32 vs int64 and DECIMAL vs double render identically — both
classes are long hash-green), but HUGEINT is hash-fatal: DuckDB's
arrow/pandas export converts int128 to DOUBLE, so an uncast integer SUM
(HUGEINT) diverges from Spark's int64 on value-identical results — the
mm_audio_windows r12/r13 red. The gate therefore fails on: HUGEINT/
UHUGEINT anywhere, any DuckDB type outside the known-portable families,
and a cross-FAMILY mismatch (e.g. integer vs float) against the Spark
output schema. Convention: CAST every final-output integer aggregate
AS BIGINT.
Usage: selfcheck.py [--types-only] <sfDir> <outDir> [query...]
"""
import glob, json, math, re, sys
import duckdb
import pyarrow.parquet as pq

DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "DATE": "date", "TIMESTAMP": "ts", "BOOLEAN": "bool",
}

ARROW_FAMILY = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "float": "float", "double": "float",
    "string": "str", "large_string": "str",
    "date32[day]": "date", "bool": "bool",
}


def duck_family(t):
    s = str(t).upper()
    if s in ("HUGEINT", "UHUGEINT"):
        return "hugeint"  # hash-fatal: arrow export turns int128 into DOUBLE
    if s.startswith("TIMESTAMP"):
        return "ts"
    m = re.match(r"DECIMAL\((\d+)", s)
    if m:
        # The float-family exemption was MEASURED on specific precisions:
        # a decimal is only hash-safe vs double while every value
        # round-trips through a 53-bit mantissa (<= 15 significant
        # digits). Wider decimals can pass the family gate yet render
        # differently from the double Spark ships — flag them like
        # HUGEINT instead of waving them through.
        return "float" if int(m.group(1)) <= 15 else "wide_decimal"
    return DUCK_FAMILY.get(s)


def arrow_family(arrow_type):
    s = str(arrow_type)
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("decimal"):
        return "float"
    return ARROW_FAMILY.get(s)


def type_check(con, name, sql, spark_schema):
    """Returns a list of violation strings (empty = portable)."""
    rel = con.sql(sql)
    bad = []
    duck = dict(zip(rel.columns, [duck_family(t) for t in rel.types]))
    duck_raw = dict(zip(rel.columns, [str(t).upper() for t in rel.types]))
    for cname, fam in duck.items():
        if fam == "hugeint":
            bad.append(f"{cname}: duckdb type {duck_raw[cname]} is hash-fatal "
                       f"(arrow-exports as DOUBLE) — CAST(... AS BIGINT)")
        elif fam == "wide_decimal":
            bad.append(f"{cname}: duckdb type {duck_raw[cname]} exceeds the "
                       f"double-round-trippable precision (15 digits) — "
                       f"CAST to DOUBLE or a DECIMAL(<=15, s)")
        elif fam is None:
            bad.append(f"{cname}: duckdb type {duck_raw[cname]} outside the "
                       f"portable families — cast to a scalar type")
    if spark_schema is not None:
        for field in spark_schema:
            want = arrow_family(field.type)
            got = duck.get(field.name)
            if want is not None and got is not None and \
                    got not in ("hugeint", "wide_decimal") and got != want:
                bad.append(f"{field.name}: family mismatch spark={field.type}"
                           f"({want}) duckdb={duck_raw[field.name]}({got})")
    return bad

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
    argv = [a for a in sys.argv[1:] if a != "--types-only"]
    types_only = "--types-only" in sys.argv[1:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            parts0 = sorted(glob.glob(f"{out_dir}/{name}/part-*.parquet"))
            schema = pq.read_schema(parts0[0]) if parts0 else None
            tbad = type_check(con, name, sql, schema)
            if tbad:
                print(f"TYPEFAIL {name}: " + "; ".join(tbad))
                n_fail += 1
                continue
            if types_only:
                print(f"TYPEPASS {name}")
                n_pass += 1
                continue
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
