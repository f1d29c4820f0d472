#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: for each query dumped by
graft.Verify, run the paired DuckDB oracle SQL over the same parquet
fixtures and compare row count, schema (column names), and values
(columns sorted by name, rows in produced order).
Dev tool only -- not part of the shipped library."""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(v):
    # exact compare, including floats: the driver's gate is a bit-level
    # hash of the pandas frames, so a value that is only round-9 close
    # would still fail there. Doubles must match bit-for-bit.
    if isinstance(v, float):
        return v.hex() if v == v else "nan"
    return v

fails = []
for name, sql in sorted(oracles.items()):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        fails.append((name, "no spark output")); print(f"FAIL {name}: no spark output"); continue
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols = spark_rel.columns
        srows = spark_rel.fetchall()
        sdtypes = {c: str(t) for c, t in spark_rel.df().dtypes.items()}
        duck_rel = con.sql(sql)
        dcols = duck_rel.columns
        drows = duck_rel.fetchall()
        ddtypes = {c: str(t) for c, t in duck_rel.df().dtypes.items()}
    except Exception as e:
        fails.append((name, str(e))); print(f"FAIL {name}: {e}"); continue
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"schema {sorted(scols)} vs {sorted(dcols)}"))
        print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}"); continue
    # The driver hashes the pandas frames bit-level, so a dtype drift
    # (e.g. DuckDB promoting SUM(BIGINT) to HUGEINT -> float64/object
    # while Spark stays int64) fails there even when values match.
    # Model that here: pandas dtype per column must agree exactly.
    badtypes = [(c, sdtypes[c], ddtypes[c]) for c in sorted(scols)
                if sdtypes[c] != ddtypes[c]]
    if badtypes:
        fails.append((name, f"dtype {badtypes}"))
        print(f"FAIL {name}: dtype mismatch {badtypes}"); continue
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    sv = [tuple(canon(r[i]) for i in sidx) for r in srows]
    dv = [tuple(canon(r[i]) for i in didx) for r in drows]
    if len(sv) != len(dv):
        fails.append((name, f"rows {len(sv)} vs {len(dv)}"))
        print(f"FAIL {name}: rows {len(sv)} vs {len(dv)}"); continue
    if sv != dv:
        bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
        fails.append((name, f"value mismatch at row {bad}: {sv[bad]} vs {dv[bad]}"))
        print(f"FAIL {name}: value mismatch at row {bad}:\n  spark {sv[bad]}\n  duck  {dv[bad]}")
        continue
    print(f"OK   {name}: {len(sv)} rows")

print(f"\n{len(oracles) - len(fails)}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
