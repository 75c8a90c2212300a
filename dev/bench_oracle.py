#!/usr/bin/env python3
"""Time the DuckDB oracle on each declared query at a given SF dir —
fills the BASELINE.md 'measure' slots and defines the 2x bench bound."""
import sys, json, glob, os, time
import duckdb

oracle_json, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(oracle_json))
times = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        n = len(con.sql(sql).fetchall())
    except Exception as e:
        n = -1
    times[name] = round(time.time() - t0, 3)
    print(f"{name}: {times[name]}s ({n} rows)", flush=True)
print(json.dumps({"sf": sfdir, "total": round(sum(times.values()), 2), "queries": times}))
