#!/usr/bin/env python3
"""Record the DuckDB wall-clock baseline per oracle query at a given SF
(the reference engine is DuckDB v1.5.5; see BASELINE.md). Usage:
    python3 tools/baseline.py [sfdir] [oracle_sql.json] [reps]
Prints one JSON object {query: best_sec}.
"""
import sys, json, time
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
ORACLE = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out/oracle_sql.json'
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(ORACLE))
out = {}
for name in sorted(oracle):
    best = None
    for _ in range(REPS):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
        except Exception as e:
            dt = -1.0
            print(f"# {name}: ERROR {e}", file=sys.stderr)
            break
        best = dt if best is None else min(best, dt)
    out[name] = round(best if best is not None else -1.0, 4)
    print(f"# {name}: {out[name]}", file=sys.stderr)
print(json.dumps(out))
