#!/usr/bin/env python3
"""Record the DuckDB wall-clock baseline per oracle query at a given SF
(the reference engine is DuckDB v1.5.5; see BASELINE.md). Usage:
    python3 tools/baseline.py [sfdir] [oracle_sql.json] [reps]
Prints one JSON object {query: best_sec}.
"""
import sys, json, time
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
# prefer the bench oracle dump (superset: adds COPY-style twins that
# return no relation and so can't be correctness-compared)
_default_oracle = '/tmp/verify_out/bench_oracle_sql.json'
if len(sys.argv) <= 2 and not __import__('os').path.exists(_default_oracle):
    _default_oracle = '/tmp/verify_out/oracle_sql.json'
ORACLE = sys.argv[2] if len(sys.argv) > 2 else _default_oracle
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
THREADS = int(sys.argv[5]) if len(sys.argv) > 5 else 6

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
# size the thread pool to the host's sustained-CPU ceiling, same as
# graft.Bench (local[6]): >~12 busy threads trips a ~70x host throttle
con.execute(f"SET threads={THREADS}")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

PACE = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0

oracle = json.load(open(ORACLE))
out = {}
for name in sorted(oracle):
    best = None
    err = False

    def rep():
        global err
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
        except Exception as e:
            dt = -1.0
            err = True
            print(f"# {name}: ERROR {e}", file=sys.stderr)
        # refill pause — same anti-throttle methodology as graft.Bench:
        # the host punishes sustained >~12-thread CPU burn ~70x, so pace
        # between timed runs and never count the pause
        if PACE > 0 and dt > 0:
            time.sleep(min(PACE, max(0.2, dt)))
        return dt

    for _ in range(REPS):
        dt = rep()
        if err:
            break
        best = dt if best is None else min(best, dt)
    # same retry rule as graft.Bench: a best still >1s may mean every
    # rep landed in a throttled window — one more after a full pause.
    # A failed retry rep must never clobber the valid best already taken.
    if not err and PACE > 0 and best is not None and best > 1.0:
        time.sleep(PACE)
        dt = rep()
        if dt > 0:
            best = min(best, dt)
        else:
            err = False  # keep the valid earlier measurement
    out[name] = round(best if best is not None else -1.0, 4)
    print(f"# {name}: {out[name]}", file=sys.stderr)
print(json.dumps(out))
