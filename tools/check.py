#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (Spark)
at a given SF, then run each oracle SQL in DuckDB over the same parquet
tables, canonicalize both results (columns sorted by name, values
normalized), and hash-compare. Usage:
    python3 tools/check.py [sfdir] [outdir] [--skip-spark] [query ...]
"""
import sys, os, json, glob, hashlib, subprocess
import duckdb, pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith('-') else '/root/testdata/sf0.01'
OUT = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith('-') else '/tmp/verify_out'
ONLY = [x for a in sys.argv[3:] if not a.startswith('-') for x in a.split(',') if x]
SKIP_SPARK = '--skip-spark' in sys.argv

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if not SKIP_SPARK:
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)   # stale outputs must not mask failures
    filt = (' ' + ','.join(ONLY)) if ONLY else ''
    r = subprocess.run(['sbt', '-batch', f'runMain graft.Verify {SF} {OUT}{filt}'],
                       cwd='/root/repo', capture_output=True, text=True, timeout=3600)
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print('VERIFY FAILED'); print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if '[verify]' in line: print(line)

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f'{OUT}/oracle_sql.json'))

import decimal

def canon(rows, cols):
    """rows: list of tuples in column order `cols`; canonicalize."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = repr(v)
            elif hasattr(v, 'isoformat'):
                v = v.isoformat()
            else:
                v = str(v)
            vals.append(v)
        out.append('\x01'.join(vals))
    return hashlib.md5('\x02'.join(out).encode()).hexdigest(), out

def type_lint(rows):
    """The driver's canonicalizer float-coerces one side, so DECIMAL
    outputs ('17.00' vs 17.0) and DuckDB HUGEINT sums hash-mismatch
    even when values are identical. Ban them outright: every output
    column must be int64-range int / float / str / date / ts / bool /
    bytes / None."""
    for row in rows[:1000]:
        for v in row:
            if isinstance(v, decimal.Decimal):
                return 'DECIMAL output (final-cast it to DOUBLE on both sides)'
            if isinstance(v, int) and not isinstance(v, bool) and abs(v) > 2**63 - 1:
                return 'out-of-int64 int (CAST the sum to BIGINT oracle-side)'
    return None

fails = []
names = ONLY if ONLY else sorted(oracle.keys())
for name in names:
    sqltext = oracle.get(name)
    spark_dir = f'{OUT}/{name}'
    pfiles = glob.glob(f'{spark_dir}/*.parquet')
    if not pfiles:
        print(f'{name}: NO SPARK OUTPUT'); fails.append(name); continue
    tbl = pq.read_table(pfiles[0])
    scols = list(tbl.column_names)
    srows = list(zip(*[tbl.column(c).to_pylist() for c in scols])) if tbl.num_rows else []
    if sqltext is None:
        print(f'{name}: rows-only ({tbl.num_rows} rows)'); continue
    try:
        res = con.execute(sqltext)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR: {e}'); fails.append(name); continue
    if sorted(scols) != sorted(ocols):
        print(f'{name}: COLUMN MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}')
        fails.append(name); continue
    # The driver canonicalizer float-coerces DuckDB HUGEINT output
    # columns ("600.0" vs Spark's "600") but duckdb-python hands them
    # back as plain int, so a value lint can't see them. Lint the
    # DECLARED oracle output types instead: any HUGEINT (the type of
    # every un-cast sum()/sum() OVER in DuckDB) is a hash mismatch
    # waiting to happen — CAST it to BIGINT/DOUBLE oracle-side.
    try:
        otypes = [str(t) for t in con.sql(sqltext).types]
    except Exception:
        otypes = []
    hug = [c for c, t in zip(ocols, otypes) if 'HUGEINT' in t.upper()]
    if hug:
        print(f'{name}: TYPE LINT: oracle outputs HUGEINT column(s) {hug} '
              f'(un-cast sum? CAST to BIGINT oracle-side)')
        fails.append(name); continue
    lint = type_lint(srows) or type_lint(orows)
    if lint:
        print(f'{name}: TYPE LINT: {lint}'); fails.append(name); continue
    sh, sv = canon(srows, scols)
    oh, ov = canon(orows, ocols)
    if sh == oh:
        print(f'{name}: OK ({len(srows)} rows)')
    else:
        fails.append(name)
        print(f'{name}: HASH MISMATCH spark_rows={len(sv)} oracle_rows={len(ov)}')
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a != b:
                print(f'  first diff row {i}:\n    spark : {a[:300]}\n    oracle: {b[:300]}')
                break
        else:
            if len(sv) != len(ov):
                print(f'  row count differs; spark extra: {sv[len(ov):len(ov)+2]} oracle extra: {ov[len(sv):len(sv)+2]}')

print(f'\n{len(names) - len(fails)}/{len(names)} OK; failing: {fails}')
sys.exit(1 if fails else 0)
