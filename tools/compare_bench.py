#!/usr/bin/env python3
"""Build a BASELINE.md-style comparison table from a spark BENCH.json
and a duckdb baseline json. Usage:
    python3 tools/compare_bench.py <spark.json> <duckdb.json> [label]
Prints the markdown table plus summary ratios (all comparable rows,
and ex-naive if the all-pairs oracle rows are present).
"""
import sys, json

spark = json.load(open(sys.argv[1]))
duck = json.load(open(sys.argv[2]))
label = sys.argv[3] if len(sys.argv) > 3 else ''
sq = spark['queries'] if 'queries' in spark else spark

NAIVE = {'v_cos_neardup', 'd_jaccard'}  # intentionally O(n^2) oracles

rows = []
for q in sorted(sq):
    if q in duck and duck[q] > 0 and sq[q] > 0:
        rows.append((q, duck[q], sq[q], sq[q] / duck[q]))

print(f"| query | duckdb s | spark s | ratio | {label} |")
print("|---|---|---|---|---|")
for q, d, s, r in rows:
    print(f"| {q} | {d:.3f} | {s:.3f} | {r:.2f} | {label} |")

ts, td = sum(r[2] for r in rows), sum(r[1] for r in rows)
print(f"\nTOTAL: spark {ts:.1f} s vs duckdb {td:.1f} s = {ts/td:.2f}x over {len(rows)} rows")
nn = [r for r in rows if r[0] not in NAIVE]
if len(nn) != len(rows):
    ts2, td2 = sum(r[2] for r in nn), sum(r[1] for r in nn)
    print(f"EX-NAIVE: spark {ts2:.1f} s vs duckdb {td2:.1f} s = {ts2/td2:.2f}x over {len(nn)} rows")
weak = [(q, d, s, r) for q, d, s, r in rows if s >= 0.5 and r > 2.0]
print(f"WEAK ROWS (spark >= 0.5 s AND ratio > 2x): {len(weak)}")
for q, d, s, r in sorted(weak, key=lambda x: -x[3]):
    print(f"  {q}: {s:.3f} s, {r:.2f}x")
