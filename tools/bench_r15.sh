#!/bin/bash
# Round-15 official same-day symmetric runs (VERDICT r14 next #1/#4):
#  - sf0.1 full suite, both engines — first official artifact with the
#    bulk-writer staging (3df6017) AND the column-splice rewrite in the
#    timed region, s15e running IN-SUITE on the custkey form (no
#    hand-patched rows), plus the new e_stream_tumbling row
#  - sf1 on tools/sf1_rows_r15.txt (r14's 163 rows + e_stream_tumbling;
#    same 7 quadratic exclusions), both engines — confirms the
#    e_sessions pin (r14 "What's wrong" #3) and records the
#    maintenance family's post-splice ratios
# 6 threads both engines, sequential halves, paced (BASELINE.md
# methodology). Run inside tmux — takes ~1.5-2 h.
cd /root/repo
set -euo pipefail

echo "[r15] regenerate oracle dump $(date)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_r15 a1_agg_global" \
  > /tmp/verify_r15_dump.log 2>&1
python3 -c "import json; d=json.load(open('/tmp/verify_r15/bench_oracle_sql.json')); print('oracle rows:', len(d))"

echo "[r15] spark sf0.1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r15.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_spark_r15.log 2>&1
echo "[r15] spark sf0.1 done $(date)"; sleep 60

echo "[r15] duckdb sf0.1 start $(date)"
python3 tools/baseline.py /root/testdata/sf0.1 /tmp/verify_r15/bench_oracle_sql.json 2 \
  > bench_results/sf01_duckdb_r15.json 2> /tmp/bench_sf01_duck_r15.log
echo "[r15] duckdb sf0.1 done $(date)"; sleep 60

ROWS=$(cat tools/sf1_rows_r15.txt)
python3 - <<'PYEOF'
import json
oracle = json.load(open('/tmp/verify_r15/bench_oracle_sql.json'))
rows = open('tools/sf1_rows_r15.txt').read().strip().split(',')
json.dump({k: oracle[k] for k in rows if k in oracle},  # rows-only queries have no twin
          open('/tmp/sf1_oracle_r15.json', 'w'))
PYEOF

echo "[r15] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r15.json \
  SPARK_GRAFT_BENCH_ONLY=$ROWS \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r15.log 2>&1
echo "[r15] spark sf1 done $(date)"; sleep 60

echo "[r15] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/sf1_oracle_r15.json 2 \
  > bench_results/sf1_duckdb_r15.json 2> /tmp/bench_sf1_duck_r15.log
echo "[r15] duckdb sf1 done $(date)"
echo "[r15] ALL DONE"
