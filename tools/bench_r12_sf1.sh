#!/bin/bash
# Round-12 full same-day sf1 run: the r11 row list plus the two new
# DML rows (s15c_vortex_update_subq, s16c_vortex_merge_nmbs); same 7
# quadratic-on-saturated-corpus exclusions as r10/r11 (documented in
# BASELINE.md). 6 threads both sides, sequential halves, paced.
cd /root/repo
set -euo pipefail
ROWS=$(cat tools/sf1_rows_r12.txt)
[ -n "$ROWS" ] || { echo "empty row list"; exit 1; }
python3 - <<'PYEOF'
import json
oracle = json.load(open('/tmp/verify_out/bench_oracle_sql.json'))
rows = open('tools/sf1_rows_r12.txt').read().strip().split(',')
json.dump({k: oracle[k] for k in rows}, open('/tmp/sf1_oracle_r12.json', 'w'))
PYEOF
echo "[r12] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r12.json \
  SPARK_GRAFT_BENCH_ONLY=$ROWS \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r12.log 2>&1
echo "[r12] spark sf1 done $(date)"; sleep 60
echo "[r12] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/sf1_oracle_r12.json 2 \
  > bench_results/sf1_duckdb_r12.json 2> /tmp/bench_sf1_duck_r12.log
echo "[r12] duckdb sf1 done $(date)"
echo "[r12] SF1 DONE"
