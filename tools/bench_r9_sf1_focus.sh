#!/bin/bash
# Round-9 focused same-day sf1 run: the rows added or touched this
# round (18 rows; same 6-thread sequential paced methodology).
cd /root/repo
set -euo pipefail
ROWS=$(cat tools/sf1_rows_r9.txt)
[ -n "$ROWS" ] || { echo "empty row list"; exit 1; }
echo "[r9] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r9_focus.json \
  SPARK_GRAFT_BENCH_ONLY=$ROWS \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r9.log 2>&1
echo "[r9] spark sf1 done $(date)"; sleep 60
echo "[r9] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/sf1_oracle_r9.json 2 \
  > bench_results/sf1_duckdb_r9_focus.json 2> /tmp/bench_sf1_duck_r9.log
echo "[r9] duckdb sf1 done $(date)"
echo "[r9] SF1 FOCUS DONE"
