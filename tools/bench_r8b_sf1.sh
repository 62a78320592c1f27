#!/bin/bash
# Round-8 full same-day sf1 run: 6 threads, sequential, paced.
# Row list = r7's 124 sf1 rows (quadratic-output rows excluded, see
# BASELINE.md) + the round-8 additions.
cd /root/repo
set -euo pipefail
# row list is committed (tools/sf1_rows_r8b.txt) so the published
# 141-row record is reproducible; fail fast rather than silently
# benching zero Spark rows on an empty BENCH_ONLY
ROWS=$(cat tools/sf1_rows_r8b.txt)
[ -n "$ROWS" ] || { echo "empty row list"; exit 1; }
echo "[r8] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r8b.json \
  SPARK_GRAFT_BENCH_ONLY=$ROWS \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r8b.log 2>&1
echo "[r8] spark sf1 done $(date)"; sleep 60
echo "[r8] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/sf1_oracle_r8b.json 2 \
  > bench_results/sf1_duckdb_r8b.json 2> /tmp/bench_sf1_duck_r8b.log
echo "[r8] duckdb sf1 done $(date)"
echo "[r8] SF1 DONE"
