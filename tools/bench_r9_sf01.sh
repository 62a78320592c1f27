#!/bin/bash
# Round-9 full same-day sf0.1 run: 6 threads both engines, sequential,
# best-of-2, 10 s pacing (the honest methodology — see BASELINE.md).
cd /root/repo
set -euo pipefail
echo "[r9] spark sf0.1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r9.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_spark_r9.log 2>&1
echo "[r9] spark sf0.1 done $(date)"; sleep 60
echo "[r9] duckdb sf0.1 start $(date)"
python3 tools/baseline.py /root/testdata/sf0.1 /tmp/verify_out/bench_oracle_sql.json 2 \
  > bench_results/sf01_duckdb_r9.json 2> /tmp/bench_sf01_duck_r9.log
echo "[r9] duckdb sf0.1 done $(date)"
echo "[r9] SF01 DONE"
