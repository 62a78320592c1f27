#!/bin/bash
# Round-12 full same-day sf0.1 symmetric run (VERDICT r11 next #2):
# 6 threads both engines, sequential, best-of-2, pacing — the honest
# methodology (BASELINE.md). Refreshes the r10-era sf0.1 table and
# re-attributes the d_incremental* driver-bench doubling.
cd /root/repo
set -euo pipefail
echo "[r12] spark sf0.1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r12.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_spark_r12.log 2>&1
echo "[r12] spark sf0.1 done $(date)"; sleep 60
echo "[r12] duckdb sf0.1 start $(date)"
python3 tools/baseline.py /root/testdata/sf0.1 /tmp/verify_out/bench_oracle_sql.json 2 \
  > bench_results/sf01_duckdb_r12.json 2> /tmp/bench_sf01_duck_r12.log
echo "[r12] duckdb sf0.1 done $(date)"
echo "[r12] SF01 DONE"
