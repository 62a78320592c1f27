#!/bin/bash
# Round-7 sf1 half (restart after interrupted run): 6 threads, sequential.
cd /root/repo
echo "[r7] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r7.json \
  SPARK_GRAFT_BENCH_ONLY=$(cat /tmp/sf1_rows.txt) \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark.log 2>&1
echo "[r7] spark sf1 done $(date)"; sleep 60
echo "[r7] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/sf1_oracle.json 2 \
  > bench_results/sf1_duckdb_r7.json 2> /tmp/bench_sf1_duck.log
echo "[r7] duckdb sf1 done $(date)"
echo "[r7] SF1 DONE"
