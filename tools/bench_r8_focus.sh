#!/bin/bash
# Round-8 focused same-day sf1 A/B: rewritten TPC-H rows + late-r7
# aggregate levers. Spark then DuckDB, sequential, 6 threads, paced.
set -x
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
SPARK_GRAFT_CPUS=6 \
SPARK_GRAFT_BENCH_ONLY=tpch_q2_supplier,tpch_q11_important,tpch_q22_opportunity,tpch_q16_partsupp,a1_agg_global,a4_sum_distinct,a6_rollup \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench_results/sf1_spark_r8_focus.json \
sbt -batch "runMain graft.Bench" > /tmp/r8_focus_spark.log 2>&1
sleep 20
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/r8_focus_oracle.json 2 > /root/repo/bench_results/sf1_duckdb_r8_focus.json 2>/tmp/r8_focus_duck.err
echo DONE
