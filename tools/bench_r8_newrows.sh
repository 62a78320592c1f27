#!/bin/bash
# Round-8 focused same-day A/B for the four new pipeline rows
# (t_mix_temperature, d_chunk_dedup, v_cos_quantized, v_semdedup):
# 6 threads both engines, sequential, paced best-of-2 (BASELINE.md
# methodology). sf0.1 for all four; sf1 additionally for the three
# non-cluster-quadratic rows (v_semdedup's in-cluster pair term is
# the SemDeDup quadratic — excluded at sf1 like the all-pairs rows).
cd /root/repo
echo "[r8new] spark sf0.1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r8_newrows.json \
  SPARK_GRAFT_BENCH_ONLY=t_mix_temperature,d_chunk_dedup,v_cos_quantized,v_semdedup \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_newrows_sf01.log 2>&1
sleep 30
echo "[r8new] duckdb sf0.1 start $(date)"
python3 tools/baseline.py /root/testdata/sf0.1 /tmp/new_rows_oracle.json 2 \
  > bench_results/sf01_duckdb_r8_newrows.json 2> /tmp/bench_newrows_duck_sf01.log
sleep 30
echo "[r8new] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r8_newrows.json \
  SPARK_GRAFT_BENCH_ONLY=t_mix_temperature,d_chunk_dedup,v_cos_quantized \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_newrows_sf1.log 2>&1
sleep 30
echo "[r8new] duckdb sf1 start $(date)"
python3 -c "
import json
o = json.load(open('/tmp/new_rows_oracle.json')); o.pop('v_semdedup', None)
json.dump(o, open('/tmp/new_rows_oracle_sf1.json','w'))"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/new_rows_oracle_sf1.json 2 \
  > bench_results/sf1_duckdb_r8_newrows.json 2> /tmp/bench_newrows_duck_sf1.log
echo "[r8new] DONE $(date)"
