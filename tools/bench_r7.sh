#!/bin/bash
# Round-7 same-day symmetric bench: 6 threads both engines, sequential,
# best-of-2 + retry (engine-internal), 60 s cooldowns between runs.
cd /root/repo
mkdir -p bench_results
echo "[r7] spark sf0.1 start $(date)" 
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r7.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_spark.log 2>&1
echo "[r7] spark sf0.1 done $(date)"; sleep 60
echo "[r7] duckdb sf0.1 start $(date)"
python3 tools/baseline.py /root/testdata/sf0.1 /tmp/verify_out/bench_oracle_sql.json 2 \
  > bench_results/sf01_duckdb_r7.json 2> /tmp/bench_sf01_duck.log
echo "[r7] duckdb sf0.1 done $(date)"; sleep 60
python3 - <<'PY'
import json
qs = sorted(json.load(open('bench_results/sf1_spark_r6.json'))['queries'])
open('/tmp/sf1_rows.txt','w').write(','.join(qs))
o = json.load(open('/tmp/verify_out/bench_oracle_sql.json'))
json.dump({k: v for k, v in o.items() if k in set(qs)}, open('/tmp/sf1_oracle.json','w'))
PY
echo "[r7] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r7.json \
  SPARK_GRAFT_BENCH_ONLY=$(cat /tmp/sf1_rows.txt) \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark.log 2>&1
echo "[r7] spark sf1 done $(date)"; sleep 60
echo "[r7] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/sf1_oracle.json 2 \
  > bench_results/sf1_duckdb_r7.json 2> /tmp/bench_sf1_duck.log
echo "[r7] duckdb sf1 done $(date)"
echo "[r7] ALL DONE"
