#!/bin/bash
# Round-10 full same-day sf1 run (VERDICT r9 order #5): every current
# oracle row except the 7 documented quadratic-on-saturated-corpus
# exclusions (v_cos_neardup, d_jaccard, d_minhash_lsh, d_incremental,
# d_incremental_stored, v_semdedup, d_split_leakage — candidate/pair
# OUTPUT is Θ(n²) on the 30-word-vocab synthetic corpus in BOTH
# engines). 6 threads both sides, sequential halves, paced.
cd /root/repo
set -euo pipefail
ROWS=$(cat tools/sf1_rows_r10.txt)
[ -n "$ROWS" ] || { echo "empty row list"; exit 1; }
# (re)build the filtered oracle json from the Verify dump if missing
[ -f /tmp/sf1_oracle_r10.json ] || python3 - <<'PYEOF'
import json
oracle = json.load(open('/tmp/verify_out/bench_oracle_sql.json'))
rows = open('tools/sf1_rows_r10.txt').read().strip().split(',')
json.dump({k: oracle[k] for k in rows}, open('/tmp/sf1_oracle_r10.json', 'w'))
PYEOF
echo "[r10] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r10.json \
  SPARK_GRAFT_BENCH_ONLY=$ROWS \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r10.log 2>&1
echo "[r10] spark sf1 done $(date)"; sleep 60
echo "[r10] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/sf1_oracle_r10.json 2 \
  > bench_results/sf1_duckdb_r10.json 2> /tmp/bench_sf1_duck_r10.log
echo "[r10] duckdb sf1 done $(date)"
echo "[r10] SF1 DONE"
