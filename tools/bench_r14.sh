#!/bin/bash
# Round-14 official same-day symmetric runs (VERDICT r13 next #1/#4/#7):
#  - sf0.1 full suite, both engines (NEW symmetric maintenance twins)
#  - sf1 on the r13 row list + s15e (164 rows; same 7 quadratic
#    exclusions), both engines — confirms w1_rank post-9e6f632 and
#    records the twin-family ratios
#  - sf1 loaded-host A/B: identical Spark run under a deliberate
#    10-thread 180 s spin pulse — the sf1 medians' throttle immunity
# 6 threads both engines, sequential halves, paced (BASELINE.md
# methodology). Run inside tmux — takes ~2 h.
cd /root/repo
set -euo pipefail

echo "[r14] regenerate oracle dump with the NEW twins $(date)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_r14 a1_agg_global" \
  > /tmp/verify_r14_dump.log 2>&1
python3 -c "import json; d=json.load(open('/tmp/verify_r14/bench_oracle_sql.json')); print('oracle rows:', len(d))"

echo "[r14] spark sf0.1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r14.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_spark_r14.log 2>&1
echo "[r14] spark sf0.1 done $(date)"; sleep 60

echo "[r14] duckdb sf0.1 start $(date)"
python3 tools/baseline.py /root/testdata/sf0.1 /tmp/verify_r14/bench_oracle_sql.json 2 \
  > bench_results/sf01_duckdb_r14.json 2> /tmp/bench_sf01_duck_r14.log
echo "[r14] duckdb sf0.1 done $(date)"; sleep 60

ROWS=$(cat tools/sf1_rows_r14.txt)
python3 - <<'PYEOF'
import json
oracle = json.load(open('/tmp/verify_r14/bench_oracle_sql.json'))
rows = open('tools/sf1_rows_r14.txt').read().strip().split(',')
json.dump({k: oracle[k] for k in rows if k in oracle},  # rows-only queries have no twin
          open('/tmp/sf1_oracle_r14.json', 'w'))
PYEOF

echo "[r14] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r14.json \
  SPARK_GRAFT_BENCH_ONLY=$ROWS \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r14.log 2>&1
echo "[r14] spark sf1 done $(date)"; sleep 60

echo "[r14] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/sf1_oracle_r14.json 2 \
  > bench_results/sf1_duckdb_r14.json 2> /tmp/bench_sf1_duck_r14.log
echo "[r14] duckdb sf1 done $(date)"; sleep 60

echo "[r14] sf1 LOADED run start $(date)"
python3 - <<'PYEOF' &
import threading, time
time.sleep(30)          # let the JVM/settle gate pass, then pulse
stop = time.time() + 180
def spin():
    x = 1
    while time.time() < stop:
        x = (x * 1103515245 + 12345) & 0x7fffffff
threads = [threading.Thread(target=spin) for _ in range(10)]
[t.start() for t in threads]
[t.join() for t in threads]
print("[pulse] done")
PYEOF
PULSE_PID=$!
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r14_loaded.json \
  SPARK_GRAFT_BENCH_ONLY=$ROWS \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r14_loaded.log 2>&1
wait $PULSE_PID || true
echo "[r14] sf1 LOADED done $(date)"
echo "[r14] ALL DONE"
