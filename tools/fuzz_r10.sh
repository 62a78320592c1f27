#!/bin/bash
# Round-10 fuzz batches: maintenance-path differential (DELETE/UPDATE/
# fold/compact vs DuckDB staged twins) + window frames over the
# nested/DECIMAL grammar. Sequential — fuzz runs invoke sbt.
cd /root/repo
LOG=bench_results/fuzz_r10.log
: > $LOG
run() {
  echo "=== $* ===" >> $LOG
  timeout 5400 python3 tools/fuzz_diff.py "$@" >> $LOG 2>&1
  echo "rc=$? for $*" >> $LOG
}
run /root/testdata/sf0.001 500 202 --maintenance
run /root/testdata/sf0.01  400 303 --maintenance
run /root/testdata/sf0.001 200 404 --maintenance
run /root/testdata/sf0.01  300 505
run /root/testdata/sf0.01  300 606 --nested
run /root/testdata/sf0.01  200 707 --nested --vortex
echo "ALL DONE" >> $LOG
