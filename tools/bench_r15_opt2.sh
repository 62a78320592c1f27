#!/bin/bash
# r15 optimization round — final re-measure after the d_jaccard revert:
# full sf0.1 Spark suite + LONG pause + focused sf1 maintenance rows
# (the first focus run landed on the bucket the sf0.1 suite drained).
cd /root/repo
set -euo pipefail
echo "[r15opt2] spark sf0.1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r15_opt2.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_spark_r15_opt2.log 2>&1
echo "[r15opt2] spark sf0.1 done $(date)"; sleep 600
echo "[r15opt2] spark sf1 focused start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r15_opt2_focus.json \
  SPARK_GRAFT_BENCH_ONLY=s14_vortex_delete,s14_vortex_delete_dv,s15_vortex_update,s15_vortex_update_dv,s15c_vortex_update_subq,s15d_vortex_update_corr,s15e_vortex_update_corragg,s16_vortex_merge,s16b_vortex_merge_clauses,s16c_vortex_merge_nmbs \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r15_opt2.log 2>&1
echo "[r15opt2] spark sf1 focused done $(date)"
echo "[r15opt2] ALL DONE"
