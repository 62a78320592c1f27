#!/bin/bash
# Optimization-round re-measure (r15 opt round 1): the Spark halves only —
# the DuckDB sides are code-unchanged from the official r15 same-day runs
# (bench_results/sf{01,1}_duckdb_r15.json), so the Spark re-runs compare
# 1:1 against those.
#  - full sf0.1 suite (the driver's bench scale): picks up PackedDump
#    (d_minhash_lsh, d_jaccard) + SurvivorSplice (maintenance family)
#  - focused sf1 run of the rows the round touched, so the scale ratios
#    in BASELINE.md can be updated honestly
# Run inside tmux on an IDLE host (the Bench settle/pace machinery guards
# the rest).
cd /root/repo
set -euo pipefail

echo "[r15opt] spark sf0.1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r15_opt.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_spark_r15_opt.log 2>&1
echo "[r15opt] spark sf0.1 done $(date)"; sleep 120

echo "[r15opt] spark sf1 focused start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r15_opt_focus.json \
  SPARK_GRAFT_BENCH_ONLY=s14_vortex_delete,s14_vortex_delete_dv,s15_vortex_update,s15_vortex_update_dv,s15c_vortex_update_subq,s15d_vortex_update_corr,s15e_vortex_update_corragg,s16_vortex_merge,s16b_vortex_merge_clauses,s16c_vortex_merge_nmbs,e_user_gaps,t_pii_scrub,w1_rank,j7_asof \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_spark_r15_opt.log 2>&1
echo "[r15opt] spark sf1 focused done $(date)"
echo "[r15opt] ALL DONE"
