#!/bin/bash
# Round-8 second new-rows batch A/B (t_pack_blocks, t_unigram_nll,
# t_top_ngrams, r_inverted_df, r_bm25_topk, r_hybrid_rrf): 6 threads
# both engines, sequential, paced best-of-2 (BASELINE.md methodology).
# All six are linear in corpus size -> sf0.1 and sf1 both.
cd /root/repo
Q=t_pack_blocks,t_unigram_nll,t_top_ngrams,r_inverted_df,r_bm25_topk,r_hybrid_rrf
echo "[r8new2] spark sf0.1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_results/sf01_spark_r8_newrows2.json \
  SPARK_GRAFT_BENCH_ONLY=$Q sbt -batch 'runMain graft.Bench' > /tmp/bench_newrows2_sf01.log 2>&1
sleep 30
echo "[r8new2] duckdb sf0.1 start $(date)"
python3 tools/baseline.py /root/testdata/sf0.1 /tmp/new_rows2_oracle.json 2 \
  > bench_results/sf01_duckdb_r8_newrows2.json 2> /tmp/bench_newrows2_duck_sf01.log
sleep 30
echo "[r8new2] spark sf1 start $(date)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_BENCH_OUT=bench_results/sf1_spark_r8_newrows2.json \
  SPARK_GRAFT_BENCH_ONLY=$Q sbt -batch 'runMain graft.Bench' > /tmp/bench_newrows2_sf1.log 2>&1
sleep 30
echo "[r8new2] duckdb sf1 start $(date)"
python3 tools/baseline.py /root/repo/testdata/sf1 /tmp/new_rows2_oracle.json 2 \
  > bench_results/sf1_duckdb_r8_newrows2.json 2> /tmp/bench_newrows2_duck_sf1.log
echo "[r8new2] DONE $(date)"
