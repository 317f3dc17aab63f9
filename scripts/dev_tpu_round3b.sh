#!/bin/bash
# Trimmed round-3 device queue (continuation session): champion numbers first,
# fixture re-record, then full-pipeline. Each step independently timed out.
set -u
OUT=/tmp/tpu_roundup
mkdir -p $OUT
cd "$(dirname "$0")/.."

echo "=== A. bench default (champion: 8 iters, motion gate 0.2) ===" | tee $OUT/log
timeout 1200 python bench.py > $OUT/bench_gate.json 2> $OUT/bench_gate.err
tail -1 $OUT/bench_gate.json | tee -a $OUT/log

echo "=== B. surfel knn-normals champion: speed at 10/20 gated iters ===" | tee -a $OUT/log
SWEEP_MAP=kdtree SWEEP_BATCH=8 SWEEP_NN=hash \
  SWEEP_VARIANTS="i10:10:10:0:0:0.20,i20:20:20:0:0:0.20" \
  timeout 1800 python scripts/dev_sweep_agg.py > $OUT/surfel_knn.txt 2>&1
grep -E "tr_err|scans" $OUT/surfel_knn.txt | tee -a $OUT/log

echo "=== C. re-record acceptance fixture (new surfel champion) ===" | tee -a $OUT/log
timeout 1800 python scripts/record_e2e_ours.py > $OUT/record_e2e.txt 2>&1
tail -5 $OUT/record_e2e.txt | tee -a $OUT/log

echo "=== D. full pipeline steady state (gated schedule) ===" | tee -a $OUT/log
FP_ITERS=8 FP_REASSOC=8 FP_MOTION=0.2 \
  timeout 1500 python scripts/bench_full_pipeline.py > $OUT/full_pipeline_gate.json 2> $OUT/full_pipeline_gate.err
tail -1 $OUT/full_pipeline_gate.json | tee -a $OUT/log

echo "=== E. bench old schedule A/B (12/4, gate off) ===" | tee -a $OUT/log
BENCH_ITERS=12 BENCH_REASSOC=4 BENCH_REASSOC_MOTION=0 \
  timeout 900 python bench.py > $OUT/bench_old.json 2> $OUT/bench_old.err
tail -1 $OUT/bench_old.json | tee -a $OUT/log

echo "=== DONE ===" | tee -a $OUT/log
