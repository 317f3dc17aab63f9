#!/bin/bash
# One-shot device experiment queue for round 3 (run when the tunnel is up).
# Results land in /tmp/tpu_roundup/; each step is independently timed out so
# a tunnel stall cannot eat the whole window.
set -u
OUT=/tmp/tpu_roundup
mkdir -p $OUT
cd "$(dirname "$0")/.."

echo "=== 1. bench old schedule (12/4, gate off) ===" | tee $OUT/log
BENCH_ITERS=12 BENCH_REASSOC=4 BENCH_REASSOC_MOTION=0 \
  timeout 1200 python bench.py > $OUT/bench_old.json 2> $OUT/bench_old.err
tail -1 $OUT/bench_old.json | tee -a $OUT/log

echo "=== 2. bench default (8 iters, motion gate 0.2) ===" | tee -a $OUT/log
timeout 1200 python bench.py > $OUT/bench_gate.json 2> $OUT/bench_gate.err
tail -1 $OUT/bench_gate.json | tee -a $OUT/log

echo "=== 3. device accuracy A/B (base vs i8mg20) ===" | tee -a $OUT/log
SWEEP_VARIANTS="base:12:4:1:2,i8mg20:8:8:1:2:0.20" \
  timeout 1800 python scripts/dev_sweep_agg.py > $OUT/sweep_ab.txt 2>&1
grep tr_err $OUT/sweep_ab.txt | tee -a $OUT/log

echo "=== 4. full pipeline steady state (12/4 and gated schedules) ===" | tee -a $OUT/log
timeout 1800 python scripts/bench_full_pipeline.py > $OUT/full_pipeline.json 2> $OUT/full_pipeline.err
tail -1 $OUT/full_pipeline.json | tee -a $OUT/log
FP_ITERS=8 FP_REASSOC=8 FP_MOTION=0.2 \
  timeout 1800 python scripts/bench_full_pipeline.py > $OUT/full_pipeline_gate.json 2> $OUT/full_pipeline_gate.err
tail -1 $OUT/full_pipeline_gate.json | tee -a $OUT/log

echo "=== 5. device step decomposition ===" | tee -a $OUT/log
timeout 1200 python scripts/dev_profile_iters.py > $OUT/profile_iters.txt 2>&1
tail -20 $OUT/profile_iters.txt | tee -a $OUT/log

echo "=== 6. surfel gate A/B (reassoc 4 vs motion gate) ===" | tee -a $OUT/log
SWEEP_MAP=kdtree SWEEP_BATCH=8 \
  SWEEP_VARIANTS="r4:20:4:0:0,gate:20:20:0:0:0.20" \
  timeout 2400 python scripts/dev_sweep_agg.py > $OUT/surfel_ab.txt 2>&1
grep tr_err $OUT/surfel_ab.txt | tee -a $OUT/log

echo "=== 7. surfel NN backend A/B (exact vs voxel-hash, gated+batched) ===" | tee -a $OUT/log
SWEEP_MAP=kdtree SWEEP_BATCH=8 \
  SWEEP_VARIANTS="gate:20:20:0:0:0.20" \
  timeout 2400 python scripts/dev_sweep_agg.py > $OUT/surfel_exact.txt 2>&1
grep tr_err $OUT/surfel_exact.txt | tee -a $OUT/log
SWEEP_MAP=kdtree SWEEP_BATCH=8 SWEEP_NN=hash \
  SWEEP_VARIANTS="gate:20:20:0:0:0.20,r4:20:4:0:0" \
  timeout 2400 python scripts/dev_sweep_agg.py > $OUT/surfel_hash.txt 2>&1
grep tr_err $OUT/surfel_hash.txt | tee -a $OUT/log

echo "=== 8. surfel knn-normals champion: speed at 10 gated iters ===" | tee -a $OUT/log
SWEEP_MAP=kdtree SWEEP_BATCH=8 SWEEP_NN=hash \
  SWEEP_VARIANTS="i10:10:10:0:0:0.20,i20:20:20:0:0:0.20" \
  timeout 2400 python scripts/dev_sweep_agg.py > $OUT/surfel_knn.txt 2>&1
grep tr_err $OUT/surfel_knn.txt | tee -a $OUT/log

echo "=== 9. re-record acceptance fixture (new surfel champion) ===" | tee -a $OUT/log
timeout 3000 python scripts/record_e2e_ours.py > $OUT/record_e2e.txt 2>&1
tail -5 $OUT/record_e2e.txt | tee -a $OUT/log

echo "=== DONE ===" | tee -a $OUT/log
