#!/bin/bash
# Round-5 TPU measurement campaign (sequential — ONE TPU process at a time):
#   0. selfcheck canary (VERDICT r4 #6 — CPU-vs-TPU step differential +
#      Mosaic compile probe; the queue FAILS LOUDLY if it does)
#   1. bench.py (4-pass headline + spread)
#   2. accuracy regression set at the round-4 configs
#   3. the FULL loop-closure necessity matrix (VERDICT r4 #1a):
#      bigloop 1/2/3 x {odometry, radius(50m), window-no-loop, LC}
#   4. HDL-64: stage profile + end-to-end (VERDICT r4 #5)
#   5. full-pipeline scaling sweep at the headline K=32 (VERDICT r4 #4)
#   6. pallas_assoc compile-canary ladder (VERDICT r4 #7)
cd /root/repo
set -x
date

timeout 2400 python tools/selfcheck.py > out/r5_selfcheck.log 2>&1 \
  || echo "SELFCHECK_FAILED" | tee -a out/r5_selfcheck.log

timeout 3600 python bench.py > out/r5_bench.log 2>&1

for kind in gentle turny; do
  timeout 2400 python run_slam.py --synthetic $kind --scans 133 --pallas \
    --chunk 32 --out out/acc_${kind}_r5 --no-state --map-format none \
    > out/r5_acc_${kind}.log 2>&1
done
timeout 2400 python run_slam.py --synthetic loop --scans 450 --pallas \
  --chunk 32 --imu-noise --out out/acc_loop_r5 --no-state \
  --map-format none > out/r5_acc_loop.log 2>&1
timeout 2400 python run_slam.py --synthetic loop --scans 450 --pallas \
  --chunk 32 --imu-noise --no-loop-closure --out out/acc_loop_radius_r5 \
  --no-state --map-format none > out/r5_acc_loop_radius.log 2>&1

# ---- the bigloop necessity matrix ----
# bigloop1: 1.08 laps (1310); bigloop2: 2.2 laps (2650); bigloop3: 2.2 laps
# at 3x IMU noise.  Modes: odo / radius (50 m window, no loop machinery) /
# window (recent-keyframe window, no loop attempts) / lc (full).
matrix_run () {  # $1 tag, $2 scans, $3 noise-scale, $4 mode-flags, $5 mode
  timeout 3600 python run_slam.py --synthetic bigloop --scans $2 --pallas \
    --chunk 32 --imu-noise --imu-noise-scale $3 $4 \
    --out out/acc_$1_$5_r5 --no-state --map-format none \
    > out/r5_acc_$1_$5.log 2>&1 || echo "FAIL $1 $5"
}
for c in "bigloop 1310 1" "bigloop2 2650 1" "bigloop3 2650 3"; do
  set -- $c
  matrix_run $1 $2 $3 "--no-mapping" odo
  matrix_run $1 $2 $3 "--no-loop-closure" radius
  matrix_run $1 $2 $3 "--window-no-loop" window
  matrix_run $1 $2 $3 "" lc
done
# bigloop3 LC with a consistency gate matched to the 3x drift rate
matrix_run bigloop3 2650 3 "--loop-frac 0.15" lcfrac

timeout 3600 python tools/r5_hdl64_prof.py > out/r5_hdl64_prof.log 2>&1
timeout 3600 python run_slam.py --preset hdl64 --synthetic gentle \
  --scans 70 --pallas --chunk 16 --out out/acc_hdl64_r5 --no-state \
  --map-format none > out/r5_acc_hdl64.log 2>&1

timeout 3600 python bench_scaling.py --mode full --chunk 32 --chunks 3 \
  > out/r5_bench_scaling.log 2>&1

timeout 3600 python tools/r5_assoc_canary.py > out/r5_assoc_canary.log 2>&1

# VERDICT r4 #8: candidate-cache width A/B (exact either way via the d2C
# staleness bound; n_refresh telemetry shows the re-gather cost)
timeout 3600 python bench.py --s2m-cand 32 > out/r5_bench_cand32.log 2>&1

# HDL-64 query occupancy (sizes the measured map_query_* caps)
timeout 1200 python tools/r5_query_counts.py --preset hdl64 \
  > out/r5_query_counts_hdl64.log 2>&1
date
echo R5_QUEUE_DONE
