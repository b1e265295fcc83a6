#!/bin/bash
# Round-5 FINAL accuracy validation, priority-ordered: the PARITY matrix was
# measured before the exact-f32 residual-fit rewrite, so every row must be
# re-measured on the shipped code.  Ordered so the rows that carry PARITY's
# headline claims (bigloop2/3 LC-vs-radius, the regression set, HDL-64) land
# first if wall-clock cuts the queue short.  Same flags as r5_tpu_queue5.sh.
cd /root/repo
set -x
date
run () {  # $1 outtag, $2.. args
  tag=$1; shift
  timeout 1200 python run_slam.py "$@" --pallas --chunk 32 \
    --out out/acc_${tag}_r5f --no-state --map-format none \
    > out/r5f_acc_${tag}.log 2>&1 || echo "FAIL $tag"
  date
}
m () {  # $1 course-tag, $2 scans, $3 noise, $4 flags, $5 mode
  timeout 1200 python run_slam.py --synthetic bigloop --scans $2 --pallas \
    --chunk 32 --imu-noise --imu-noise-scale $3 $4 \
    --out out/acc_$1_$5_r5f --no-state --map-format none \
    > out/r5f_acc_$1_$5.log 2>&1 || echo "FAIL $1 $5"
  date
}
# --- tier 1: the claims the round is judged on ---
run gentle --synthetic gentle --scans 133
m bigloop2 2650 1 "" lc
m bigloop2 2650 1 "--lc-map radius" lcrad
m bigloop2 2650 1 "--no-loop-closure" radius
m bigloop3 2650 3 "--lc-map radius --loop-fitness 0.6" lcradfit
m bigloop3 2650 3 "--no-loop-closure" radius
m bigloop 1310 1 "" lc
m bigloop 1310 1 "--no-mapping" odo
# --- tier 2: regression set + HDL-64 ---
run turny --synthetic turny --scans 133
run loop --synthetic loop --scans 450 --imu-noise
run loop_radius --synthetic loop --scans 450 --imu-noise --no-loop-closure
run hdl64 --preset hdl64 --synthetic gentle --scans 150
run hdl64_bigloop --preset hdl64 --synthetic bigloop --scans 600 --imu-noise
# --- tier 3: the remaining matrix rows ---
m bigloop2 2650 1 "--no-mapping" odo
m bigloop2 2650 1 "--window-no-loop" window
m bigloop3 2650 3 "--no-mapping" odo
m bigloop3 2650 3 "" lc
m bigloop3 2650 3 "--lc-map radius" lcrad
m bigloop3 2650 3 "--window-no-loop" window
m bigloop 1310 1 "--no-loop-closure" radius
m bigloop 1310 1 "--window-no-loop" window
m bigloop 1310 1 "--lc-map radius" lcrad
date
echo R5_QUEUE6_DONE
