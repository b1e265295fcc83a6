#!/bin/bash
# Round-5 FINAL accuracy campaign: every matrix/regression row re-measured
# on the shipped code (the exact-f32 residual-fit rewrite changes mapping
# numerics — the earlier matrix was measured with bf16-gated fits).
cd /root/repo
set -x
date
run () {  # $1 outtag, $2.. args
  tag=$1; shift
  timeout 3600 python run_slam.py "$@" --pallas --chunk 32 \
    --out out/acc_${tag}_r5f --no-state --map-format none \
    > out/r5f_acc_${tag}.log 2>&1 || echo "FAIL $tag"
}
run gentle --synthetic gentle --scans 133
run turny --synthetic turny --scans 133
run loop --synthetic loop --scans 450 --imu-noise
run loop_radius --synthetic loop --scans 450 --imu-noise --no-loop-closure
run hdl64 --preset hdl64 --synthetic gentle --scans 150
run hdl64_bigloop --preset hdl64 --synthetic bigloop --scans 600 --imu-noise

m () {  # $1 course-tag, $2 scans, $3 noise, $4 flags, $5 mode
  timeout 3600 python run_slam.py --synthetic bigloop --scans $2 --pallas \
    --chunk 32 --imu-noise --imu-noise-scale $3 $4 \
    --out out/acc_$1_$5_r5f --no-state --map-format none \
    > out/r5f_acc_$1_$5.log 2>&1 || echo "FAIL $1 $5"
}
for c in "bigloop 1310 1" "bigloop2 2650 1" "bigloop3 2650 3"; do
  set -- $c
  m $1 $2 $3 "--no-mapping" odo
  m $1 $2 $3 "--no-loop-closure" radius
  m $1 $2 $3 "--window-no-loop" window
  m $1 $2 $3 "" lc
  m $1 $2 $3 "--lc-map radius" lcrad
done
m bigloop3 2650 3 "--lc-map radius --loop-fitness 0.6" lcradfit
date
echo R5_QUEUE5_DONE
