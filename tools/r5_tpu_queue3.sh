#!/bin/bash
# Round-5 TPU queue #3:
#   1. selfcheck with the same-program comparison (fix after two probes)
#   2. radius-map LC mode A/B on the bigloop matrix: does giving LC mode
#      the radius-selected local map deliver the radius mode's causal
#      strength + LC's final-map strength in one mode?
#   3. HDL-64 at chunk 32 and 400 scans (separates fixed overhead from
#      marginal throughput; the stage profile implies 26.7 scans/s)
cd /root/repo
set -x
date
timeout 2400 python tools/selfcheck.py > out/r5_selfcheck3.log 2>&1 \
  || echo "SELFCHECK_FAILED" | tee -a out/r5_selfcheck3.log

ab () {
  timeout 3600 python run_slam.py --synthetic bigloop --scans $2 --pallas \
    --chunk 32 --imu-noise --imu-noise-scale $3 $4 \
    --out out/acc_$1_r5 --no-state --map-format none \
    > out/r5_acc_$1.log 2>&1 || echo "FAIL $1"
}
ab bigloop2_lcrad 2650 1 "--lc-map radius"
ab bigloop_lcrad 1310 1 "--lc-map radius"
ab bigloop3_lcrad 2650 3 "--lc-map radius"
ab bigloop3_lcradfit 2650 3 "--lc-map radius --loop-fitness 0.6"

timeout 3600 python run_slam.py --preset hdl64 --synthetic gentle \
  --scans 400 --pallas --chunk 32 --out out/acc_hdl64c_r5 --no-state \
  --map-format none > out/r5_acc_hdl64c.log 2>&1
date
echo R5_QUEUE3_DONE
