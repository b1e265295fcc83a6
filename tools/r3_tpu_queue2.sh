#!/bin/bash
# Follow-up TPU runs: confined-turny re-measure, loop-circuit odometry-only
# drift baseline, association-kernel A/B micro-bench.
cd /root/repo
set -x
timeout 2400 python run_slam.py --synthetic turny --scans 133 --pallas \
  --chunk 32 --out out/acc_turny_confined_r3 --no-state --map-format none \
  > out/r3_acc_turny_confined.log 2>&1
timeout 2400 python run_slam.py --synthetic loop --scans 450 --pallas \
  --chunk 32 --imu-noise --no-mapping --out out/acc_loop_odo_r3 \
  --no-state --map-format none > out/r3_acc_loop_odo.log 2>&1
timeout 2400 python out/r3_assoc_micro.py > out/r3_assoc_micro.log 2>&1
echo QUEUE2_DONE
