#!/bin/bash
# Round-4 TPU measurement campaign (sequential — ONE TPU process at a time):
#   1. bench.py (4-pass headline + spread)
#   2. accuracy suite at the round-3 configs (regression check for the
#      query-cap + fused-rerank + consistency-gate changes)
#   3. bigloop necessity trio: LC / radius-no-LC / odometry-only
#   4. HDL-64 preset end-to-end (VERDICT r3 #5)
#   5. full-pipeline scaling sweep (bench_scaling --mode full)
cd /root/repo
set -x
date
timeout 3600 python bench.py > out/r4_bench.log 2>&1

timeout 2400 python run_slam.py --synthetic gentle --scans 133 --pallas \
  --chunk 32 --out out/acc_gentle_r4 --no-state --map-format none \
  > out/r4_acc_gentle.log 2>&1
timeout 2400 python run_slam.py --synthetic turny --scans 133 --pallas \
  --chunk 32 --out out/acc_turny_r4 --no-state --map-format none \
  > out/r4_acc_turny.log 2>&1
timeout 2400 python run_slam.py --synthetic loop --scans 450 --pallas \
  --chunk 32 --imu-noise --out out/acc_loop_r4 --no-state \
  --map-format none > out/r4_acc_loop.log 2>&1
timeout 2400 python run_slam.py --synthetic loop --scans 450 --pallas \
  --chunk 32 --imu-noise --no-loop-closure --out out/acc_loop_nolc_r4 \
  --no-state --map-format none > out/r4_acc_loop_nolc.log 2>&1

# bigloop: ~1.08 laps of the 181 m course (1310 scans at 1.5 m/s)
timeout 3600 python run_slam.py --synthetic bigloop --scans 1310 --pallas \
  --chunk 32 --imu-noise --out out/acc_bigloop_r4 --no-state \
  --map-format none > out/r4_acc_bigloop.log 2>&1
timeout 3600 python run_slam.py --synthetic bigloop --scans 1310 --pallas \
  --chunk 32 --imu-noise --no-loop-closure --out out/acc_bigloop_nolc_r4 \
  --no-state --map-format none > out/r4_acc_bigloop_nolc.log 2>&1
timeout 3600 python run_slam.py --synthetic bigloop --scans 1310 --pallas \
  --chunk 32 --imu-noise --no-mapping --out out/acc_bigloop_odo_r4 \
  --no-state --map-format none > out/r4_acc_bigloop_odo.log 2>&1

timeout 3600 python run_slam.py --preset hdl64 --synthetic gentle \
  --scans 70 --pallas --chunk 16 --out out/acc_hdl64_r4 --no-state \
  --map-format none > out/r4_acc_hdl64.log 2>&1

timeout 3600 python bench_scaling.py --mode full --chunk 16 --chunks 4 \
  > out/r4_bench_scaling.log 2>&1
date
echo R4_QUEUE_DONE
