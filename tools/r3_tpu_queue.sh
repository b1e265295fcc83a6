#!/bin/bash
# Round-3 serialized TPU measurement queue (one TPU client at a time).
# Each step logs to out/r3_*.log; summaries land in out/acc_*/summary.json.
cd /root/repo
set -x
mkdir -p out

# 1. Pallas-association A/B (bench.py itself already ran before this script)
timeout 3000 python bench.py --pallas-assoc > out/r3_bench_pallas_assoc.log 2>&1

# 2. P4 scaling sweep
timeout 3000 python bench_scaling.py --batches 1,2,4,8 --chunk 16 \
  > out/r3_bench_scaling.log 2>&1

# 3. Accuracy matrix (chunk 32 reuses the bench compiles)
timeout 2400 python run_slam.py --synthetic gentle --scans 133 --pallas \
  --chunk 32 --out out/acc_gentle_r3 --no-state --map-format none \
  > out/r3_acc_gentle.log 2>&1
timeout 2400 python run_slam.py --synthetic turny --scans 133 --pallas \
  --chunk 32 --out out/acc_turny_r3 --no-state --map-format none \
  > out/r3_acc_turny.log 2>&1
timeout 2400 python run_slam.py --synthetic turny --scans 133 --pallas \
  --chunk 32 --no-mapping --out out/acc_turny_odo_r3 --no-state \
  --map-format none > out/r3_acc_turny_odo.log 2>&1
timeout 2400 python run_slam.py --synthetic gentle --scans 133 --pallas \
  --chunk 32 --no-mapping --out out/acc_gentle_odo_r3 --no-state \
  --map-format none > out/r3_acc_gentle_odo.log 2>&1

# 4. Loop-closure accuracy: revisiting circuit, LC on vs off, IMU noise.
#    450 scans ~= 1.05 laps at speed 1.5 (lap 42.8 s > 30 s age gate).
#    The LC-on run also times the full-scale state save (no --no-state).
timeout 3600 python run_slam.py --synthetic loop --scans 450 --pallas \
  --chunk 32 --imu-noise --out out/acc_loop_r3 --map-format none \
  > out/r3_acc_loop.log 2>&1
timeout 3600 python run_slam.py --synthetic loop --scans 450 --pallas \
  --chunk 32 --imu-noise --no-loop-closure --out out/acc_loop_nolc_r3 \
  --no-state --map-format none > out/r3_acc_loop_nolc.log 2>&1

# 5. Component micro-profile (new incremental push timing)
timeout 3000 python profile_mapping.py > out/r3_profile.log 2>&1

# 6. Final bench with the voxel-downsample compaction/sort optimizations
timeout 3000 python bench.py > out/r3_bench_final.log 2>&1

echo QUEUE_DONE
