#!/bin/bash
# Round-5 TPU queue #4: fixed selfcheck (same features both halves) +
# HDL-64 on a drift-inducing course that stays INSIDE the synthetic world
# (the 400-scan gentle run drove out of the default world at 60 m — the
# round-3 artifact class; bigloop's big_world holds the 181 m ring).
cd /root/repo
set -x
date
timeout 2400 python tools/selfcheck.py > out/r5_selfcheck4.log 2>&1 \
  || echo "SELFCHECK_FAILED" | tee -a out/r5_selfcheck4.log

timeout 3600 python run_slam.py --preset hdl64 --synthetic bigloop \
  --scans 600 --pallas --chunk 32 --imu-noise \
  --out out/acc_hdl64_bigloop_r5 --no-state --map-format none \
  > out/r5_acc_hdl64_bigloop.log 2>&1
date
echo R5_QUEUE4_DONE
