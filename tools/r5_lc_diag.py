"""Round-5 diagnosis of VERDICT r4 Weak #2 / directive #1b: why does
loop-closure CAUSAL ATE (0.440) trail the no-LC radius mode (0.362) on the
2.2-lap bigloop2 course, when LC wins on the final map (ate_kf 0.126-0.148
vs 0.226)?

Reads the COMMITTED round-4 trajectories (out/acc_bigloop2_*_r4), regenerates
the analytic ground truth (synthetic trajectories are deterministic), and
prints per-window causal error profiles + alignment-free segment stats so the
8 cm gap can be localized in time.

Usage: python tools/r5_lc_diag.py   (pure CPU host work, no TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from lins_tpu.datasets.synthetic import make_trajectory
from lins_tpu.utils.trajectory import read_tum, umeyama_align

RUNS = {
    "lc": "out/acc_bigloop2_lc_r4",
    "nolc": "out/acc_bigloop2_lcnolc_r4",
    "odo": "out/acc_bigloop2_lcodo_r4",
}


def gt_at(ts):
    pose_fn = make_trajectory("bigloop", 1.5)
    p, q = jax.vmap(pose_fn)(np.asarray(ts, np.float32))
    return np.asarray(p)


def main():
    errs = {}
    pos = {}
    for name, d in RUNS.items():
        path = os.path.join(d, "trajectory.tum")
        if not os.path.exists(path):
            print(f"{name}: missing {path}")
            continue
        t, p, q = read_tum(path)
        gt = gt_at(t)
        s, R, tr = umeyama_align(p, gt)
        pa = (s * (R @ p.T)).T + tr
        errs[name] = np.linalg.norm(pa - gt, axis=1)
        pos[name] = (t, p, gt)

    n = min(len(e) for e in errs.values())
    W = 200
    print(f"per-{W}-scan window RMSE (m), whole-trajectory Umeyama align:")
    hdr = "win  scans      " + "  ".join(f"{k:>7}" for k in errs)
    print(hdr)
    for w0 in range(0, n, W):
        w1 = min(w0 + W, n)
        row = f"{w0//W:>3}  {w0:>4}-{w1:<5}"
        for k, e in errs.items():
            row += f"  {np.sqrt(np.mean(e[w0:w1]**2)):7.3f}"
        print(row)
    print("\ntotal RMSE: " + "  ".join(
        f"{k}={np.sqrt(np.mean(e[:n]**2)):.4f}" for k, e in errs.items()))

    # windowed LOCAL alignment: removes the global-alignment coupling --
    # aligns each 200-scan segment independently, so this measures local
    # consistency (map-matching jitter) rather than accumulated drift
    print(f"\nper-{W}-scan window RMSE with PER-WINDOW alignment (local "
          "jitter):")
    print(hdr)
    for w0 in range(0, n, W):
        w1 = min(w0 + W, n)
        row = f"{w0//W:>3}  {w0:>4}-{w1:<5}"
        for k in errs:
            t, p, gt = pos[k]
            s, R, tr = umeyama_align(p[w0:w1], gt[w0:w1])
            pa = (s * (R @ p[w0:w1].T)).T + tr
            e = np.linalg.norm(pa - gt[w0:w1], axis=1)
            row += f"  {np.sqrt(np.mean(e**2)):7.3f}"
        print(row)

    # step-discontinuity profile: count + total magnitude of published-pose
    # jumps beyond what ground truth moves (loop-solve churn signature)
    print("\npublished-pose step anomalies |d_est - d_gt| > 0.05 m:")
    for k in errs:
        t, p, gt = pos[k]
        d_est = np.linalg.norm(np.diff(p, axis=0), axis=1)
        d_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1)
        an = np.abs(d_est - d_gt)
        big = an > 0.05
        print(f"  {k:>5}: {big.sum():4d} jumps, total {an[big].sum():7.3f} m,"
              f" max {an.max():6.3f} m")
        if big.sum() and k == "lc":
            idx = np.nonzero(big)[0]
            print(f"         first 20 jump scan-indices: {idx[:20]}")


if __name__ == "__main__":
    main()
