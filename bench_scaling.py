"""Multi-sequence replay scaling benchmark (SURVEY.md §2 P4 / BASELINE
config 5).

Measures chunked-replay throughput when B independent scan streams run
vmapped with the batch axis sharded over the available devices
(`parallel.replay.make_sharded_chunk_replay`).  With B == n_devices each
device executes exactly the single-sequence program and no collectives are
inserted, so on real multi-chip hardware the expected frames/s scaling is
communication-free (the ≥70% BASELINE target); this environment exposes ONE
TPU chip, so here the sweep reports single-chip batch scaling and the
multi-device path is validated for correctness elsewhere
(tests/test_parallel.py + __graft_entry__.dryrun_multichip on a virtual
8-device CPU mesh — wall-clock on virtual devices is meaningless, this host
has 2 cores).

Prints one JSON line per batch size:
  {"metric": "replay_scans_per_sec", "batch": B, "devices": D,
   "value": N, "per_seq": N/B, "efficiency_vs_b1": ...}
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="1,2,4,8",
                    help="comma-separated batch sizes to sweep")
    ap.add_argument("--chunk", type=int, default=16, help="scans per dispatch")
    ap.add_argument("--chunks", type=int, default=2, help="timed chunks")
    ap.add_argument("--preset", type=str, default="vlp16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lins_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from lins_tpu import config as C
    from lins_tpu.datasets import synthetic as syn
    from lins_tpu.odometry import LinsOdometry
    from lins_tpu.parallel.replay import make_mesh, make_sharded_chunk_replay

    preset = {"vlp16": C.VLP16, "tiny": C.TINY}[args.preset]
    cfg = preset.replace(max_points=28800 if args.preset == "vlp16" else
                         preset.max_points)
    K = args.chunk
    warmup = 6
    n_scans = warmup + (args.chunks + 1) * K
    data = syn.generate_sequence(cfg, n_scans=n_scans, kind="gentle",
                                 speed=1.5)

    # bootstrap one stream to RUNNING and collect chunk-shaped inputs
    odo = LinsOdometry(cfg)
    imu_i = 0
    for k in range(warmup):
        t_scan = data["scan_times"][k] + cfg.scan_period
        while (imu_i < len(data["imu_times"])
               and data["imu_times"][imu_i] <= t_scan + 1e-9):
            odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i],
                        data["imu_gyr"][imu_i])
            imu_i += 1
        odo.add_scan(t_scan, data["scans_xyz"][k], data["scans_n"][k])
    while imu_i < len(data["imu_times"]):
        odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i],
                    data["imu_gyr"][imu_i])
        imu_i += 1

    chunks = []
    for c in range(args.chunks + 1):
        ks = range(warmup + c * K, warmup + (c + 1) * K)
        dts = np.zeros((K, cfg.max_imu_per_scan))
        accs = np.zeros((K, cfg.max_imu_per_scan, 3))
        gyrs = np.zeros((K, cfg.max_imu_per_scan, 3))
        valid = np.zeros((K, cfg.max_imu_per_scan), bool)
        for i, k in enumerate(ks):
            t = float(data["scan_times"][k]) + cfg.scan_period
            dts[i], accs[i], gyrs[i], valid[i] = odo._imu_batch_np(t)
            odo.time = t
        chunks.append((
            np.stack([data["scans_xyz"][k] for k in ks]).astype(np.float32),
            np.asarray([data["scans_n"][k] for k in ks], np.int32),
            dts, accs, gyrs, valid))

    state0 = (odo.filter_state, odo.global_state, odo.last_surf,
              odo.last_corner)
    n_dev = len(jax.devices())

    results = []
    for B in [int(b) for b in args.batches.split(",")]:
        mesh = make_mesh(min(B, n_dev))
        step, put = make_sharded_chunk_replay(cfg, mesh)
        state = put(jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0))
        dev_chunks = [put(jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + x.shape), c))
            for c in chunks]

        st, poses = step(state, *dev_chunks[0])   # compile + warm
        np.asarray(poses[0])
        t0 = time.perf_counter()
        st = state
        for c in range(1, args.chunks + 1):
            st, poses = step(st, *dev_chunks[c])
        np.asarray(poses[0])                      # honest D2H fence
        dt = time.perf_counter() - t0
        total = B * K * args.chunks / dt
        devices = min(B, n_dev)
        if not results:
            results.append((B, total))
        # per-device scaling efficiency: total throughput per device used,
        # relative to the B=1 run (the ≥70% BASELINE target applies when
        # devices actually scale with B; on one chip this reports how much
        # of the chip's single-stream rate the batched form retains)
        print(json.dumps({
            "metric": "replay_scans_per_sec",
            "batch": B,
            "devices": devices,
            "value": round(total, 2),
            "per_seq": round(total / B, 2),
            "per_device_efficiency": round(
                total / (results[0][1] * devices), 3),
        }))


if __name__ == "__main__":
    main()
