#!/usr/bin/env python
"""lins_tpu command-line runner — the user-facing equivalent of the
reference's launch file (run_port_exp.launch): decode a dataset, run the
full SLAM pipeline, write the TUM trajectory, metrics, map export, and
(optionally) evaluate ATE/RPE against ground truth.

Usage:
  python run_slam.py --synthetic gentle --scans 40 --out out/
  python run_slam.py --bag port.bag --imu-topic /imu/data \
                     --cloud-topic /velodyne_points --out out/
  python run_slam.py --kitti /data/kitti --seq 00 --preset hdl64 --out out/
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--synthetic", metavar="KIND",
                     help="synthetic trajectory: static|straight|gentle|"
                          "turny|loop|bigloop (loop: closed revisiting "
                          "circuit; bigloop: ~181 m ring course whose "
                          "extent exceeds the 50 m radius window)")
    src.add_argument("--bag", help="rosbag 2.0 file (uncompressed chunks)")
    src.add_argument("--kitti", help="KITTI odometry root directory")
    ap.add_argument("--seq", default="00", help="KITTI sequence id")
    ap.add_argument("--preset", default="vlp16",
                    help="sensor preset: vlp16|os1_64|hdl64|tiny")
    ap.add_argument("--config", help="YAML/JSON config overriding the preset")
    ap.add_argument("--scans", type=int, default=None, help="max scans")
    ap.add_argument("--speed", type=float, default=1.5)
    ap.add_argument("--imu-topic", default="/imu/data")
    ap.add_argument("--cloud-topic", default="/velodyne_points")
    ap.add_argument("--no-mapping", action="store_true",
                    help="odometry only (no scan-to-map backend)")
    ap.add_argument("--no-loop-closure", action="store_true",
                    help="mapping with the 50 m-RADIUS window and no loop "
                         "machinery (the reference's loopClosureEnableFlag="
                         "false mode)")
    ap.add_argument("--window-no-loop", action="store_true",
                    help="mapping with the recent-keyframe WINDOW map (the "
                         "LC-mode local map) but loop attempts disabled — "
                         "the 'window, no loops' baseline of the LC matrix")
    ap.add_argument("--loop-frac", type=float, default=None,
                    help="override loop_consistency_frac (drift-rate bound "
                         "of the odometry-consistency gate; raise for "
                         "high-noise courses where true drift exceeds 5%% "
                         "of arc)")
    ap.add_argument("--loop-fitness", type=float, default=None,
                    help="override history_keyframe_fitness_score (ICP "
                         "mean-squared-distance acceptance gate; high IMU "
                         "noise blurs the map and inflates fitness of "
                         "CORRECT alignments past the reference's 0.3)")
    ap.add_argument("--lc-map", choices=("recent", "radius"), default=None,
                    help="local-map selection in loop-closure mode: "
                         "'recent' = last-50 window (the reference), "
                         "'radius' = 50 m-radius selection (relocalizes "
                         "against the loop-corrected old map on revisits)")
    ap.add_argument("--loop-rewrite-min", type=float, default=None,
                    help="override loop_rewrite_min_m (implied-correction "
                         "threshold below which an accepted loop edge is "
                         "add-only, no solve/rewrite)")
    ap.add_argument("--pallas", action="store_true",
                    help="enable Pallas kernels (TPU)")
    ap.add_argument("--no-pallas-select", action="store_true",
                    help="with --pallas: keep the label kernel but use the "
                         "XLA sort path for the scan-to-map candidate "
                         "prune (A/B isolation)")
    ap.add_argument("--full-queries", action="store_true",
                    help="disable the measured-occupancy map_query_* caps "
                         "(A/B isolation)")
    ap.add_argument("--feature-scale", type=float, default=None,
                    help="multiply the per-scan feature capacities "
                         "(max_sharp/less_sharp/flat/less_flat/outlier) and "
                         "the map_query_* caps by this factor.  The presets "
                         "size these for 16 rings; 64-beam sensors truncate "
                         "features at the VLP-16 caps (the HDL-64 drift "
                         "lever noted in PARITY.md round-5)")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="save state every N scans")
    ap.add_argument("--resume", help="checkpoint file to resume from")
    ap.add_argument("--out", default="out", help="output directory")
    ap.add_argument("--map-format", default="npz",
                    choices=("npz", "ply", "none"),
                    help="global map export format (none: skip)")
    ap.add_argument("--no-state", action="store_true",
                    help="skip the final_state.npz dump (saves are "
                         "uncompressed + derived-state-free, ~seconds at "
                         "VLP-16 scale; this skips even that)")
    def positive_int(v):
        iv = int(v)
        if iv < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return iv

    ap.add_argument("--chunk", type=positive_int, default=24,
                    help="scans per device dispatch in replay mode")
    ap.add_argument("--imu-noise-scale", type=float, default=1.0,
                    help="multiplier on the --imu-noise noise densities and "
                    "biases (drift severity knob for loop-closure studies)")
    ap.add_argument("--imu-noise", action="store_true",
                    help="synthetic only: add IMU noise + fixed biases "
                         "(acc 0.02 m/s^2, gyr 0.002 rad/s) so odometry "
                         "drifts realistically")
    ap.add_argument("--stream", action="store_true",
                    help="per-scan streaming mode (default: chunked replay "
                         "with HBM prefetch — same odometry, much faster on "
                         "remote-attached TPUs)")
    ap.add_argument("--multihost", action="store_true",
                    help="enroll this process in a multi-host JAX cluster "
                         "via jax.distributed (JAX_COORDINATOR / "
                         "JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars; see "
                         "lins_tpu.parallel.multihost)")
    args = ap.parse_args()

    import numpy as np

    from lins_tpu.config import PRESETS, SlamConfig
    from lins_tpu.slam import LinsSlam, run_sequence
    from lins_tpu.utils import checkpoint as ckpt
    from lins_tpu.utils import trajectory as traj
    from lins_tpu.utils.metrics import MetricsLog
    from lins_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.multihost:
        from lins_tpu.parallel import multihost
        import jax
        enrolled = multihost.initialize()
        print(json.dumps(dict(
            multihost=enrolled, process_index=jax.process_index(),
            process_count=jax.process_count(),
            global_devices=len(jax.devices()))))

    cfg = PRESETS[args.preset]
    if args.config:
        loaded = (SlamConfig.from_yaml(args.config)
                  if args.config.endswith((".yaml", ".yml"))
                  else SlamConfig.from_json(args.config))
        cfg = loaded
    if args.no_loop_closure:
        cfg = cfg.replace(loop_closure_enabled=False)
    if args.window_no_loop:
        cfg = cfg.replace(loop_closure_enabled=True, loop_attempts=False)
    if args.loop_frac is not None:
        cfg = cfg.replace(loop_consistency_frac=args.loop_frac)
    if args.loop_fitness is not None:
        cfg = cfg.replace(history_keyframe_fitness_score=args.loop_fitness)
    if args.loop_rewrite_min is not None:
        cfg = cfg.replace(loop_rewrite_min_m=args.loop_rewrite_min)
    if args.lc_map is not None:
        cfg = cfg.replace(lc_map_mode=args.lc_map)
    if args.pallas:
        cfg = cfg.replace(use_pallas=True, use_pallas_select=True)
    if args.no_pallas_select:
        cfg = cfg.replace(use_pallas_select=False)
    if args.full_queries:
        cfg = cfg.replace(map_query_corner=None, map_query_surf=None)
    if args.feature_scale is not None:
        def _sc(v):  # scale a capacity, keep it lane-aligned
            return max(128, int(-(-v * args.feature_scale // 128)) * 128)
        cfg = cfg.replace(
            max_sharp=_sc(cfg.max_sharp),
            max_less_sharp=_sc(cfg.max_less_sharp),
            max_flat=_sc(cfg.max_flat),
            max_less_flat=_sc(cfg.max_less_flat),
            max_outlier=_sc(cfg.max_outlier),
            map_query_corner=(None if cfg.map_query_corner is None
                              else _sc(cfg.map_query_corner)),
            map_query_surf=(None if cfg.map_query_surf is None
                            else _sc(cfg.map_query_surf)),
            max_map_corner=_sc(cfg.max_map_corner),
            max_map_surf=_sc(cfg.max_map_surf))

    # ---- load data ----
    if args.synthetic:
        from lins_tpu.datasets import synthetic as syn
        cfg = cfg.replace(max_points=min(cfg.max_points, cfg.grid_size))
        s = args.imu_noise_scale
        noise = (dict(acc_noise=0.02 * s, gyr_noise=0.002 * s,
                      ba=tuple(s * v for v in (0.05, -0.03, 0.02)),
                      bw=tuple(s * v for v in (0.002, -0.001, 0.0015)))
                 if args.imu_noise else {})
        data = syn.generate_sequence(cfg, n_scans=args.scans or 40,
                                     kind=args.synthetic, speed=args.speed,
                                     **noise)
    elif args.bag:
        from lins_tpu.datasets import bag as bagmod
        raw = bagmod.read_bag(args.bag, args.imu_topic, args.cloud_topic)
        data = bagmod.bag_to_sequence(raw, cfg)
    else:
        from lins_tpu.datasets import kitti
        data = kitti.load_sequence(args.kitti, args.seq, cfg,
                                   max_scans=args.scans)

    os.makedirs(args.out, exist_ok=True)
    n = args.scans or len(data["scans_xyz"])

    slam = LinsSlam(cfg, enable_mapping=not args.no_mapping)
    if args.resume:
        ckpt.load_state(args.resume, slam.odometry, slam.mapper)

    chunk = args.chunk    # scans per odometry dispatch in replay mode; the
    # mapping cadence inside the chunk stays mapping_process_interval
    # regardless
    t_c = time.perf_counter()
    slam.warmup(chunk=None if args.stream else chunk)
    compile_s = time.perf_counter() - t_c

    log = MetricsLog()
    t0 = time.perf_counter()
    if args.stream or args.checkpoint_every:
        imu_i = 0
        for k in range(min(n, len(data["scans_xyz"]))):
            t_scan = float(data["scan_times"][k]) + cfg.scan_period
            imu_t = data.get("imu_times", [])
            while imu_i < len(imu_t) and imu_t[imu_i] <= t_scan + 1e-9:
                slam.add_imu(imu_t[imu_i], data["imu_acc"][imu_i],
                             data["imu_gyr"][imu_i])
                imu_i += 1
            slam.add_scan(t_scan, data["scans_xyz"][k], data["scans_n"][k])
            if args.checkpoint_every and (k + 1) % args.checkpoint_every == 0:
                ckpt.save_state(os.path.join(args.out, f"ckpt_{k+1:05d}.npz"),
                                slam.odometry, slam.mapper)
    else:
        slam.run_replay(data, n_scans=min(n, len(data["scans_xyz"])),
                        chunk=chunk)
    elapsed = time.perf_counter() - t0

    # ---- outputs ----
    # final-estimate solve: incorporate add-only loop edges (those below
    # loop_rewrite_min_m) into the keyframe poses before exporting the map
    # trajectory — the reference's last correctPoses rewrite
    n_loops_run = (int(np.asarray(slam.mapper.state.n_loops))
                   if slam.mapper is not None else 0)
    if n_loops_run > 0:
        slam.mapper.final_solve()
    ts, ps, qs = slam.trajectory_arrays()
    traj.write_tum(os.path.join(args.out, "trajectory.tum"), ts, ps, qs)

    for m in slam.odometry.metrics:
        log.record("odometry", **{k: np.asarray(v).item()
                                  for k, v in m.items()})
    if slam.mapper is not None:
        for m in slam.mapper.metrics:
            log.record("mapping", **{k: np.asarray(v).item()
                                     for k, v in m.items()})
        for m in slam.mapper.loop_info:
            log.record("loop", **{k: np.asarray(v).item()
                                  for k, v in m.items()})
        if args.map_format != "none":
            ckpt.export_global_map(
                os.path.join(args.out, f"global_map.{args.map_format}"),
                slam.mapper)
        if not args.no_state:
            t_s = time.perf_counter()
            ckpt.save_state(os.path.join(args.out, "final_state.npz"),
                            slam.odometry, slam.mapper)
            state_save_s = round(time.perf_counter() - t_s, 2)
    log.dump(os.path.join(args.out, "metrics.jsonl"))

    summary = dict(
        scans=len(ts), elapsed_s=round(elapsed, 2),
        compile_s=round(compile_s, 2),
        scans_per_sec=round(len(ts) / max(elapsed, 1e-9), 2),
        keyframes=(int(slam.mapper.state.store.count)
                   if slam.mapper else None),
        loops=(int(slam.mapper.state.n_loops) if slam.mapper else None),
        # solves that actually rewrote the map (vs add-only edges below
        # loop_rewrite_min_m and guard-discarded solves)
        loops_applied=(sum(int(np.asarray(m["applied"]))
                           for m in slam.mapper.loop_info)
                       if slam.mapper else None),
    )
    if slam.mapper is not None and not args.no_state:
        summary["state_save_s"] = state_save_s
    if slam.mapper is not None:
        # FINAL keyframe trajectory — the loop-corrected map poses.  The
        # causal stream above never rewrites published poses (the
        # reference's /integrated_to_init), so on a long single revisit
        # most of its ATE is pre-loop drift; the corrected keyframe poses
        # are what the map (and any relocalization against it) actually
        # uses, and the standard basis for final-estimate evaluation.
        st = slam.mapper.state.store
        K = st.capacity
        count = int(np.asarray(st.count))
        ids = np.arange(max(count - K, 0), count)
        slots = ids % K
        kf_t = np.asarray(st.time)[slots]
        kf_p = np.asarray(st.pos)[slots]
        kf_q = np.asarray(st.quat)[slots]
        traj.write_tum(os.path.join(args.out, "trajectory_kf.tum"),
                       kf_t, kf_p, kf_q)

    if "gt_pos" in data:
        gt = np.asarray(data["gt_pos"])[1:1 + len(ps)]
        gt_q = np.asarray(data["gt_quat"])[1:1 + len(ps)]
        summary["ate_rmse_m"] = round(traj.ate(ps, gt, align=True), 4)
        summary["rpe_m"] = round(traj.rpe(ps, gt, est_quat=qs,
                                          gt_quat=gt_q), 4)
        if slam.mapper is not None and len(kf_t):
            # gt at each keyframe's scan time: NEAREST-stamp pairing.
            # Keyframe times are float32 copies of the scan end-time grid;
            # beyond ~8-60 s of runtime their ulp exceeds any fixed rounding
            # tolerance, so exact-match rounding paired keyframes with the
            # NEXT scan's gt pose (~one scan period of motion of bias each;
            # advisor r4).
            j = np.clip(np.searchsorted(ts, kf_t), 1, len(ps) - 1)
            pick_prev = (np.abs(ts[j - 1] - kf_t) <= np.abs(ts[j] - kf_t))
            ji = np.where(pick_prev, j - 1, j)
            summary["ate_kf_m"] = round(traj.ate(kf_p, gt[ji], align=True),
                                        4)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
