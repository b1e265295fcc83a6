"""Full SLAM pipeline orchestrator: odometry -> mapping -> fused output.

Replaces the reference's 4-process ROS graph (run_port_exp.launch:17-31) with
an in-process pipeline: LinsOdometry (image_projection + lins_fusion nodes),
LinsMapper (lidar_mapping node), and the high-rate pose fusion of
transform_fusion_node.cpp:91-215 (odometry pose composed with the latest map
correction).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3
from lins_tpu.mapping.mapper import LinsMapper, warm_start
from lins_tpu.odometry import LinsOdometry


class LinsSlam:
    """End-to-end LINS: feed IMU + scans, read fused high-rate poses."""

    def __init__(self, cfg: SlamConfig, dtype=None, enable_mapping=True,
                 **mapper_kw):
        self.cfg = cfg
        self.odometry = LinsOdometry(cfg, dtype=dtype)
        self.mapper = LinsMapper(cfg, **mapper_kw) if enable_mapping else None
        self.trajectory = []   # fused (t, pos, quat), device arrays

    def warmup(self, chunk=None):
        """Compile every per-scan program before streaming (LinsOdometry /
        LinsMapper warmup docstrings explain why; persistent-cache fast)."""
        self.odometry.warmup(chunk=chunk)
        if self.mapper is not None:
            self.mapper.warmup(cloud_dtype=self.odometry.dtype)

    def add_imu(self, t, acc, gyr):
        self.odometry.add_imu(t, acc, gyr)

    def add_scan(self, t, xyz, n_points):
        out = self.odometry.add_scan(t, xyz, n_points)
        if out is None:
            return None
        odo_pos, odo_quat = out

        if self.mapper is not None:
            corner = self.odometry.last_corner
            surf = self.odometry.last_surf
            self.mapper.process(t, odo_pos, odo_quat,
                                corner["xyz"], corner["valid"],
                                surf["xyz"], surf["valid"])
            self.mapper.maybe_close_loop(t)
            # high-rate fused output (transform_fusion_node)
            pos, quat = warm_start(self.mapper.state, odo_pos, odo_quat)
        else:
            pos, quat = odo_pos, odo_quat

        self.trajectory.append((t, pos, quat))
        return pos, quat

    def trajectory_arrays(self):
        ts = np.asarray([t for t, _, _ in self.trajectory])
        ps = np.stack([np.asarray(p) for _, p, _ in self.trajectory])
        qs = np.stack([np.asarray(q) for _, _, q in self.trajectory])
        return ts, ps, qs


def run_sequence(slam: LinsSlam, data: dict, n_scans: int | None = None):
    """Drive a generated/loaded sequence dict through the pipeline."""
    cfg = slam.cfg
    n = n_scans or len(data["scans_xyz"])
    imu_i = 0
    for k in range(n):
        t_scan = float(data["scan_times"][k]) + cfg.scan_period
        while (imu_i < len(data["imu_times"])
               and data["imu_times"][imu_i] <= t_scan + 1e-9):
            slam.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i],
                         data["imu_gyr"][imu_i])
            imu_i += 1
        slam.add_scan(t_scan, data["scans_xyz"][k], data["scans_n"][k])
    return slam


def ate_rmse(est_pos: np.ndarray, gt_pos: np.ndarray,
             align_frame: tuple | None = None) -> float:
    """ATE RMSE after aligning the ground truth into the estimator's world
    frame (the first processed scan's end pose)."""
    if align_frame is not None:
        R0, p0 = align_frame
        gt = (np.asarray(R0).T @ (gt_pos - p0).T).T
    else:
        gt = gt_pos
    m = min(len(est_pos), len(gt))
    err = np.linalg.norm(est_pos[:m] - gt[:m], axis=1)
    return float(np.sqrt(np.mean(err ** 2)))
