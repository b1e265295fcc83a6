"""KITTI loader tests on a synthesized mini-sequence in KITTI layout."""
import os

import numpy as np
import pytest

from lins_tpu.config import HDL64
from lins_tpu.datasets import kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    seq = root / "sequences" / "04"
    (seq / "velodyne").mkdir(parents=True)
    (root / "poses").mkdir()
    rng = np.random.default_rng(0)
    n_scans, n_pts = 5, 2000
    times = np.arange(n_scans) * 0.1
    np.savetxt(seq / "times.txt", times)
    for k in range(n_scans):
        pts = np.zeros((n_pts, 4), np.float32)
        pts[:, :3] = rng.uniform(-30, 30, (n_pts, 3))
        pts[:, 3] = rng.uniform(0, 1, n_pts)
        pts.tofile(seq / "velodyne" / f"{k:06d}.bin")
    # straight-line poses, cam0 frame == velodyne (no calib file)
    poses = np.zeros((n_scans, 12))
    for k in range(n_scans):
        T = np.eye(4)
        T[0, 3] = 1.5 * k * 0.1
        poses[k] = T[:3, :].reshape(-1)
    np.savetxt(root / "poses" / "04.txt", poses)
    return str(root)


class TestKittiLoader:
    def test_loads_scans(self, kitti_root):
        cfg = HDL64.replace(max_points=4096)
        seq = kitti.load_sequence(kitti_root, "04", cfg)
        assert seq["scans_xyz"].shape == (5, 4096, 3)
        assert np.all(seq["scans_n"] == 2000)
        assert len(seq["scan_times"]) == 5

    def test_gt_and_imu_synthesis(self, kitti_root):
        cfg = HDL64.replace(max_points=4096)
        seq = kitti.load_sequence(kitti_root, "04", cfg, imu_rate=100.0)
        assert "gt_pos" in seq
        np.testing.assert_allclose(seq["gt_pos"][:, 0],
                                   0.15 * np.arange(5), atol=1e-9)
        # constant velocity: specific force ~ -g in body frame, zero gyro
        acc = seq["imu_acc"]
        gyr = seq["imu_gyr"]
        assert np.allclose(acc[2:-2, 2], 9.81, atol=0.1)
        assert np.allclose(gyr[2:-2], 0.0, atol=1e-6)

    def test_cap_respected(self, kitti_root):
        cfg = HDL64.replace(max_points=1000)
        seq = kitti.load_sequence(kitti_root, "04", cfg, max_scans=2)
        assert seq["scans_xyz"].shape[0] == 2
        assert np.all(seq["scans_n"] == 1000)
