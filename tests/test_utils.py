"""Tests for trajectory IO/eval, metrics, and checkpoint/resume."""
import numpy as np
import jax.numpy as jnp
import pytest

from lins_tpu.config import VLP16
from lins_tpu.utils import trajectory as traj
from lins_tpu.utils.metrics import MetricsLog, Stopwatch


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path):
        times = np.asarray([0.0, 0.1, 0.2])
        pos = np.asarray([[0, 0, 0], [1, 0, 0], [2, 0.5, 0.1]], float)
        quat = np.tile([1.0, 0, 0, 0], (3, 1))
        p = tmp_path / "traj.tum"
        traj.write_tum(str(p), times, pos, quat)
        t2, p2, q2 = traj.read_tum(str(p))
        np.testing.assert_allclose(t2, times, atol=1e-6)
        np.testing.assert_allclose(p2, pos, atol=1e-6)
        np.testing.assert_allclose(q2, quat, atol=1e-6)

    def test_ate_aligned_zero(self):
        rng = np.random.default_rng(0)
        gt = rng.normal(size=(50, 3))
        # rigidly transformed estimate -> aligned ATE ~ 0
        th = 0.3
        R = np.asarray([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        est = gt @ R.T + [5.0, -2.0, 1.0]
        assert traj.ate(est, gt, align=True) < 1e-10
        assert traj.ate(est, gt, align=False) > 1.0

    def test_rpe(self):
        gt = np.cumsum(np.ones((30, 3)) * 0.1, axis=0)
        est = gt + np.linspace(0, 0.3, 30)[:, None] * [1, 0, 0]  # drift
        assert traj.rpe(est, gt, delta=5) > 0.01
        assert traj.rpe(gt, gt, delta=5) < 1e-12

    def test_rpe_world_frame_invariant(self):
        """A perfect estimate expressed in a rotated/translated world frame
        must score ~0 RPE — both with orientations (TUM local-frame
        definition) and without (aligned fallback).  Round 2's raw
        world-frame comparison scored it sin(yaw) x window displacement."""
        rng = np.random.default_rng(3)
        gt = np.cumsum(rng.normal(scale=0.15, size=(60, 3)), axis=0)
        th = 0.15  # the gentle trajectory's ~8.5 deg initial-yaw offset
        R = np.asarray([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        est = gt @ R.T + [2.0, -1.0, 0.5]
        # without orientations: aligned fallback
        assert traj.rpe(est, gt, delta=10) < 1e-9
        # with orientations: gt yaw follows velocity; est = frame-rotated
        def yaw_quats(pos, R_extra=np.eye(3)):
            v = np.gradient(pos, axis=0)
            yaw = np.arctan2(v[:, 1], v[:, 0])
            q = np.stack([np.cos(yaw / 2), 0 * yaw, 0 * yaw,
                          np.sin(yaw / 2)], 1)
            return q
        qg = yaw_quats(gt)
        # est orientation = world-rotation ∘ gt orientation
        half = th / 2
        q_off = np.asarray([np.cos(half), 0, 0, np.sin(half)])
        def qmul(a, b):
            w = a[:, 0] * b[:, 0] - np.sum(a[:, 1:] * b[:, 1:], 1)
            xyz = (a[:, :1] * b[:, 1:] + b[:, :1] * a[:, 1:]
                   + np.cross(a[:, 1:], b[:, 1:]))
            return np.concatenate([w[:, None], xyz], 1)
        qe = qmul(np.broadcast_to(q_off, qg.shape).copy(), qg)
        assert traj.rpe(est, gt, delta=10, est_quat=qe, gt_quat=qg) < 1e-6

    def test_associate(self):
        ta = np.asarray([0.0, 0.1, 0.2, 0.35])
        tb = np.asarray([0.001, 0.105, 0.31])
        ia, ib = traj.associate(ta, tb, max_dt=0.02)
        assert list(ia) == [0, 1] and list(ib) == [0, 1]


class TestMetrics:
    def test_log_and_summary(self, tmp_path):
        log = MetricsLog()
        log.record("odometry", iters=3, residual=0.5)
        log.record("odometry", iters=5, residual=0.3)
        assert log.mean("odometry/iters") == 4
        p = tmp_path / "metrics.jsonl"
        log.dump(str(p))
        assert len(p.read_text().strip().split("\n")) == 2

    def test_stopwatch(self):
        sw = Stopwatch()
        assert sw.toc_ms() >= 0.0


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        from lins_tpu.mapping.mapper import LinsMapper
        from lins_tpu.odometry import LinsOdometry
        from lins_tpu.utils import checkpoint as ckpt
        from lins_tpu.imu import eskf
        from lins_tpu.parallel.replay import dummy_feature_ref

        cfg = VLP16.replace(max_keyframes=8)
        odo = LinsOdometry(cfg, dtype=jnp.float32)
        odo.status = 3
        odo.time = 1.25
        odo.filter_state = eskf.initial_state(cfg, rn=[1, 2, 3],
                                              dtype=jnp.float32)
        odo.last_surf = dummy_feature_ref(cfg.max_less_flat, None)
        odo.last_corner = dummy_feature_ref(cfg.max_less_sharp, None)
        mapper = LinsMapper(cfg, corner_cap=16, surf_cap=16,
                            map_corner_cap=64, map_surf_cap=64)
        mapper.last_time = 1.0

        p = tmp_path / "state.npz"
        ckpt.save_state(str(p), odo, mapper)

        odo2 = LinsOdometry(cfg, dtype=jnp.float32)
        mapper2 = LinsMapper(cfg, corner_cap=16, surf_cap=16,
                             map_corner_cap=64, map_surf_cap=64)
        meta = ckpt.load_state(str(p), odo2, mapper2)
        assert odo2.status == 3 and odo2.time == 1.25
        np.testing.assert_allclose(np.asarray(odo2.filter_state.rn),
                                   [1, 2, 3], atol=1e-6)
        assert mapper2.last_time == 1.0

    def test_export_global_map(self, tmp_path):
        from lins_tpu.mapping import keyframes as kf
        from lins_tpu.mapping.mapper import LinsMapper
        from lins_tpu.utils import checkpoint as ckpt

        cfg = VLP16.replace(max_keyframes=8)
        mapper = LinsMapper(cfg, corner_cap=16, surf_cap=16,
                            map_corner_cap=64, map_surf_cap=64)
        cloud = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, (16, 3)),
                            jnp.float32)
        mapper.state = mapper.state._replace(store=kf.add_keyframe(
            mapper.state.store, jnp.asarray([1.0, 0, 0]),
            jnp.asarray([1.0, 0, 0, 0]), 0.0,
            cloud, jnp.ones(16, bool), cloud, jnp.ones(16, bool)))
        p = tmp_path / "map.npz"
        n = ckpt.export_global_map(str(p), mapper, leaf=0.1)
        assert n > 0
        pts = np.load(str(p))["points"]
        assert pts.shape[1] == 3

        # PLY export: binary little-endian, round-trips the same points
        p2 = tmp_path / "map.ply"
        n2 = ckpt.export_global_map(str(p2), mapper, leaf=0.1)
        assert n2 == n
        raw = p2.read_bytes()
        head, _, body = raw.partition(b"end_header\n")
        assert b"element vertex %d" % n in head
        pts2 = np.frombuffer(body, np.float32).reshape(-1, 3)
        np.testing.assert_allclose(np.sort(pts2, 0), np.sort(pts, 0),
                                   atol=1e-6)
