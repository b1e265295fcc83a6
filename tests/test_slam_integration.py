"""Long-horizon SLAM integration on the TINY sensor preset: mapping drift
reduction over many scans, checkpoint/resume continuity, IMU calibration."""
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import TINY, VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.geom import so3
from lins_tpu.slam import LinsSlam, ate_rmse, run_sequence


@pytest.fixture(scope="module")
def tiny_seq():
    return syn.generate_sequence(TINY, n_scans=40, kind="turny", speed=1.0)


def feed(slam, data, start=0, end=None):
    cfg = slam.cfg
    end = end or len(data["scans_xyz"])
    imu_t = data["imu_times"]
    for k in range(start, end):
        t_scan = float(data["scan_times"][k]) + cfg.scan_period
        lo = (imu_t > (data["scan_times"][start] if k == start else t_prev))
        hi = imu_t <= t_scan + 1e-9
        for i in np.nonzero(lo & hi)[0]:
            slam.add_imu(imu_t[i], data["imu_acc"][i], data["imu_gyr"][i])
        slam.add_scan(t_scan, data["scans_xyz"][k], data["scans_n"][k])
        t_prev = t_scan
    return slam


class TestLongHorizon:
    def test_mapping_bounds_drift(self, tiny_seq):
        data = tiny_seq
        R0 = np.asarray(so3.quat_to_mat(jnp.asarray(data["gt_quat"][0],
                                                    jnp.float64)))
        p0 = data["gt_pos"][0]

        def run(mapping):
            slam = LinsSlam(TINY, enable_mapping=mapping, corner_cap=256,
                            surf_cap=1024, map_corner_cap=4096,
                            map_surf_cap=8192)
            run_sequence(slam, data)
            ts, ps, qs = slam.trajectory_arrays()
            return ate_rmse(ps, data["gt_pos"][1:1 + len(ps)], (R0, p0))

        ate_odo = run(False)
        ate_map = run(True)
        assert ate_map < 0.5 * ate_odo
        assert ate_map < 0.2


class TestReplayMode:
    def test_replay_matches_streaming(self, tiny_seq):
        """run_replay (chunked, device-side mapping cadence) must match
        streaming scan-for-scan: same timestamps, same mapping/loop
        cadence, poses equal to f32 fusion-rounding tolerance."""
        data = tiny_seq
        s1 = run_sequence(LinsSlam(TINY), data, 40)
        s2 = LinsSlam(TINY).run_replay(data, 40, chunk=12)

        t1, p1, q1 = s1.trajectory_arrays()
        t2, p2, q2 = s2.trajectory_arrays()
        assert len(t1) == len(t2)
        np.testing.assert_allclose(t1, t2)
        np.testing.assert_allclose(p2, p1, atol=2e-2)
        np.testing.assert_allclose(q2, q1, atol=5e-3)
        assert len(s1.mapper.metrics) == len(s2.mapper.metrics)
        assert len(s1.mapper.loop_info) == len(s2.mapper.loop_info)
        assert int(s1.mapper.state.store.count) == int(
            s2.mapper.state.store.count)
        # metric records must materialize identically (lazy chunk views)
        m1, m2 = s1.mapper.metrics[-1], s2.mapper.metrics[-1]
        assert set(m1.keys()) == set(m2.keys())

    def test_replay_tail_scans(self, tiny_seq):
        """A scan count that doesn't fill the last chunk streams the tail."""
        s = LinsSlam(TINY).run_replay(tiny_seq, 31, chunk=12)
        assert len(s.trajectory) == 30   # scan 0 initializes only


class TestCheckpointResume:
    def test_resume_continues_trajectory(self, tiny_seq):
        from lins_tpu.utils import checkpoint as ckpt

        data = tiny_seq
        n_split, n_total = 20, 28

        # continuous run
        slam_a = LinsSlam(TINY, enable_mapping=True, corner_cap=256,
                          surf_cap=1024, map_corner_cap=4096,
                          map_surf_cap=8192)
        run_sequence(slam_a, data, n_total)
        _, ps_a, _ = slam_a.trajectory_arrays()

        # split run with checkpoint in the middle
        slam_b = LinsSlam(TINY, enable_mapping=True, corner_cap=256,
                          surf_cap=1024, map_corner_cap=4096,
                          map_surf_cap=8192)
        run_sequence(slam_b, data, n_split)
        import tempfile, os
        path = os.path.join(tempfile.mkdtemp(), "state.npz")
        ckpt.save_state(path, slam_b.odometry, slam_b.mapper)

        slam_c = LinsSlam(TINY, enable_mapping=True, corner_cap=256,
                          surf_cap=1024, map_corner_cap=4096,
                          map_surf_cap=8192)
        ckpt.load_state(path, slam_c.odometry, slam_c.mapper)
        # continue feeding scans n_split..n_total (with their imu)
        cfg = TINY
        imu_t = data["imu_times"]
        t_prev = float(data["scan_times"][n_split - 1]) + cfg.scan_period
        for k in range(n_split, n_total):
            t_scan = float(data["scan_times"][k]) + cfg.scan_period
            for i in np.nonzero((imu_t > t_prev - 0.11)
                                & (imu_t <= t_scan + 1e-9))[0]:
                slam_c.add_imu(imu_t[i], data["imu_acc"][i],
                               data["imu_gyr"][i])
            slam_c.add_scan(t_scan, data["scans_xyz"][k], data["scans_n"][k])
            t_prev = t_scan
        _, ps_c, _ = slam_c.trajectory_arrays()

        # final pose of the resumed run close to the continuous run
        err = np.linalg.norm(ps_c[-1] - ps_a[-1])
        assert err < 0.05, err


class TestLoopClosureEndToEnd:
    def test_loop_fires_in_full_replay(self):
        """The system-level loop-closure chain — detect -> submap ICP ->
        accept -> pose-graph edge -> re-solve -> keyframe pose rewrite ->
        window re-transform (lidar_mapping_node.cpp:1114-1186 + 1767-1795)
        — must actually FIRE in a full run_replay on a revisiting circuit
        (round-2 VERDICT: every prior accuracy run reported loops: 0
        because no synthetic trajectory ever returned to mapped space)."""
        cfg = TINY.replace(loop_time_gate=4.0)
        # ~1.15 laps of a 20.5 m ellipse at 2.2 m/s: returns to the start
        # area at t ~ 9.3 s with keyframes there ~9 s old (> gate); IMU
        # noise + biases make odometry drift so the correction is real
        data = syn.generate_sequence(
            cfg, n_scans=107, kind="loop", speed=2.2, loop_scale=0.32,
            acc_noise=0.02, gyr_noise=0.002,
            ba=(0.05, -0.03, 0.02), bw=(0.002, -0.001, 0.0015))
        slam = LinsSlam(cfg, corner_cap=256, surf_cap=1024,
                        map_corner_cap=4096, map_surf_cap=8192)
        slam.run_replay(data, 107, chunk=12)
        m = slam.mapper

        n_loops = int(m.state.n_loops)
        assert n_loops >= 1, "no loop closed end-to-end"
        acc = [i for i in m.loop_info
               if bool(np.asarray(i["accepted"]))]
        assert len(acc) == n_loops
        # accepted fitness within the reference gate (fitness < 0.3)
        for i in acc:
            assert float(np.asarray(i["fitness"])) < 0.3
        # the pose graph holds the loop edges on top of the odometry chain
        n_kf = int(m.state.store.count)
        n_edges = int(np.asarray(m.state.edges.count))
        assert n_edges == (n_kf - 1) + n_loops
        # trajectory stays sane after the rewrites
        ts, ps, qs = slam.trajectory_arrays()
        R0 = np.asarray(so3.quat_to_mat(jnp.asarray(data["gt_quat"][0],
                                                    jnp.float64)))
        ate = ate_rmse(ps, data["gt_pos"][1:1 + len(ps)],
                       (R0, data["gt_pos"][0]))
        assert np.isfinite(ate) and ate < 3.0, ate


class TestImuCalibration:
    def test_static_bias_estimation(self):
        cfg = TINY.replace(calibrate_imu=True, average_nums=50)
        from lins_tpu.odometry import LinsOdometry
        odo = LinsOdometry(cfg)
        rng = np.random.default_rng(0)
        true_ba = np.asarray([0.05, -0.03, 0.02])
        true_bw = np.asarray([0.01, 0.004, -0.008])
        for i in range(60):
            acc = [0, 0, 9.81] + true_ba + rng.normal(0, 1e-4, 3)
            gyr = true_bw + rng.normal(0, 1e-5, 3)
            odo.add_imu(i * 0.0025, acc, gyr)
        assert odo.imu_calibrated
        np.testing.assert_allclose(odo.estimated_ba, true_ba, atol=1e-3)
        np.testing.assert_allclose(odo.estimated_bw, true_bw, atol=1e-4)

    def test_blocks_init_until_calibrated(self):
        cfg = TINY.replace(calibrate_imu=True, average_nums=1000)
        from lins_tpu.odometry import LinsOdometry
        data = syn.generate_sequence(TINY, n_scans=1, kind="static", speed=0.0)
        odo = LinsOdometry(cfg)
        odo.add_imu(0.0, [0, 0, 9.81], [0, 0, 0])
        out = odo.add_scan(0.1, data["scans_xyz"][0], data["scans_n"][0])
        assert out is None and odo.status == 0


class TestWarmup:
    def test_warmup_compiles_all_programs(self):
        """warmup() must AOT-compile without error for both the plain and
        chunked paths (the CLI calls it before streaming)."""
        slam = LinsSlam(TINY, enable_mapping=True, corner_cap=256,
                        surf_cap=1024, map_corner_cap=4096,
                        map_surf_cap=8192)
        slam.warmup(chunk=3)

    def test_warmup_pallas_path(self):
        slam = LinsSlam(TINY.replace(use_pallas=True), enable_mapping=False)
        slam.warmup(chunk=2)


class TestRadiusMapLoopClosure:
    def test_loop_fires_with_radius_map(self):
        """lc_map_mode='radius' (round 5): loop closure with the 50 m-radius
        local-map selection — on a revisit the scan-to-map GN relocalizes
        against the loop-corrected old map.  The full chain (detect -> ICP
        -> accept -> solve -> rewrite -> radius-window re-transform +
        final_solve) must fire and stay finite."""
        cfg = TINY.replace(loop_time_gate=4.0, lc_map_mode="radius")
        data = syn.generate_sequence(
            cfg, n_scans=107, kind="loop", speed=2.2, loop_scale=0.32,
            acc_noise=0.02, gyr_noise=0.002,
            ba=(0.05, -0.03, 0.02), bw=(0.002, -0.001, 0.0015))
        slam = LinsSlam(cfg, corner_cap=256, surf_cap=1024,
                        map_corner_cap=4096, map_surf_cap=8192)
        slam.run_replay(data, 107, chunk=12)
        m = slam.mapper
        assert int(m.state.n_loops) >= 1, "no loop closed in radius-map mode"
        m.final_solve()
        ts, ps, qs = slam.trajectory_arrays()
        assert np.isfinite(ps).all()
        assert np.isfinite(np.asarray(m.state.store.pos)).all()
        R0 = np.asarray(so3.quat_to_mat(jnp.asarray(data["gt_quat"][0],
                                                    jnp.float64)))
        ate = ate_rmse(ps, data["gt_pos"][1:1 + len(ps)],
                       (R0, data["gt_pos"][0]))
        assert np.isfinite(ate) and ate < 3.0, ate
