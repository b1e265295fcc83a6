"""Pose-graph + loop-closure tests (SURVEY.md §4.3): synthetic graphs with
known optimum, ICP on perturbed clouds, loop detection gating."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import VLP16
from lins_tpu.geom import so3
from lins_tpu.graph import (
    add_edge, empty_edges, graph_cost, icp_align, optimize, relative_pose)
from lins_tpu.graph.pose_graph import optimize_cg
from lins_tpu.graph.loop_closure import detect_loop
from lins_tpu.mapping import keyframes as kf

CFG = VLP16


def make_drifted_circle(n=20, drift=0.02, seed=0):
    """Ground truth on a circle; odometry edges from truth; initial guess
    accumulates per-step drift.  Returns (gt_pos, gt_quat, init_pos,
    init_quat, edges)."""
    rng = np.random.default_rng(seed)
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    R = 5.0
    gt_pos = np.stack([R * np.cos(theta), R * np.sin(theta),
                       np.zeros(n)], 1)
    gt_yaw = theta + np.pi / 2
    gt_quat = np.stack([np.asarray(so3.rpy_to_quat(
        jnp.asarray([0.0, 0.0, y]))) for y in gt_yaw])

    K = 32
    edges = empty_edges(64, jnp.float64)
    for k in range(n - 1):
        t_rel, q_rel = relative_pose(
            jnp.asarray(gt_pos[k]), jnp.asarray(gt_quat[k]),
            jnp.asarray(gt_pos[k + 1]), jnp.asarray(gt_quat[k + 1]))
        edges = add_edge(edges, k, k + 1, t_rel, q_rel, 1e4, 1e4)

    # drifted initial guess: integrate the edges with noise
    init_pos = np.zeros((K, 3))
    init_quat = np.zeros((K, 4))
    init_quat[:, 0] = 1.0
    init_pos[0] = gt_pos[0]
    init_quat[0] = gt_quat[0]
    p, q = jnp.asarray(gt_pos[0]), jnp.asarray(gt_quat[0])
    for k in range(n - 1):
        t_rel, q_rel = relative_pose(
            jnp.asarray(gt_pos[k]), jnp.asarray(gt_quat[k]),
            jnp.asarray(gt_pos[k + 1]), jnp.asarray(gt_quat[k + 1]))
        t_noisy = t_rel + drift * rng.normal(size=3)
        p = p + so3.quat_rotate(q, jnp.asarray(t_noisy))
        q = so3.quat_normalize(so3.quat_mul(q, q_rel))
        init_pos[k + 1] = np.asarray(p)
        init_quat[k + 1] = np.asarray(q)
    return gt_pos, gt_quat, init_pos, init_quat, edges, n


class TestPoseGraph:
    def test_consistent_graph_zero_cost(self):
        gt_pos, gt_quat, _, _, edges, n = make_drifted_circle(drift=0.0)
        K = 32
        pos = jnp.zeros((K, 3), jnp.float64).at[:n].set(jnp.asarray(gt_pos))
        quat = (jnp.zeros((K, 4), jnp.float64).at[:, 0].set(1.0)
                .at[:n].set(jnp.asarray(gt_quat)))
        assert float(graph_cost(pos, quat, edges)) < 1e-12

    def test_optimize_reduces_cost(self):
        gt_pos, gt_quat, init_pos, init_quat, edges, n = make_drifted_circle()
        pos = jnp.asarray(init_pos)
        quat = jnp.asarray(init_quat)
        c0 = float(graph_cost(pos, quat, edges))
        pos2, quat2 = optimize(pos, quat, jnp.int32(n), edges, iters=8)
        c1 = float(graph_cost(pos2, quat2, edges))
        assert c1 < 1e-6 * max(c0, 1.0)

    def test_loop_edge_closes_drift(self):
        gt_pos, gt_quat, init_pos, init_quat, edges, n = make_drifted_circle(
            drift=0.05)
        # loop edge: last node -> first node with the true relative pose
        t_rel, q_rel = relative_pose(
            jnp.asarray(gt_pos[n - 1], jnp.float64),
            jnp.asarray(gt_quat[n - 1], jnp.float64),
            jnp.asarray(gt_pos[0], jnp.float64),
            jnp.asarray(gt_quat[0], jnp.float64))
        edges = add_edge(edges, n - 1, 0, t_rel, q_rel, 1e4, 1e4)
        pos2, quat2 = optimize(jnp.asarray(init_pos), jnp.asarray(init_quat),
                               jnp.int32(n), edges, iters=10)
        # endpoint error vs truth must shrink substantially
        err0 = np.linalg.norm(init_pos[n - 1] - gt_pos[n - 1])
        err1 = np.linalg.norm(np.asarray(pos2[n - 1]) - gt_pos[n - 1])
        assert err1 < 0.5 * err0
        # gauge: node 0 pinned
        np.testing.assert_allclose(np.asarray(pos2[0]), gt_pos[0], atol=1e-3)

    def test_poisoned_solve_is_noop(self):
        """A solve whose normal system turns non-finite (here: via a NaN
        edge measurement; on TPU the round-4 bigloop hit the same state
        through bf16-matmul corruption of an ill-conditioned 322-node
        system) must return the INPUT poses unchanged, not NaN — the
        per-iteration guard in optimize/optimize_cg."""
        gt_pos, gt_quat, init_pos, init_quat, edges, n = make_drifted_circle()
        bad_t = jnp.asarray([np.nan, 0.0, 0.0], jnp.float64)
        idq = jnp.asarray([1.0, 0, 0, 0], jnp.float64)
        edges_bad = add_edge(edges, 0, n - 1, bad_t, idq, 1e4, 1e4)
        for opt in (lambda *a: optimize(*a, iters=4),
                    lambda *a: optimize_cg(*a, iters=2, cg_iters=16)):
            pos2, quat2 = opt(jnp.asarray(init_pos), jnp.asarray(init_quat),
                              jnp.int32(n), edges_bad)
            np.testing.assert_array_equal(np.asarray(pos2), init_pos)
            dot = np.abs(np.sum(np.asarray(quat2[:n]) * init_quat[:n],
                                axis=1))
            np.testing.assert_allclose(dot, 1.0, atol=1e-12)


class TestICP:
    def test_aligns_perturbed_cloud(self):
        rng = np.random.default_rng(1)
        # a structured cloud: two walls + floor
        a = rng.uniform(-3, 3, (800, 2))
        pts = np.zeros((800, 3))
        pts[:300, 0] = a[:300, 0]; pts[:300, 1] = 3.0; pts[:300, 2] = a[:300, 1]
        pts[300:600, 1] = a[300:600, 0]; pts[300:600, 0] = 3.0
        pts[300:600, 2] = a[300:600, 1]
        pts[600:, :2] = a[600:, :]; pts[600:, 2] = 0.0

        R_true = np.asarray(so3.quat_to_mat(so3.exp_axis(
            jnp.asarray([0.0, 0.0, 0.05]))))
        t_true = np.asarray([0.2, -0.1, 0.05])
        src = jnp.asarray((pts - t_true) @ R_true, jnp.float32)  # R^T(p - t)
        dst = jnp.asarray(pts, jnp.float32)
        R, t, fit = icp_align(src, jnp.ones(800, bool), dst,
                              jnp.ones(800, bool), iters=30)
        np.testing.assert_allclose(np.asarray(R), R_true, atol=0.02)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=0.05)
        assert float(fit) < 0.01

    def test_recovers_multimeter_drift(self):
        """Reference-envelope parity (round-2 VERDICT missing #4): PCL ICP
        with its 100 m gate / 100 iters (lidar_mapping_node.cpp:1127-1138)
        recovers multi-meter loop drift; the coarse-to-fine schedule
        (25 m -> 1 m) must too — round 2's fixed 2 m gate could not."""
        rng = np.random.default_rng(7)
        # a structured room: two perpendicular walls + floor, 16 m across
        a = rng.uniform(-8, 8, (2400, 2))
        pts = np.zeros((2400, 3))
        pts[:800, 0] = a[:800, 0]; pts[:800, 1] = 8.0
        pts[:800, 2] = 0.3 * np.abs(a[:800, 1])
        pts[800:1600, 1] = a[800:1600, 0]; pts[800:1600, 0] = 8.0
        pts[800:1600, 2] = 0.3 * np.abs(a[800:1600, 1])
        pts[1600:, :2] = a[1600:, :]; pts[1600:, 2] = 0.0

        R_true = np.asarray(so3.quat_to_mat(so3.exp_axis(
            jnp.asarray([0.0, 0.0, 0.26]))))           # 15 deg yaw
        t_true = np.asarray([3.5, -2.0, 0.3])          # 4 m drift
        src = jnp.asarray((pts - t_true) @ R_true, jnp.float32)
        dst = jnp.asarray(pts, jnp.float32)
        R, t, fit = icp_align(src, jnp.ones(2400, bool), dst,
                              jnp.ones(2400, bool), iters=40,
                              max_corr=25.0)
        np.testing.assert_allclose(np.asarray(R), R_true, atol=0.03)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=0.15)
        assert float(fit) < 0.05


class TestLoopEndToEnd:
    def test_mapper_closes_constructed_revisit(self):
        """Out-and-back with injected drift: the full loop path (detect ->
        submap -> ICP -> edge -> PGO -> pose rewrite) must correct most of
        the drift."""
        from lins_tpu.datasets import synthetic as syn
        from lins_tpu.frontend import make_frontend
        from lins_tpu.graph import pose_graph as pg
        from lins_tpu.mapping.mapper import LinsMapper

        cfg = VLP16.replace(max_points=28800, loop_time_gate=5.0)
        fe = make_frontend(cfg)
        data = syn.generate_sequence(cfg, n_scans=1, kind="static", speed=0.0)
        feats = fe(jnp.asarray(data["scans_xyz"][0]),
                   jnp.asarray(data["scans_n"][0]))[2]
        c = feats.less_sharp.xyz[:1024].astype(jnp.float32)
        cv = feats.less_sharp.valid[:1024]
        s = feats.less_flat.xyz[:4096].astype(jnp.float32)
        sv = feats.less_flat.valid[:4096]

        mapper = LinsMapper(cfg, corner_cap=1024, surf_cap=4096,
                            map_corner_cap=8192, map_surf_cap=16384)
        st = mapper.state
        wr, wp = 1.0 / cfg.pg_odom_rot_var, 1.0 / cfg.pg_odom_pos_var
        e = jnp.asarray([1.0, 0, 0, 0])
        poses = [jnp.zeros(3), jnp.asarray([20.0, 0, 0]),
                 jnp.asarray([21.0, 0, 0])]
        times = [0.0, 10.0, 11.0]
        rels = [jnp.asarray([20.0, 0, 0]), jnp.asarray([1.0, 0, 0])]
        st = st._replace(store=kf.add_keyframe(
            st.store, poses[0], e, times[0], c, cv, s, sv))
        for k in range(1, 3):
            st = st._replace(
                store=kf.add_keyframe(st.store, poses[k], e, times[k],
                                      c, cv, s, sv),
                edges=pg.add_edge(st.edges, k - 1, k, rels[k - 1], e, wr, wp))
        drift = jnp.asarray([0.5, 0.3, 0.0])
        st = st._replace(
            store=kf.add_keyframe(st.store, drift, e, 60.0, c, cv, s, sv),
            edges=pg.add_edge(st.edges, 2, 3,
                              jnp.asarray([-20.5, 0.3, 0.0]), e, wr, wp))
        mapper.state = st

        info = mapper.maybe_close_loop(60.0)
        assert bool(info["accepted"])
        assert int(mapper.state.n_loops) == 1
        corrected = np.asarray(mapper.state.store.pos[3])
        assert np.linalg.norm(corrected) < 0.5 * float(jnp.linalg.norm(drift))


class TestLoopConsistencyGate:
    """Round-4 hardening (VERDICT r3 #3): a loop edge whose implied
    correction exceeds the drift-rate bound is rejected even when its ICP
    fitness passes — the reference's fitness-only gate
    (lidar_mapping_node.cpp:1141) admits such edges."""

    def _build(self, drift_vec):
        from lins_tpu.datasets import synthetic as syn
        from lins_tpu.frontend import make_frontend
        from lins_tpu.graph import pose_graph as pg
        from lins_tpu.mapping.mapper import LinsMapper

        cfg = VLP16.replace(max_points=28800, loop_time_gate=5.0)
        fe = make_frontend(cfg)
        data = syn.generate_sequence(cfg, n_scans=1, kind="static", speed=0.0)
        feats = fe(jnp.asarray(data["scans_xyz"][0]),
                   jnp.asarray(data["scans_n"][0]))[2]
        c = feats.less_sharp.xyz[:1024].astype(jnp.float32)
        cv = feats.less_sharp.valid[:1024]
        s = feats.less_flat.xyz[:4096].astype(jnp.float32)
        sv = feats.less_flat.valid[:4096]
        mapper = LinsMapper(cfg, corner_cap=1024, surf_cap=4096,
                            map_corner_cap=8192, map_surf_cap=16384)
        st = mapper.state
        wr, wp = 1.0 / cfg.pg_odom_rot_var, 1.0 / cfg.pg_odom_pos_var
        e = jnp.asarray([1.0, 0, 0, 0])
        poses = [jnp.zeros(3), jnp.asarray([20.0, 0, 0]),
                 jnp.asarray([21.0, 0, 0])]
        times = [0.0, 10.0, 11.0]
        rels = [jnp.asarray([20.0, 0, 0]), jnp.asarray([1.0, 0, 0])]
        st = st._replace(store=kf.add_keyframe(
            st.store, poses[0], e, times[0], c, cv, s, sv))
        for k in range(1, 3):
            st = st._replace(
                store=kf.add_keyframe(st.store, poses[k], e, times[k],
                                      c, cv, s, sv),
                edges=pg.add_edge(st.edges, k - 1, k, rels[k - 1], e,
                                  wr, wp))
        drift = jnp.asarray(drift_vec, jnp.float32)
        st = st._replace(
            store=kf.add_keyframe(st.store, drift, e, 60.0, c, cv, s, sv),
            edges=pg.add_edge(st.edges, 2, 3,
                              drift - jnp.asarray([21.0, 0, 0]), e, wr, wp))
        mapper.state = st
        return mapper

    def test_path_length(self):
        mapper = self._build([0.5, 0.3, 0.0])
        from lins_tpu.graph.loop_closure import path_length

        arc = float(path_length(mapper.state.store, 0, 3))
        expect = 20.0 + 1.0 + float(np.linalg.norm(
            np.asarray([0.5, 0.3, 0.0]) - np.asarray([21.0, 0.0, 0.0])))
        assert abs(arc - expect) < 1e-3

    def test_implausible_correction_rejected(self):
        """An 8+ m implied correction over a ~46 m path (17% drift rate)
        is a misalignment by the 5% consistency bound — rejected."""
        mapper = self._build([8.0, 5.0, 0.0])
        info = mapper.maybe_close_loop(60.0)
        assert not bool(info["accepted"])
        assert int(mapper.state.n_loops) == 0

    def test_plausible_correction_accepted(self):
        """The same scenario at a realistic drift magnitude passes (the
        existing TestLoopEndToEnd covers the full rewrite)."""
        mapper = self._build([0.5, 0.3, 0.0])
        info = mapper.maybe_close_loop(60.0)
        assert bool(info["accepted"])


class TestLoopDetection:
    def _store_with_track(self, positions, times):
        store = kf.empty_store(CFG.replace(max_keyframes=64), 8, 8)
        for p, t in zip(positions, times):
            store = kf.add_keyframe(
                store, jnp.asarray(p, jnp.float32),
                jnp.asarray([1.0, 0, 0, 0], jnp.float32), t,
                jnp.zeros((8, 3)), jnp.zeros(8, bool),
                jnp.zeros((8, 3)), jnp.zeros(8, bool))
        return store

    def test_detects_revisit(self):
        # out-and-back: keyframe 0 at origin, return near it much later
        pos = [[0, 0, 0], [10, 0, 0], [20, 0, 0], [10, 5, 0], [1.0, 0.5, 0]]
        times = [0.0, 10.0, 20.0, 30.0, 45.0]
        store = self._store_with_track(pos, times)
        idx, found = detect_loop(store, jnp.int32(4), jnp.float32(45.0), CFG)
        assert bool(found) and int(idx) == 0

    def test_rejects_recent(self):
        pos = [[0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]]
        times = [0.0, 1.0, 2.0]
        store = self._store_with_track(pos, times)
        idx, found = detect_loop(store, jnp.int32(2), jnp.float32(2.0), CFG)
        assert not bool(found)  # all neighbors too recent (<30 s)


class TestSparseCG:
    """Matrix-free block-Jacobi PCG pose-graph solve (pose_graph.optimize_cg)
    vs the dense Cholesky path, and at K=4096 where dense cannot allocate."""

    def test_matches_dense_on_loop_graph(self):
        from lins_tpu.graph.pose_graph import optimize_cg
        gt_pos, gt_quat, init_pos, init_quat, edges, n = make_drifted_circle(
            drift=0.05)
        t_rel, q_rel = relative_pose(
            jnp.asarray(gt_pos[n - 1], jnp.float64),
            jnp.asarray(gt_quat[n - 1], jnp.float64),
            jnp.asarray(gt_pos[0], jnp.float64),
            jnp.asarray(gt_quat[0], jnp.float64))
        edges = add_edge(edges, n - 1, 0, t_rel, q_rel, 1e4, 1e4)
        pos_d, quat_d = optimize(jnp.asarray(init_pos),
                                 jnp.asarray(init_quat),
                                 jnp.int32(n), edges, iters=10)
        pos_s, quat_s = optimize_cg(jnp.asarray(init_pos),
                                    jnp.asarray(init_quat),
                                    jnp.int32(n), edges, iters=10,
                                    cg_iters=128)
        np.testing.assert_allclose(np.asarray(pos_s[:n]),
                                   np.asarray(pos_d[:n]), atol=1e-4)
        c_d = float(graph_cost(pos_d, quat_d, edges))
        c_s = float(graph_cost(pos_s, quat_s, edges))
        assert c_s <= c_d * 1.5 + 1e-9

    def test_k4096_chain_with_loop(self):
        # the dense path would need a (24576)^2 float matrix (~2.4 GB) —
        # the sparse path solves it in O(E)
        from lins_tpu.graph.pose_graph import optimize_cg
        from lins_tpu.graph.pose_graph import EdgeSet
        K = 4096
        n = 4096
        rng = np.random.default_rng(0)
        E = K + 8
        ii = np.zeros(E, np.int32)
        jj = np.zeros(E, np.int32)
        tt = np.zeros((E, 3), np.float32)
        qq = np.zeros((E, 4), np.float32)
        qq[:, 0] = 1.0
        w = np.zeros(E, np.float32)
        vv = np.zeros(E, bool)
        ii[:n - 1] = np.arange(n - 1)
        jj[:n - 1] = np.arange(1, n)
        tt[:n - 1] = [1.0, 0.0, 0.0]
        w[:n - 1] = 1e4
        vv[:n - 1] = True
        edges = EdgeSet(i=jnp.asarray(ii), j=jnp.asarray(jj),
                        t=jnp.asarray(tt), q=jnp.asarray(qq),
                        w_rot=jnp.asarray(w), w_pos=jnp.asarray(w),
                        valid=jnp.asarray(vv), count=jnp.int32(n - 1))
        # ground truth: straight line; drifted init
        init_pos = np.zeros((K, 3), np.float32)
        init_pos[:n, 0] = np.arange(n)
        init_pos[:n, 1] = np.cumsum(rng.normal(scale=0.02, size=n))
        init_quat = np.zeros((K, 4), np.float32)
        init_quat[:, 0] = 1.0
        c0 = float(graph_cost(jnp.asarray(init_pos), jnp.asarray(init_quat),
                              edges))
        pos2, quat2 = optimize_cg(jnp.asarray(init_pos),
                                  jnp.asarray(init_quat), jnp.int32(n),
                                  edges, iters=3, cg_iters=96)
        c1 = float(graph_cost(pos2, quat2, edges))
        assert np.isfinite(c1) and c1 < 0.01 * max(c0, 1.0), (c0, c1)
