"""Mapping backend tests: voxel ops, 5-NN, residuals, scan-to-map GN,
keyframe store, full-pipeline drift reduction (SURVEY.md §4.2-4.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.geom import so3
from lins_tpu.mapping import keyframes as kf
from lins_tpu.mapping.scan2map import (
    corner_residuals, scan_to_map, surf_residuals)
from lins_tpu.ops.grid_nn import (build_grid, build_grid_voxelized,
                                  gather_candidates, grid_knn,
                                  knn_from_candidates)
from lins_tpu.ops.voxel import top_k_nn, voxel_downsample


def _world_knn(q_pts, q_valid, t, q, grid, k=5):
    p_w = so3.quat_rotate(q[None, :], q_pts.astype(jnp.float32)) + t[None, :]
    nn, d2 = grid_knn(p_w.astype(jnp.float32), q_valid, grid, k)
    return p_w, nn, d2

CFG = VLP16.replace(max_points=28800)


class TestVoxelOps:
    def test_downsample_centroids(self):
        # two clusters of 3 points each in separate voxels
        xyz = jnp.asarray([
            [0.01, 0.01, 0.01], [0.05, 0.02, 0.03], [0.03, 0.06, 0.02],
            [5.01, 5.01, 5.01], [5.03, 5.05, 5.02], [5.02, 5.03, 5.06],
            [0.0, 0.0, 0.0],  # masked out
        ])
        mask = jnp.asarray([True] * 6 + [False])
        out, ok = voxel_downsample(xyz, mask, leaf=0.5, cap=4)
        got = np.sort(np.asarray(out)[np.asarray(ok)], axis=0)
        exp = np.sort(np.stack([
            np.mean(np.asarray(xyz[:3]), axis=0),
            np.mean(np.asarray(xyz[3:6]), axis=0)]), axis=0)
        assert int(ok.sum()) == 2
        np.testing.assert_allclose(got, exp, atol=1e-6)

    def test_topk_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(37, 3)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(211, 3)), jnp.float32)
        rv = jnp.asarray(rng.uniform(size=211) > 0.2)
        idx, d2 = top_k_nn(q, jnp.ones(37, bool), r, rv, k=5, chunk=64)
        # brute force
        D = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(r)[None], axis=-1) ** 2
        D[:, ~np.asarray(rv)] = np.inf
        exp = np.sort(D, axis=1)[:, :5]
        np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), exp,
                                   rtol=1e-4, atol=1e-4)


class TestGridNN:
    """grid_knn vs the exact brute-force oracle under the 1 m acceptance
    gate (everything scan_to_map consumes is gated on d2[:, 4] < 1.0, so
    the two must agree wherever that gate passes)."""

    def test_matches_bruteforce_within_gate(self):
        rng = np.random.default_rng(7)
        # clustered map points (realistic voxel-filtered density)
        centers = rng.uniform(-20, 20, size=(60, 3))
        r = np.concatenate([c + rng.normal(scale=0.6, size=(40, 3))
                            for c in centers]).astype(np.float32)
        rv = jnp.asarray(rng.uniform(size=len(r)) > 0.1)
        q = jnp.asarray(r[rng.integers(0, len(r), 300)]
                        + rng.normal(scale=0.3, size=(300, 3)).astype(
                            np.float32))
        qv = jnp.ones(300, bool)

        grid = build_grid(jnp.asarray(r), rv, cell=1.0, table=4096, cap=64)
        nn_g, d2_g = grid_knn(q, qv, grid, k=5)
        _, d2_b = top_k_nn(q, qv, jnp.asarray(r), rv, k=5, chunk=512)

        gate = np.asarray(d2_b[:, 4]) < 1.0
        assert gate.sum() > 50   # the fixture must exercise the gate
        # brute force computes d2 as |q|^2+|r|^2-2qr (catastrophic
        # cancellation at |x|~20 in f32), grid as |q-r|^2 — hence atol
        np.testing.assert_allclose(np.asarray(d2_g)[gate],
                                   np.asarray(d2_b)[gate], rtol=1e-3,
                                   atol=2e-3)
        # grid never reports a closer neighbor than the exact search
        assert np.all(np.asarray(d2_g) >= np.asarray(d2_b) - 2e-3)

    def test_invalid_and_empty(self):
        r = jnp.asarray(np.zeros((16, 3), np.float32))
        grid = build_grid(r, jnp.zeros(16, bool), cell=1.0, table=64)
        q = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        nn, d2 = grid_knn(q, jnp.ones(1, bool), grid, k=5)
        assert bool(jnp.all(jnp.isinf(d2)))
        assert bool(jnp.all(jnp.isfinite(nn)))   # parked on the query

    def test_invalid_query_masked(self):
        r = jnp.asarray(np.random.default_rng(0).normal(
            size=(64, 3)).astype(np.float32))
        grid = build_grid(r, jnp.ones(64, bool), cell=1.0, table=256)
        q = r[:3]
        nn, d2 = grid_knn(q, jnp.asarray([True, False, True]), grid, k=3)
        assert bool(jnp.all(jnp.isinf(d2[1])))
        assert float(d2[0, 0]) < 1e-9   # the point itself


class TestResiduals:
    def test_corner_line(self):
        # map: points along a line; query 0.3 off the line
        t_line = np.linspace(-0.5, 0.5, 8)
        map_pts = jnp.asarray(np.stack([t_line, np.zeros(8), np.zeros(8)], 1),
                              jnp.float32)
        q_pts = jnp.asarray([[0.0, 0.3, 0.0]], jnp.float32)
        p_w, nn, d2 = _world_knn(
            q_pts, jnp.ones(1, bool), jnp.zeros(3, jnp.float32),
            jnp.asarray([1.0, 0, 0, 0], jnp.float32),
            build_grid(map_pts, jnp.ones(8, bool), cell=1.0, table=64))
        coeff, res, ok = corner_residuals(p_w, nn, d2, jnp.ones(1, bool))
        assert bool(ok[0])
        # s = 1 - 0.9*0.3 = 0.73 ; res = s * 0.3
        np.testing.assert_allclose(float(res[0]), 0.73 * 0.3, atol=1e-5)

    def test_surf_plane(self):
        # note: the reference's plane model n·x + 1 = 0 (A x = -1,
        # lidar_mapping_node.cpp:1477) cannot represent planes through the
        # origin, so the fixture plane sits at z = 1
        rng = np.random.default_rng(1)
        pts = np.ones((12, 3), np.float32)
        pts[:, 0] = rng.uniform(-1, 1, 12)
        pts[:, 1] = rng.uniform(-1, 1, 12)
        map_pts = jnp.asarray(pts)
        q_pts = jnp.asarray([[0.1, 0.1, 1.2]], jnp.float32)
        p_w, nn, d2 = _world_knn(
            q_pts, jnp.ones(1, bool), jnp.zeros(3, jnp.float32),
            jnp.asarray([1.0, 0, 0, 0], jnp.float32),
            build_grid(map_pts, jnp.ones(12, bool), cell=1.0, table=64))
        coeff, res, ok = surf_residuals(p_w, nn, d2, jnp.ones(1, bool))
        assert bool(ok[0])
        s = 1 - 0.9 * 0.2 / np.sqrt(np.sqrt(np.linalg.norm([0.1, 0.1, 1.2])))
        np.testing.assert_allclose(abs(float(res[0])), s * 0.2, atol=1e-4)

    def test_nonlinear_cluster_rejected(self):
        # perfectly isotropic cluster (octahedron) — eigenvalues equal
        map_pts = jnp.asarray([
            [0.3, 0, 0], [-0.3, 0, 0], [0, 0.3, 0], [0, -0.3, 0],
            [0, 0, 0.3], [0, 0, -0.3]], jnp.float32)
        map_pts = jnp.concatenate([map_pts, 100.0 + map_pts])  # pad far away
        q_pts = jnp.asarray([[0.0, 0.05, 0.0]], jnp.float32)
        p_w, nn, d2 = _world_knn(
            q_pts, jnp.ones(1, bool), jnp.zeros(3, jnp.float32),
            jnp.asarray([1.0, 0, 0, 0], jnp.float32),
            build_grid(map_pts, jnp.ones(12, bool), cell=1.0, table=64))
        _, _, ok = corner_residuals(p_w, nn, d2, jnp.ones(1, bool))
        assert not bool(ok[0])


class TestScanToMap:
    @pytest.fixture(scope="class")
    def scene(self):
        fe_cfg = CFG
        from lins_tpu.frontend import make_frontend
        data = syn.generate_sequence(fe_cfg, n_scans=2, kind="static",
                                     speed=0.0)
        fe = make_frontend(fe_cfg)
        feats = fe(jnp.asarray(data["scans_xyz"][0]),
                   jnp.asarray(data["scans_n"][0]))[2]
        corner = feats.less_sharp
        surf = feats.less_flat
        return corner, surf

    def test_recovers_perturbation(self, scene):
        corner, surf = scene
        # map = the same clouds at identity (world = body)
        cm, cmv = corner.xyz.astype(jnp.float32), corner.valid
        sm, smv = surf.xyz.astype(jnp.float32), surf.valid
        # start from a perturbed pose; truth is identity
        t0 = jnp.asarray([0.2, -0.15, 0.1], jnp.float32)
        q0 = so3.exp_axis(jnp.asarray([0.02, -0.02, 0.05], jnp.float32))
        t, q, iters, n_sel, _ = scan_to_map(
            t0, q0, corner.xyz.astype(jnp.float32), corner.valid,
            surf.xyz.astype(jnp.float32), surf.valid, cm, cmv, sm, smv, CFG)
        assert int(n_sel) > 100
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=0.01)
        ang = np.linalg.norm(np.asarray(so3.log_quat(q)))
        assert ang < 0.01

    def test_empty_map_noop(self, scene):
        corner, surf = scene
        empty = jnp.zeros((64, 3), jnp.float32)
        ev = jnp.zeros(64, bool)
        t0 = jnp.asarray([0.1, 0.0, 0.0], jnp.float32)
        q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        t, q, iters, n_sel, _ = scan_to_map(
            t0, q0, corner.xyz.astype(jnp.float32), corner.valid,
            surf.xyz.astype(jnp.float32), surf.valid, empty, ev, empty, ev,
            CFG)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t0), atol=1e-7)


class TestKeyframeStore:
    def test_add_and_window(self):
        store = kf.empty_store(CFG.replace(max_keyframes=8), 16, 32)
        for i in range(3):
            store = kf.add_keyframe(
                store, jnp.asarray([float(i), 0, 0]),
                jnp.asarray([1.0, 0, 0, 0]), float(i),
                jnp.ones((16, 3)), jnp.ones(16, bool),
                jnp.ones((32, 3)), jnp.ones(32, bool))
        assert int(store.count) == 3
        slots, ok, ids = kf.gather_window(store, jnp.int32(2), 5)
        assert int(ok.sum()) == 3

    def test_local_map_transforms(self):
        store = kf.empty_store(CFG.replace(max_keyframes=4), 4, 4)
        cloud = jnp.asarray([[1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0],
                             [4.0, 0, 0]], jnp.float32)
        store = kf.add_keyframe(
            store, jnp.asarray([0.0, 10.0, 0.0]), jnp.asarray([1.0, 0, 0, 0]),
            0.0, cloud, jnp.ones(4, bool), cloud, jnp.ones(4, bool))
        cm, cmv, sm, smv = kf.assemble_local_map(
            store, jnp.int32(0), 2, 16, 16, 0.2, 0.2)
        pts = np.asarray(cm)[np.asarray(cmv)]
        assert np.all(np.abs(pts[:, 1] - 10.0) < 0.2)


class TestFullSlam:
    def test_mapping_reduces_drift(self):
        from lins_tpu.slam import LinsSlam, ate_rmse, run_sequence
        n = 10
        data = syn.generate_sequence(CFG, n_scans=n, kind="straight",
                                     speed=1.5)
        R0 = np.asarray(so3.quat_to_mat(jnp.asarray(data["gt_quat"][0],
                                                    jnp.float64)))
        p0 = data["gt_pos"][0]

        def run(mapping):
            slam = LinsSlam(CFG, enable_mapping=mapping,
                            map_corner_cap=8192, map_surf_cap=16384)
            run_sequence(slam, data)
            ts, ps, qs = slam.trajectory_arrays()
            return ate_rmse(ps, data["gt_pos"][1:1 + len(ps)], (R0, p0))

        ate_odo = run(False)
        ate_map = run(True)
        assert ate_map < ate_odo * 0.7, (ate_odo, ate_map)
        assert ate_map < 0.03


class TestCandidateCache:
    """gather_candidates + knn_from_candidates (the production scan-to-map
    NN path: one gather, per-iteration re-ranking) vs exact brute force."""

    def _brute(self, q, r, k=5):
        D = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(r)[None],
                           axis=-1) ** 2
        return np.sort(D, axis=1)[:, :k]

    def test_supercell_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        centers = rng.uniform(-20, 20, size=(40, 3))
        r = np.concatenate([c + rng.normal(scale=0.5, size=(30, 3))
                            for c in centers]).astype(np.float32)
        # voxelize at 0.4 into a supercell grid (cell 2.0, nb=8)
        grid, nv = build_grid_voxelized(jnp.asarray(r),
                                        jnp.ones(len(r), bool), 0.4, 5,
                                        table=4096, cap=128, nb=8)
        # oracle reference = the voxel centroids themselves
        cent, cent_ok = voxel_downsample(jnp.asarray(r),
                                         jnp.ones(len(r), bool), 0.4,
                                         len(r))
        cent_np = np.asarray(cent)[np.asarray(cent_ok)]
        q = jnp.asarray(cent_np[rng.integers(0, len(cent_np), 200)]
                        + rng.normal(scale=0.3, size=(200, 3)).astype(
                            np.float32))
        qv = jnp.ones(200, bool)
        cand, ok, d2C, cover = gather_candidates(q, qv, grid, 64)
        assert float(jnp.min(jnp.where(qv, cover, jnp.inf))) >= 1.0
        nn, d2 = knn_from_candidates(q, qv, cand, ok)
        exp = self._brute(q, cent_np)
        gate = exp[:, 4] < 1.0
        assert gate.sum() > 30
        np.testing.assert_allclose(np.asarray(d2)[gate], exp[gate],
                                   rtol=1e-3, atol=2e-3)

    def test_rerank_after_motion_within_slack(self):
        # gather at pose A, re-rank at pose B (moved < coverage slack):
        # results must equal a fresh exact search at pose B
        rng = np.random.default_rng(4)
        r = rng.uniform(-5, 5, size=(4000, 3)).astype(np.float32)
        grid = build_grid(jnp.asarray(r), jnp.ones(4000, bool), cell=1.2,
                          table=2048, cap=224)
        q0 = jnp.asarray(rng.uniform(-4, 4, size=(50, 3)), jnp.float32)
        qv = jnp.ones(50, bool)
        cand, ok, d2C, cover = gather_candidates(q0, qv, grid, 64)
        dq = jnp.asarray(rng.normal(scale=0.05, size=(50, 3)), jnp.float32)
        q1 = q0 + dq
        # motion stays inside both re-gather bounds for every query
        bound = jnp.minimum(cover - 1.0, jnp.sqrt(d2C) - 1.0)
        assert bool(jnp.all(jnp.linalg.norm(dq, axis=1) <= bound))
        nn, d2 = knn_from_candidates(q1, qv, cand, ok)
        exp = self._brute(q1, r)
        gate = exp[:, 4] < 1.0
        assert gate.sum() > 10
        np.testing.assert_allclose(np.asarray(d2)[gate], exp[gate],
                                   rtol=1e-4, atol=1e-5)

    def test_dense_corner_cap_exact(self):
        # ADVERSARIAL density: every 0.2 m voxel of one 1.2 m cell occupied
        # (216 centroids — silently truncated by the round-1 cap=32 grid).
        g = (np.arange(6) + 0.5) * 0.2
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        r = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
        assert len(r) == 216
        grid, nv = build_grid_voxelized(jnp.asarray(r),
                                        jnp.ones(216, bool), 0.2, 6,
                                        table=512, cap=224, nb=27)
        assert int(nv) == 216
        q = jnp.asarray([[0.61, 0.59, 0.6]], jnp.float32)
        cand, ok, d2C, cover = gather_candidates(q, jnp.ones(1, bool),
                                                 grid, 64)
        nn, d2 = knn_from_candidates(q, jnp.ones(1, bool), cand, ok)
        exp = self._brute(q, r)
        np.testing.assert_allclose(np.asarray(d2)[0], exp[0], rtol=1e-5,
                                   atol=1e-6)


class TestKeyframeRing:
    """Ring-eviction semantics past max_keyframes (round-1 VERDICT fix #2:
    previously silent corruption)."""

    def _add(self, store, i):
        return kf.add_keyframe(
            store, jnp.asarray([float(i), 0, 0]),
            jnp.asarray([1.0, 0, 0, 0]), float(i),
            jnp.full((4, 3), float(i)), jnp.ones(4, bool),
            jnp.full((8, 3), float(i)), jnp.ones(8, bool))

    def test_eviction_and_ids(self):
        store = kf.empty_store(CFG.replace(max_keyframes=4), 4, 8, 8)
        for i in range(7):
            store = self._add(store, i)
        assert int(store.count) == 7
        # live ids are 3..6, slot = id % 4
        assert sorted(np.asarray(store.kf_id).tolist()) == [3, 4, 5, 6]
        assert bool(jnp.all(kf.live_mask(store)))
        for kid in range(3, 7):
            slot = kid % 4
            assert int(store.kf_id[slot]) == kid
            assert float(store.pos[slot, 0]) == float(kid)
            assert float(store.surf[slot, 0, 0]) == float(kid)

    def test_window_skips_evicted(self):
        store = kf.empty_store(CFG.replace(max_keyframes=4), 4, 8, 8)
        for i in range(6):
            store = self._add(store, i)
        # window of 5 ending at id 5: ids 1..5, but 0..1 evicted -> 2..5 ok
        slots, ok, ids = kf.gather_window(store, store.count - 1, 5)
        kept = np.asarray(ids)[np.asarray(ok)]
        assert kept.tolist() == [2, 3, 4, 5]
        got = np.asarray(store.pos[slots, 0])[np.asarray(ok)]
        np.testing.assert_allclose(got, [2.0, 3.0, 4.0, 5.0])

    def test_live_view_retires_evicted_edges(self):
        from lins_tpu.graph import pose_graph as pg
        edges = pg.empty_edges(8)
        t = jnp.zeros(3)
        q = jnp.asarray([1.0, 0, 0, 0])
        for i in range(5):
            edges = pg.add_edge(edges, i, i + 1, t, q, 1.0, 1.0)
        ev = pg.live_view(edges, jnp.int32(6), 4)
        # live ids 2..5 -> edges (2,3),(3,4),(4,5) survive
        v = np.asarray(ev.valid)
        assert v.sum() == 3
        assert np.all(np.asarray(ev.i) == np.asarray(edges.i) % 4)

    def test_overflow_slam_consistent(self):
        """Full mapper driven past keyframe capacity: poses keep matching a
        large-capacity run (window + PGO see only live keyframes)."""
        from lins_tpu.mapping.mapper import LinsMapper
        cfg_small = CFG.replace(max_keyframes=6, keyframe_gate_meters=0.05,
                                loop_closure_enabled=False)
        cfg_big = cfg_small.replace(max_keyframes=64)
        rng = np.random.default_rng(0)
        corner = jnp.asarray(rng.normal(scale=5.0, size=(128, 3)),
                             jnp.float32)
        surf = jnp.asarray(rng.normal(scale=5.0, size=(256, 3)), jnp.float32)
        cv = jnp.ones(128, bool)
        sv = jnp.ones(256, bool)
        outl = jnp.zeros((CFG.max_outlier, 3), jnp.float32)
        ov = jnp.zeros(CFG.max_outlier, bool)

        def run(cfg):
            m = LinsMapper(cfg, corner_cap=128, surf_cap=256, outlier_cap=8,
                           n_window=4, map_corner_cap=4096,
                           map_surf_cap=4096)
            poses = []
            for i in range(12):
                t = jnp.asarray([0.4 * i, 0.0, 0.0], jnp.float32)
                out = m.process(0.4 * i, t, jnp.asarray([1.0, 0, 0, 0]),
                                corner, cv, surf, sv, outl, ov)
                poses.append(np.asarray(out[0]))
            return np.stack(poses)

        p_small = run(cfg_small)
        p_big = run(cfg_big)
        # with n_window=4 < capacity=6, both runs use identical local maps
        np.testing.assert_allclose(p_small, p_big, atol=1e-5)


class TestRadiusMode:
    def test_select_radius(self):
        from lins_tpu.mapping import local_map as lmn
        store = kf.empty_store(CFG.replace(max_keyframes=16), 4, 8, 8)
        for i in range(8):
            x = 0.0 if i < 4 else 100.0   # two clusters
            store = kf.add_keyframe(
                store, jnp.asarray([x + i * 0.1, 0, 0]),
                jnp.asarray([1.0, 0, 0, 0]), float(i),
                jnp.zeros((4, 3)), jnp.ones(4, bool),
                jnp.zeros((8, 3)), jnp.ones(8, bool))
        ids, ok = lmn.select_radius(store, jnp.asarray([0.0, 0.0, 0.0]),
                                    50.0, 6)
        kept = sorted(np.asarray(ids)[np.asarray(ok)].tolist())
        assert kept == [0, 1, 2, 3]

    def test_revisit_matches_old_map(self):
        """Radius mode (loop closure off): after returning near the start,
        the local map must contain the ORIGINAL keyframes — the round-1
        recent-window fallback would only see the last few (VERDICT fix #3).
        """
        from lins_tpu.mapping import local_map as lmn
        from lins_tpu.mapping.mapper import LinsMapper
        cfg = CFG.replace(max_keyframes=64, loop_closure_enabled=False,
                          keyframe_gate_meters=0.05,
                          surrounding_keyframe_search_radius=10.0)
        rng = np.random.default_rng(1)
        corner = jnp.asarray(rng.normal(scale=3.0, size=(64, 3)), jnp.float32)
        surf = jnp.asarray(rng.normal(scale=3.0, size=(128, 3)), jnp.float32)
        outl = jnp.zeros((CFG.max_outlier, 3), jnp.float32)
        ov = jnp.zeros(CFG.max_outlier, bool)
        m = LinsMapper(cfg, corner_cap=64, surf_cap=128, outlier_cap=8,
                       n_window=8, map_corner_cap=4096, map_surf_cap=4096)
        # out 0 -> 40 m and back
        xs = list(np.arange(0, 40, 2.0)) + list(np.arange(40, -2, -2.0))
        for i, x in enumerate(xs):
            m.process(float(i), jnp.asarray([x, 0, 0], jnp.float32),
                      jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                      corner, jnp.ones(64, bool), surf, jnp.ones(128, bool),
                      outl, ov)
        sel = np.asarray(m.state.lmap.sel)
        sel = sorted(sel[sel >= 0].tolist())
        # window must include keyframes from the FIRST pass near x=0
        first_pass_near_origin = set(range(0, 5))
        assert first_pass_near_origin & set(sel), sel
