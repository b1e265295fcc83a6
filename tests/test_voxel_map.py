"""Incremental voxel-map (ops/voxel_map.py) vs full-rebuild oracles.

The invariant under test: a VoxelMap maintained by per-keyframe
apply_delta(+1)/apply_delta(-1) holds exactly the voxel-centroid set of a
from-scratch build over the union of the surviving keyframes' points (the
reference's per-step re-filter, lidar_mapping_node.cpp:1285-1313), up to
f32 summation order.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import VLP16
from lins_tpu.ops.voxel_map import (SENTINEL, apply_delta, build_voxel_map,
                                    empty_voxel_map, scan_delta)

LEAF, M, TABLE, CAP = 0.4, 6, 1024, 224


def live_centroids(vm):
    """(n, 3) live voxel centroids, sorted by exact voxel IDENTITY so two
    maps of the same voxel set align row-for-row (sorting by float
    coordinates pairs near-equal rows nondeterministically)."""
    cells = np.asarray(vm.cells)            # (table, 3, cap)
    cnt = np.asarray(vm.vcnt)
    hwm = np.asarray(vm.hwm)
    slot = np.arange(vm.cap)[None, :]
    live = (slot < hwm[:, None]) & (cnt > 0)
    pts = cells.transpose(0, 2, 1)[live]    # (n, 3)
    vc = np.asarray(vm.vcoord).transpose(0, 2, 1)[live]   # (n, 3) int
    order = np.lexsort((vc[:, 2], vc[:, 1], vc[:, 0]))
    return pts[order]


def clouds(rng, n_kf, n_pts, lo=-8, hi=8):
    return [rng.uniform(lo, hi, (n_pts, 3)).astype(np.float32)
            for _ in range(n_kf)]


def build_union(kfs):
    pts = jnp.asarray(np.concatenate(kfs))
    return build_voxel_map(pts, jnp.ones(pts.shape[0], bool), LEAF, M,
                           TABLE, CAP)


def insert(vm, pts):
    d = scan_delta(jnp.asarray(pts), jnp.ones(len(pts), bool), LEAF, M,
                   TABLE)
    return apply_delta(vm, d, +1), d


class TestBuildParity:
    def test_matches_grid_voxelized_centroids(self):
        from lins_tpu.ops.grid_nn import build_grid_voxelized
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(-10, 10, (4000, 3)), jnp.float32)
        ok = jnp.asarray(rng.random(4000) > 0.1)
        vm = build_voxel_map(pts, ok, LEAF, M, TABLE, CAP)
        grid, nv = build_grid_voxelized(pts, ok, LEAF, M, TABLE, CAP)
        assert int(vm.n_live) == int(nv)
        # both builders sort identically, so (bucket, slot) layouts coincide
        np.testing.assert_array_equal(np.asarray(vm.hwm),
                                      np.asarray(grid.cnt))
        mask = np.arange(CAP)[None, None, :] < np.asarray(grid.cnt)[:, None,
                                                                    None]
        got = np.asarray(vm.cells)
        exp = np.asarray(grid.cells)
        np.testing.assert_allclose(np.where(mask, got, 0.0),
                                   np.where(mask, exp, 0.0), atol=1e-5)

    def test_counts_are_run_sizes(self):
        pts = jnp.asarray([[0.1, 0.1, 0.1], [0.15, 0.12, 0.11],
                           [5.0, 5.0, 5.0]], jnp.float32)
        vm = build_voxel_map(pts, jnp.ones(3, bool), LEAF, M, TABLE, CAP)
        assert int(vm.n_live) == 2
        assert sorted(np.asarray(vm.vcnt)[np.asarray(vm.vcnt) > 0]
                      .tolist()) == [1, 2]


class TestIncremental:
    def test_inserts_match_full_build(self):
        rng = np.random.default_rng(1)
        kfs = clouds(rng, 5, 900)
        vm = empty_voxel_map(LEAF, M, TABLE, CAP)
        for c in kfs:
            vm, _ = insert(vm, c)
        ref = build_union(kfs)
        assert int(vm.n_live) == int(ref.n_live)
        np.testing.assert_allclose(live_centroids(vm), live_centroids(ref),
                                   atol=2e-4)

    def test_evict_matches_rebuild_of_survivors(self):
        rng = np.random.default_rng(2)
        kfs = clouds(rng, 6, 700)
        vm = empty_voxel_map(LEAF, M, TABLE, CAP)
        deltas = []
        for c in kfs:
            vm, d = insert(vm, c)
            deltas.append(d)
        for i in (0, 3):
            vm = apply_delta(vm, deltas[i], -1)
        ref = build_union([kfs[i] for i in (1, 2, 4, 5)])
        assert int(vm.n_live) == int(ref.n_live)
        np.testing.assert_allclose(live_centroids(vm), live_centroids(ref),
                                   atol=2e-4)

    def test_enable_false_is_identity(self):
        rng = np.random.default_rng(3)
        vm, d = insert(empty_voxel_map(LEAF, M, TABLE, CAP),
                       rng.uniform(-5, 5, (300, 3)).astype(np.float32))
        vm2 = apply_delta(vm, d, -1, enable=jnp.bool_(False))
        for a, b in zip([vm.cells, vm.vcnt, vm.hwm, vm.n_live],
                        [vm2.cells, vm2.vcnt, vm2.hwm, vm2.n_live]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tombstone_revive_in_place(self):
        pts = np.asarray([[0.2, 0.2, 0.2]], np.float32)
        vm, d = insert(empty_voxel_map(LEAF, M, TABLE, CAP), pts)
        hwm0 = np.asarray(vm.hwm).copy()
        vm = apply_delta(vm, d, -1)               # dies -> tombstone
        assert int(vm.n_live) == 0
        assert np.array_equal(np.asarray(vm.hwm), hwm0)  # slot retained
        cells = np.asarray(vm.cells)
        assert np.all(cells[np.asarray(vm.hwm) > 0][:, :, 0] == SENTINEL)
        vm, _ = insert(vm, pts + 0.05)            # same voxel revives
        assert int(vm.n_live) == 1
        assert np.array_equal(np.asarray(vm.hwm), hwm0)  # no new slot
        got = live_centroids(vm)
        np.testing.assert_allclose(got[0], pts[0] + 0.05, atol=1e-5)

    def test_evict_of_never_inserted_is_noop(self):
        rng = np.random.default_rng(4)
        vm, _ = insert(empty_voxel_map(LEAF, M, TABLE, CAP),
                       rng.uniform(-5, 5, (200, 3)).astype(np.float32))
        d_alien = scan_delta(
            jnp.asarray(rng.uniform(50, 60, (100, 3)), jnp.float32),
            jnp.ones(100, bool), LEAF, M, TABLE)
        n0 = int(vm.n_live)
        vm2 = apply_delta(vm, d_alien, -1)
        assert int(vm2.n_live) == n0
        np.testing.assert_allclose(live_centroids(vm2), live_centroids(vm))

    def test_overflow_flag(self):
        # tiny cap: a dense cell must overflow and set the rebuild flag
        g = (np.arange(6) + 0.5) * LEAF
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        pts = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
        vm, _ = insert(empty_voxel_map(LEAF, M, TABLE, cap=8), pts)
        assert bool(vm.overflow)

    def test_nn_gather_parity_after_churn(self):
        """The gather/knn path over a churned incremental map equals the
        same path over a fresh build (the production consumer contract)."""
        from lins_tpu.ops.grid_nn import gather_candidates, \
            knn_from_candidates
        rng = np.random.default_rng(5)
        kfs = clouds(rng, 8, 800)
        vm = empty_voxel_map(LEAF, M, TABLE, CAP, nb=8)
        deltas = []
        for c in kfs:
            vm, d = insert(vm, c)
            deltas.append(d)
        for i in (0, 1, 5):
            vm = apply_delta(vm, deltas[i], -1)
        union = np.concatenate([kfs[i] for i in (2, 3, 4, 6, 7)])
        ref = build_voxel_map(jnp.asarray(union),
                              jnp.ones(len(union), bool), LEAF, M, TABLE,
                              CAP, nb=8)
        q = jnp.asarray(rng.uniform(-7, 7, (64, 3)), jnp.float32)
        qv = jnp.ones(64, bool)
        out = []
        for m in (vm, ref):
            cand, ok, _, _ = gather_candidates(q, qv, m.as_grid(), 64)
            nn, d2 = knn_from_candidates(q, qv, cand, ok)
            out.append((np.asarray(nn), np.asarray(d2)))
        gate = out[1][1][:, 4] < 1.0
        assert gate.sum() > 10
        np.testing.assert_allclose(out[0][1][gate], out[1][1][gate],
                                   atol=1e-3)


class TestMapperParity:
    @pytest.mark.parametrize("interval", [1, 3])
    def test_rebuild_interval_invariance(self, interval):
        """Full mapper: compaction every insert vs every-64 must agree —
        the incremental path and the fused rebuild are interchangeable."""
        from lins_tpu.mapping.mapper import LinsMapper
        rng = np.random.default_rng(6)
        corner = jnp.asarray(rng.normal(scale=5.0, size=(128, 3)),
                             jnp.float32)
        surf = jnp.asarray(rng.normal(scale=5.0, size=(256, 3)), jnp.float32)
        outl = jnp.zeros((VLP16.max_outlier, 3), jnp.float32)
        ov = jnp.zeros(VLP16.max_outlier, bool)

        def run(itv):
            cfg = VLP16.replace(max_keyframes=32, keyframe_gate_meters=0.05,
                                loop_closure_enabled=True,
                                map_rebuild_interval=itv)
            m = LinsMapper(cfg, corner_cap=128, surf_cap=256, outlier_cap=8,
                           n_window=4, map_corner_cap=4096,
                           map_surf_cap=4096)
            poses = []
            for i in range(10):
                t = jnp.asarray([0.4 * i, 0.1 * i, 0.0], jnp.float32)
                out = m.process(0.4 * i, t, jnp.asarray([1.0, 0, 0, 0]),
                                corner, jnp.ones(128, bool),
                                surf, jnp.ones(256, bool), outl, ov)
                poses.append(np.asarray(out[0]))
            return np.stack(poses)

        np.testing.assert_allclose(run(interval), run(64), atol=1e-4)


class TestExactIdentityAtScale:
    def test_no_hash_collision_corruption(self):
        """Round-3 regression: with hash-based voxel identity, same-key
        pairs (two cells sharing a bucket with matching in-cell ids) plus a
        single 32-bit secondary-hash collision merged two far-apart voxels
        into one corrupt centroid (~1 per 6e4-point build), silently
        poisoning the surrounding 5-NN fits.  With exact-coordinate
        identity the gathered 5-NN must match a from-scratch numpy brute
        force EXACTLY on every gated query at map scale."""
        from lins_tpu.ops.grid_nn import (build_grid_voxelized,
                                          gather_candidates,
                                          knn_from_candidates)
        rng = np.random.default_rng(0)
        r = jnp.asarray(rng.uniform(-20, 20, (60000, 3)), jnp.float32)
        grid, nv = build_grid_voxelized(r, jnp.ones(60000, bool), 0.4, 6,
                                        16384, 216, nb=8)
        q = jnp.asarray(rng.uniform(-18, 18, (2048, 3)), jnp.float32)
        qv = jnp.ones(2048, bool)
        cand, ok, d2C, cov = gather_candidates(q, qv, grid, 64)
        nn, d2 = knn_from_candidates(q, qv, cand, ok)

        cells = np.asarray(grid.cells).transpose(0, 2, 1)
        valid = (np.arange(grid.cap)[None, :]
                 < np.asarray(grid.cnt)[:, None])
        pts = cells[valid]
        qn = np.asarray(q)
        d2n = np.asarray(d2)
        bad = 0
        for i in range(2048):
            dd = np.sum((pts - qn[i]) ** 2, axis=1)
            b5 = np.partition(dd, 4)[4]        # true 5th-NN distance^2
            if b5 < 1.0 and abs(b5 - d2n[i, 4]) > 1e-3:
                bad += 1
        assert bad == 0, f"{bad} gated queries disagree with brute force"
