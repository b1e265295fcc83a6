"""Pallas fused association kernels vs the XLA reference path (interpret
mode on CPU; compiled on TPU by the bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import VLP16
from lins_tpu.geom import so3
from lins_tpu.odometry import association as assoc
from lins_tpu.odometry.ieskf import _measurement_blocks
from lins_tpu.ops.pallas_assoc import (corner_normal_equations,
                                       surf_normal_equations)

CFG = VLP16


def make_case(seed=0, Q=256, R=1024, offset=(0.1, 0.02, -0.01)):
    rng = np.random.default_rng(seed)
    # reference set: points on two walls + ground (structured planes)
    r_pts = np.zeros((R, 3), np.float32)
    third = R // 3
    a = rng.uniform(-8, 8, (R, 2)).astype(np.float32)
    r_pts[:third, 0] = a[:third, 0]
    r_pts[:third, 1] = 8.0
    r_pts[:third, 2] = a[:third, 1] * 0.2 + 1.0
    r_pts[third:2 * third, 0] = a[third:2 * third, 0]
    r_pts[third:2 * third, 1] = -8.0
    r_pts[third:2 * third, 2] = a[third:2 * third, 1] * 0.2 + 1.0
    r_pts[2 * third:, :2] = a[2 * third:]
    r_pts[2 * third:, 2] = -0.8
    r_ring = rng.integers(0, 16, R).astype(np.int32)
    r_valid = rng.uniform(size=R) > 0.1

    q_idx = rng.integers(0, R, Q)
    q_pts = (r_pts[q_idx] + np.asarray(offset, np.float32)
             + rng.normal(0, 0.02, (Q, 3)).astype(np.float32))
    q_rel = rng.uniform(0, 1, Q).astype(np.float32)
    q_valid = rng.uniform(size=Q) > 0.1
    return (jnp.asarray(q_pts), jnp.asarray(q_rel), jnp.asarray(q_valid),
            jnp.asarray(r_pts), jnp.asarray(r_ring), jnp.asarray(r_valid))


def xla_reference(q_pts, q_rel, q_valid, r_pts, r_ring, r_valid, rn, qbn, it):
    m = assoc.find_surf_matches(q_pts, q_rel, q_valid, r_pts, r_ring,
                                r_valid, rn, qbn, it, CFG)
    JtJ, Jtr, res_norm = _measurement_blocks(m, rn, qbn, CFG, jnp.float32)
    return JtJ, Jtr, res_norm ** 2, jnp.sum(m.valid)


@pytest.mark.parametrize("it", [0, 1])
def test_matches_xla_path(it):
    case = make_case()
    rn = jnp.asarray([0.12, 0.01, -0.02], jnp.float32)
    qbn = so3.exp_axis(jnp.asarray([0.01, -0.02, 0.05], jnp.float32))

    JtJ0, Jtr0, rss0, n0 = xla_reference(*case, rn, qbn, it)
    JtJ1, Jtr1, rss1, n1 = surf_normal_equations(
        *case, rn, qbn, float(it), interpret=True)

    assert int(n1) == int(n0)
    np.testing.assert_allclose(np.asarray(JtJ1), np.asarray(JtJ0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Jtr1), np.asarray(Jtr0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(rss1), float(rss0), rtol=1e-4)


def test_empty_reference():
    case = list(make_case())
    case[5] = jnp.zeros_like(case[5])  # all refs invalid
    rn = jnp.zeros(3, jnp.float32)
    qbn = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    JtJ, Jtr, rss, n = surf_normal_equations(*case, rn, qbn, 0.0,
                                             interpret=True)
    assert int(n) == 0
    np.testing.assert_allclose(np.asarray(JtJ), 0.0, atol=1e-12)


@pytest.mark.parametrize("it", [0, 1])
def test_corner_matches_xla_path(it):
    case = make_case(seed=3)
    rn = jnp.asarray([0.12, 0.01, -0.02], jnp.float32)
    qbn = so3.exp_axis(jnp.asarray([0.01, -0.02, 0.05], jnp.float32))

    m = assoc.find_corner_matches(*case, rn, qbn, it, CFG)
    JtJ0, Jtr0, rn0 = _measurement_blocks(m, rn, qbn, CFG, jnp.float32)
    JtJ1, Jtr1, rss1, n1 = corner_normal_equations(
        *case, rn, qbn, float(it), interpret=True)

    assert int(n1) == int(jnp.sum(m.valid))
    np.testing.assert_allclose(np.asarray(JtJ1), np.asarray(JtJ0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Jtr1), np.asarray(Jtr0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(rss1), float(rn0) ** 2, rtol=1e-4)


def test_production_update_parity():
    """ieskf.update with use_pallas_assoc=True matches the XLA path on a
    real synthetic odometry run (the production route, VERDICT item 5)."""
    from lins_tpu.datasets import synthetic as syn
    from lins_tpu.odometry import LinsOdometry

    cfg0 = VLP16.replace(max_points=4096, num_iter=4, max_sharp=192,
                         max_less_sharp=512, max_flat=256,
                         max_less_flat=1024, max_outlier=256)
    data = syn.generate_sequence(cfg0, n_scans=6, kind="gentle", speed=1.5)

    def run(cfg):
        odo = LinsOdometry(cfg)
        imu_i = 0
        poses = []
        for k in range(6):
            t = data["scan_times"][k] + cfg.scan_period
            while (imu_i < len(data["imu_times"])
                   and data["imu_times"][imu_i] <= t + 1e-9):
                odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i],
                            data["imu_gyr"][imu_i])
                imu_i += 1
            out = odo.add_scan(t, data["scans_xyz"][k], data["scans_n"][k])
            if out is not None:
                poses.append(np.asarray(out[0]))
        return np.stack(poses)

    p_x = run(cfg0)
    p_p = run(cfg0.replace(use_pallas_assoc=True))
    np.testing.assert_allclose(p_p, p_x, atol=2e-3)


class TestPallasSelect:
    """Mosaic partial-selection kernel (ops/pallas_select.py) vs the XLA
    variadic-sort prune in gather_candidates — identical kept sets."""

    def _case(self, seed=0, n_map=20000):
        from lins_tpu.ops.grid_nn import build_grid_voxelized

        rng = np.random.default_rng(seed)
        pts = jnp.asarray(rng.uniform(-20, 20, (n_map, 3)), jnp.float32)
        ok = jnp.asarray(rng.random(n_map) > 0.05)
        grid, _ = build_grid_voxelized(pts, ok, leaf=0.4, m=6, table=4096,
                                       cap=216, nb=8)
        q = jnp.asarray(rng.uniform(-18, 18, (256, 3)), jnp.float32)
        qv = jnp.asarray(rng.random(256) > 0.1)
        return grid, q, qv

    def test_matches_sort_path(self):
        from lins_tpu.ops.grid_nn import gather_candidates

        grid, q, qv = self._case()
        C = 32
        c0, ok0, d2C0, cov0 = gather_candidates(q, qv, grid, C)
        c1, ok1, d2C1, cov1 = gather_candidates(q, qv, grid, C,
                                                use_pallas=True,
                                                interpret=True)
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok0))
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(cov1), np.asarray(cov0))
        # the kernel's d2C is the FIRST-DROPPED distance — a tighter,
        # still-sound prune bound than the sort path's C-th-kept distance
        d2C0, d2C1 = np.asarray(d2C0), np.asarray(d2C1)
        both = np.isfinite(d2C0) & np.isfinite(d2C1)
        assert np.all(d2C1[both] >= d2C0[both] - 1e-6)

    def test_invalid_and_far_rows(self):
        """Invalid queries get no candidates (nn parked on the query); far
        queries may gather hash-colliding far points (same as the XLA sort
        path — the downstream d2<1 acceptance gate rejects them) but both
        paths must agree exactly."""
        from lins_tpu.ops.grid_nn import gather_candidates

        grid, _, _ = self._case()
        q = jnp.asarray([[500.0, 500.0, 500.0], [0.0, 0.0, 0.0]],
                        jnp.float32)
        qv = jnp.asarray([True, False])
        c0, ok0, _, _ = gather_candidates(q, qv, grid, 16)
        c1, ok1, _, _ = gather_candidates(q, qv, grid, 16,
                                          use_pallas=True,
                                          interpret=True)
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok0))
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   atol=1e-6)
        # the qv=False row has no candidates and parks on the query
        assert not bool(np.asarray(ok1)[1].any())
        np.testing.assert_allclose(np.asarray(c1)[1],
                                   np.broadcast_to(np.zeros(3), (16, 3)))
