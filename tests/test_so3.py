"""Unit tests for the SO(3)/quaternion layer vs closed forms (SURVEY.md §4.1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.geom import so3


def rng(seed=0):
    return np.random.default_rng(seed)


def random_quats(n, seed=0):
    q = rng(seed).normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


class TestQuatAlgebra:
    def test_mul_identity(self):
        q = random_quats(16)
        e = so3.quat_identity(q.dtype, (16,))
        np.testing.assert_allclose(so3.quat_mul(q, e), q, atol=1e-12)
        np.testing.assert_allclose(so3.quat_mul(e, q), q, atol=1e-12)

    def test_mul_inverse(self):
        q = random_quats(16, 1)
        prod = so3.quat_mul(q, so3.quat_inv(q))
        e = so3.quat_identity(q.dtype, (16,))
        np.testing.assert_allclose(prod, e, atol=1e-12)

    def test_rotate_matches_matrix(self):
        q = random_quats(32, 2)
        v = jnp.asarray(rng(3).normal(size=(32, 3)))
        R = so3.quat_to_mat(q)
        np.testing.assert_allclose(
            so3.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-12)

    def test_mat_quat_roundtrip(self):
        q = random_quats(64, 4)
        q2 = so3.mat_to_quat(so3.quat_to_mat(q))
        # sign ambiguity: compare rotations
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-9)

    def test_rotate_composition(self):
        qa, qb = random_quats(8, 5), random_quats(8, 6)
        v = jnp.asarray(rng(7).normal(size=(8, 3)))
        lhs = so3.quat_rotate(so3.quat_mul(qa, qb), v)
        rhs = so3.quat_rotate(qa, so3.quat_rotate(qb, v))
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)


class TestExpLog:
    def test_roundtrip(self):
        v = jnp.asarray(rng(8).normal(size=(32, 3)) * 0.5)
        np.testing.assert_allclose(so3.log_quat(so3.exp_axis(v)), v, atol=1e-10)

    def test_small_angle(self):
        v = jnp.asarray([[1e-13, 0, 0]])
        q = so3.exp_axis(v)
        np.testing.assert_allclose(q, [[1.0, 0, 0, 0]], atol=1e-12)
        np.testing.assert_allclose(so3.log_quat(q), [[0, 0, 0]], atol=1e-12)

    def test_exp_known_axis(self):
        # 90 deg about z
        q = so3.exp_axis(jnp.asarray([0.0, 0.0, jnp.pi / 2]))
        v = so3.quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-12)

    def test_log_wraps_to_pi(self):
        # rotation of 2*pi - 0.1 should log to -0.1 (wrap_pi of angle)
        v = jnp.asarray([0.0, 0.0, 2 * jnp.pi - 0.1])
        lv = so3.log_quat(so3.exp_axis(v))
        np.testing.assert_allclose(lv, [0.0, 0.0, -0.1], atol=1e-9)


class TestEuler:
    def test_rpy_roundtrip(self):
        rpy = jnp.asarray(rng(9).uniform(-1.0, 1.0, size=(16, 3)))
        R = so3.rpy_to_mat(rpy)
        np.testing.assert_allclose(so3.mat_to_rpy(R), rpy, atol=1e-10)

    def test_rpy_quat_consistent(self):
        rpy = jnp.asarray(rng(10).uniform(-1.0, 1.0, size=(16, 3)))
        Rq = so3.quat_to_mat(so3.rpy_to_quat(rpy))
        np.testing.assert_allclose(Rq, so3.rpy_to_mat(rpy), atol=1e-12)

    def test_yaw_only(self):
        rpy = jnp.asarray([0.0, 0.0, jnp.pi / 2])
        v = so3.quat_rotate(so3.rpy_to_quat(rpy), jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-12)


class TestJacobians:
    def test_rinv_left_identity_at_zero(self):
        J = so3.rinv_left(jnp.zeros(3))
        np.testing.assert_allclose(J, jnp.eye(3), atol=1e-12)

    def test_rinv_left_vs_finite_diff(self):
        # J_l^{-1} satisfies: log(exp(phi + J_l(phi) @ d)) ≈ phi + d  for small d;
        # equivalently d(log)/d(right perturbation)... verify via the defining
        # property  exp(phi)*exp(eps) = exp(phi + Jr^{-1}(phi) eps)  and
        # Jr^{-1}(phi) = Jl^{-1}(-phi)  =>  Rinvleft(-phi) maps right-perturbations.
        phi = jnp.asarray([0.3, -0.2, 0.5])
        eps = 1e-7
        Jr_inv = so3.rinv_left(-phi)  # as used in IESKF H (StateEstimator.hpp:526-529)
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            q_pert = so3.quat_mul(so3.exp_axis(phi), so3.exp_axis(d))
            dphi = (so3.log_quat(q_pert) - phi) / eps
            np.testing.assert_allclose(dphi, Jr_inv[:, k], atol=1e-5)

    def test_skew_cross(self):
        a = jnp.asarray(rng(11).normal(size=(8, 3)))
        b = jnp.asarray(rng(12).normal(size=(8, 3)))
        lhs = jnp.einsum("nij,nj->ni", so3.skew(a), b)
        np.testing.assert_allclose(lhs, jnp.cross(a, b), atol=1e-12)


class TestConfig:
    def test_presets(self):
        from lins_tpu.config import VLP16, OS1_64, PRESETS
        assert VLP16.line_num == 16 and VLP16.scan_num == 1800
        assert OS1_64.line_num == 64
        assert "hdl64" in PRESETS

    def test_reference_yaml_schema(self, tmp_path):
        from lins_tpu.config import SlamConfig
        y = tmp_path / "cfg.yaml"
        y.write_text(
            "line_num: 16\nscan_num: 1800\nscan_period: 0.1\n"
            "edge_threshold: 0.5\nnum_iter: 30\nlidar_std: 0.01\n"
            "max_lidar_nums: 200000\n"
            "init_ba:\n  rows: 3\n  cols: 1\n  dt: d\n"
            "  data: [-0.015774, 0.143237, -0.0263845]\n"
        )
        cfg = SlamConfig.from_yaml(str(y))
        assert cfg.num_iter == 30
        assert cfg.max_points == 200000
        np.testing.assert_allclose(cfg.init_ba, (-0.015774, 0.143237, -0.0263845))

    def test_bad_type_raises(self, tmp_path):
        from lins_tpu.config import SlamConfig
        y = tmp_path / "bad.yaml"
        y.write_text("line_num: not_a_number\n")
        with pytest.raises(ValueError, match="line_num"):
            SlamConfig.from_yaml(str(y))

    def test_unknown_fields_ignored(self, tmp_path):
        from lins_tpu.config import SlamConfig, VLP16
        y = tmp_path / "extra.yaml"
        y.write_text("line_num: 16\nsome_future_knob: 42\n"
                     "imu_topic: /imu/data\n")
        cfg = SlamConfig.from_yaml(str(y))
        assert cfg.line_num == 16
        assert not hasattr(cfg, "some_future_knob")

    def test_json_roundtrip(self, tmp_path):
        from lins_tpu.config import VLP16, SlamConfig
        p = tmp_path / "cfg.json"
        VLP16.save_json(str(p))
        assert SlamConfig.from_json(str(p)) == VLP16

    def test_hashable_static_arg(self):
        from lins_tpu.config import VLP16

        @jax.jit
        def f(x, cfg: "SlamConfig"):
            return x * cfg.scan_period

        from functools import partial
        f = jax.jit(lambda x, cfg: x * cfg.scan_period, static_argnums=1)
        assert float(f(jnp.asarray(2.0), VLP16)) == pytest.approx(0.2)
