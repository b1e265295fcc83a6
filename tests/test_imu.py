"""ESKF propagation + preintegration tests (SURVEY.md §4.1).

Golden checks: propagation against synthetic IMU from an analytic trajectory
(must recover the true motion with zero noise/bias), boxPlus/boxMinus inverse
property, covariance growth/symmetry, preintegration jacobian vs finite
differences, gyro-bias recovery.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.geom import so3
from lins_tpu.imu import (
    FilterState, box_minus, box_plus, init_preintegration, initial_state,
    midpoint_step, predict_step, preintegrate, process_noise, propagate,
    reset_relative, solve_gyro_bias)

CFG = VLP16


def make_imu(kind="gentle", t0=0.0, t1=1.0, rate=400.0, **kw):
    pose_fn = syn.make_trajectory(kind, speed=1.0)
    times, acc, gyr = syn.generate_imu(pose_fn, t0, t1, rate, **kw)
    return pose_fn, times, acc, gyr


class TestBoxOps:
    def test_plus_minus_inverse(self):
        s = initial_state(CFG)
        s = s._replace(qbn=so3.quat_normalize(jnp.asarray([0.9, 0.1, -0.2, 0.3])))
        dx = jnp.asarray(np.random.default_rng(0).normal(size=18) * 0.1)
        s2 = box_plus(s, dx)
        np.testing.assert_allclose(box_minus(s2, s), dx, atol=1e-12)


class TestPropagation:
    def test_static_gravity_cancel(self):
        # static body: acc measures -g in body frame; state must stay put
        s = initial_state(CFG, acc=[0, 0, 9.81], gyr=[0, 0, 0])
        dts = jnp.full((40,), 0.0025)
        accs = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (40, 1))
        gyrs = jnp.zeros((40, 3))
        out = propagate(s, dts, accs, gyrs, jnp.ones(40, bool), CFG)
        np.testing.assert_allclose(out.rn, 0.0, atol=1e-12)
        np.testing.assert_allclose(out.vn, 0.0, atol=1e-12)

    def test_recovers_true_trajectory(self):
        # perfect IMU -> propagation must track the analytic trajectory
        pose_fn, times, acc, gyr = make_imu(t1=1.0)
        p0, q0 = pose_fn(0.0)
        v0 = jax.jacfwd(lambda t: pose_fn(t)[0])(0.0)
        s = initial_state(CFG, time=0.0, rn=p0, vn=v0, qbn=q0,
                          acc=acc[0], gyr=gyr[0])
        dts = jnp.diff(jnp.asarray(times))
        out = propagate(s, dts, jnp.asarray(acc[1:]), jnp.asarray(gyr[1:]),
                        jnp.ones(len(dts), bool), CFG)
        p1, q1 = pose_fn(float(times[-1]))
        np.testing.assert_allclose(out.rn, p1, atol=2e-4)
        ang = so3.log_quat(so3.quat_mul(so3.quat_inv(q1), out.qbn))
        np.testing.assert_allclose(ang, 0.0, atol=1e-4)

    def test_covariance_grows_symmetric(self):
        s = initial_state(CFG, acc=[0, 0, 9.81])
        dts = jnp.full((100,), 0.0025)
        accs = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (100, 1))
        gyrs = jnp.zeros((100, 3))
        out = propagate(s, dts, accs, gyrs, jnp.ones(100, bool), CFG)
        P = np.asarray(out.P)
        np.testing.assert_allclose(P, P.T, atol=1e-18)
        assert np.trace(P) > np.trace(np.asarray(s.P))
        assert np.all(np.linalg.eigvalsh(P) >= -1e-15)

    def test_padding_noop(self):
        s = initial_state(CFG, acc=[0, 0, 9.81])
        dts = jnp.full((10,), 0.0025)
        accs = jnp.tile(jnp.asarray([0.1, 0.0, 9.81]), (10, 1))
        gyrs = jnp.full((10, 3), 0.01)
        valid = jnp.asarray([True] * 5 + [False] * 5)
        out5 = propagate(s, dts[:5], accs[:5], gyrs[:5],
                         jnp.ones(5, bool), CFG)
        out10 = propagate(s, dts, accs, gyrs, valid, CFG)
        np.testing.assert_allclose(out5.rn, out10.rn, atol=1e-15)
        np.testing.assert_allclose(out5.P, out10.P, atol=1e-15)

    def test_matches_reference_equations_single_step(self):
        # hand-computed midpoint step (KalmanFilter.hpp:136-146)
        s = initial_state(CFG, vn=[1.0, 0, 0], acc=[0.2, 0, 9.81],
                          gyr=[0, 0, 0.1])
        dt, acc, gyr = 0.01, jnp.asarray([0.3, 0.0, 9.81]), jnp.asarray([0.0, 0.0, 0.2])
        Q = process_noise(CFG)
        out = predict_step(s, dt, acc, gyr, Q)
        un_acc_0 = np.asarray([0.2, 0, 9.81]) + np.asarray([0, 0, -9.81])
        un_gyr = 0.5 * (np.asarray([0, 0, 0.1]) + np.asarray([0, 0, 0.2]))
        q_new = so3.quat_mul(s.qbn, so3.exp_axis(jnp.asarray(un_gyr) * dt))
        un_acc_1 = np.asarray(so3.quat_rotate(q_new, acc)) + np.asarray([0, 0, -9.81])
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        rn_exp = np.asarray([1.0, 0, 0]) * dt + 0.5 * dt * dt * un_acc
        np.testing.assert_allclose(out.rn, rn_exp, atol=1e-12)
        np.testing.assert_allclose(out.vn, np.asarray([1.0, 0, 0]) + dt * un_acc,
                                   atol=1e-12)


class TestReset:
    def test_reset_rotates_into_body(self):
        rng = np.random.default_rng(3)
        s = initial_state(CFG, rn=[1, 2, 3], vn=[0.5, 0.1, -0.2])
        q = so3.quat_normalize(jnp.asarray(rng.normal(size=4)))
        s = s._replace(qbn=q, P=jnp.asarray(np.eye(18) * 0.1))
        out = reset_relative(s, CFG)
        np.testing.assert_allclose(out.rn, 0.0, atol=1e-15)
        np.testing.assert_allclose(
            out.vn, so3.quat_rotate_inv(q, s.vn), atol=1e-12)
        np.testing.assert_allclose(out.qbn, [1, 0, 0, 0], atol=1e-15)
        np.testing.assert_allclose(np.linalg.norm(out.gn), CFG.gravity,
                                   rtol=1e-12)


class TestPreintegration:
    def test_zero_motion(self):
        pre = init_preintegration([0, 0, 9.81], [0, 0, 0], [0, 0, 0], [0, 0, 0])
        dts = jnp.full((40,), 0.0025)
        accs = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (40, 1))
        gyrs = jnp.zeros((40, 3))
        out = preintegrate(pre, dts, accs, gyrs, jnp.ones(40, bool))
        # delta_v integrates specific force (no gravity subtraction): = g*t up
        np.testing.assert_allclose(out.delta_v, [0, 0, 9.81 * 0.1], atol=1e-9)
        np.testing.assert_allclose(out.delta_q, [1, 0, 0, 0], atol=1e-12)

    def test_jacobian_vs_finite_diff(self):
        # d(delta_q)/d(bg) block via finite differences
        rng = np.random.default_rng(5)
        dts = np.full(20, 0.0025)
        accs = rng.normal(0, 1, (20, 3)) + [0, 0, 9.81]
        gyrs = rng.normal(0, 0.5, (20, 3))

        def run(bw):
            pre = init_preintegration(accs[0], gyrs[0], [0, 0, 0], bw)
            return preintegrate(pre, jnp.asarray(dts), jnp.asarray(accs),
                                jnp.asarray(gyrs), jnp.ones(20, bool))

        base = run(jnp.zeros(3))
        J_att_bg = np.asarray(base.jacobian[6:9, 12:15])
        eps = 1e-6
        for k in range(3):
            bw = jnp.zeros(3).at[k].set(eps)
            pert = run(bw)
            dq = so3.quat_mul(so3.quat_inv(base.delta_q), pert.delta_q)
            dphi = np.asarray(so3.log_quat(dq)) / eps
            np.testing.assert_allclose(dphi, J_att_bg[:, k], atol=2e-3)

    def test_gyro_bias_recovery(self):
        # IMU with a known gyro bias; truth rotation known -> solve recovers it
        true_bw = np.asarray([0.01, -0.02, 0.015])
        pose_fn, times, acc, gyr = make_imu(t1=0.5, bw=true_bw)
        pre = init_preintegration(acc[0], gyr[0], [0, 0, 0], [0, 0, 0])
        dts = jnp.diff(jnp.asarray(times))
        out = preintegrate(pre, dts, jnp.asarray(acc[1:]), jnp.asarray(gyr[1:]),
                           jnp.ones(len(dts), bool))
        _, q0 = pose_fn(0.0)
        _, q1 = pose_fn(float(times[-1]))
        q_true = so3.quat_mul(so3.quat_inv(q0), q1)
        dbg = solve_gyro_bias(out, q_true)
        np.testing.assert_allclose(np.asarray(dbg), true_bw, atol=2e-3)
