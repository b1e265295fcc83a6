"""Error-state Kalman filter state + IMU propagation (reference C11).

Re-implements GlobalState/StatePredictor (KalmanFilter.hpp:35-380) as a pytree
+ pure functions.  The 18-dim error state layout matches the reference:
[pos 0:3, vel 3:6, att 6:9, ba 9:12, bw 12:15, grav 15:18]
(KalmanFilter.hpp:38-45).  Propagation over the IMU batch between two scans is
a single `lax.scan` (one fused XLA region instead of 40 per-sample calls).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3

POS = slice(0, 3)
VEL = slice(3, 6)
ATT = slice(6, 9)
ACC = slice(9, 12)
GYR = slice(12, 15)
GRA = slice(15, 18)
DIM = 18
NOISE_DIM = 12


class FilterState(NamedTuple):
    """Nominal state + covariance + last IMU sample (StatePredictor members)."""

    rn: jnp.ndarray    # (3,) position, n-frame
    vn: jnp.ndarray    # (3,) velocity, n-frame
    qbn: jnp.ndarray   # (4,) wxyz rotation b->n
    ba: jnp.ndarray    # (3,) accel bias
    bw: jnp.ndarray    # (3,) gyro bias
    gn: jnp.ndarray    # (3,) gravity, n-frame
    P: jnp.ndarray     # (18,18) error covariance
    time: jnp.ndarray  # scalar
    acc_last: jnp.ndarray  # (3,)
    gyr_last: jnp.ndarray  # (3,)


def box_plus(s: FilterState, dx: jnp.ndarray) -> FilterState:
    """State ⊞ error vector (KalmanFilter.hpp:71-81)."""
    dq = so3.exp_axis(dx[ATT])
    return s._replace(
        rn=s.rn + dx[POS], vn=s.vn + dx[VEL],
        qbn=so3.quat_normalize(so3.quat_mul(s.qbn, dq)),
        ba=s.ba + dx[ACC], bw=s.bw + dx[GYR], gn=s.gn + dx[GRA])


def box_minus(s: FilterState, s0: FilterState) -> jnp.ndarray:
    """State ⊟ state (KalmanFilter.hpp:84-94)."""
    da = so3.log_quat(so3.quat_mul(so3.quat_inv(s0.qbn), s.qbn))
    return jnp.concatenate([
        s.rn - s0.rn, s.vn - s0.vn, da, s.ba - s0.ba, s.bw - s0.bw,
        s.gn - s0.gn])


def init_covariance(cfg: SlamConfig, dtype=jnp.float64) -> jnp.ndarray:
    """P0 from config stds (KalmanFilter.hpp:247-283, type 0)."""
    att = tuple(so3.deg2rad(jnp.asarray(x)) for x in cfg.init_att_std)
    diag = jnp.concatenate([
        jnp.asarray(cfg.init_pos_std, dtype) ** 2,
        jnp.asarray(cfg.init_vel_std, dtype) ** 2,
        jnp.asarray(att, dtype) ** 2,
        jnp.asarray(cfg.init_acc_std, dtype) ** 2,
        jnp.asarray(cfg.init_gyr_std, dtype) ** 2,
        jnp.full((3,), 0.01, dtype),
    ])
    return jnp.diag(diag)


def process_noise(cfg: SlamConfig, dtype=jnp.float64) -> jnp.ndarray:
    """Continuous noise diag [acc_n, gyr_n, acc_w, gyr_w] (KalmanFilter.hpp:307-311)."""
    return jnp.diag(jnp.concatenate([
        jnp.full((3,), cfg.acc_noise, dtype),
        jnp.full((3,), cfg.gyr_noise, dtype),
        jnp.full((3,), cfg.acc_walk, dtype),
        jnp.full((3,), cfg.gyr_walk, dtype),
    ]))


def initial_state(cfg: SlamConfig, time=0.0, rn=None, vn=None, qbn=None,
                  ba=None, bw=None, acc=None, gyr=None,
                  dtype=jnp.float64) -> FilterState:
    """StatePredictor::initialization (KalmanFilter.hpp:211-222)."""
    z3 = jnp.zeros(3, dtype)
    return FilterState(
        rn=z3 if rn is None else jnp.asarray(rn, dtype),
        vn=z3 if vn is None else jnp.asarray(vn, dtype),
        qbn=(so3.quat_identity(dtype) if qbn is None
             else jnp.asarray(qbn, dtype)),
        ba=z3 if ba is None else jnp.asarray(ba, dtype),
        bw=z3 if bw is None else jnp.asarray(bw, dtype),
        gn=jnp.asarray([0.0, 0.0, -cfg.gravity], dtype),
        P=init_covariance(cfg, dtype),
        time=jnp.asarray(time, dtype),
        acc_last=z3 if acc is None else jnp.asarray(acc, dtype),
        gyr_last=z3 if gyr is None else jnp.asarray(gyr, dtype),
    )


def predict_step(s: FilterState, dt, acc, gyr, Q: jnp.ndarray) -> FilterState:
    """One IMU sample: midpoint state integration + covariance propagation
    (StatePredictor::predict, KalmanFilter.hpp:125-186)."""
    dtype = s.rn.dtype
    un_acc_0 = so3.quat_rotate(s.qbn, s.acc_last - s.ba) + s.gn
    un_gyr = 0.5 * (s.gyr_last + gyr) - s.bw
    q_new = so3.quat_normalize(so3.quat_mul(s.qbn, so3.exp_axis(un_gyr * dt)))
    un_acc_1 = so3.quat_rotate(q_new, acc - s.ba) + s.gn
    un_acc = 0.5 * (un_acc_0 + un_acc_1)

    rn = s.rn + dt * s.vn + 0.5 * dt * dt * un_acc
    vn = s.vn + dt * un_acc

    R_new = so3.quat_to_mat(q_new)
    I3 = jnp.eye(3, dtype=dtype)
    Ft = jnp.zeros((DIM, DIM), dtype)
    Ft = Ft.at[POS, VEL].set(I3)
    Ft = Ft.at[VEL, ATT].set(-R_new @ so3.skew(acc - s.ba))
    Ft = Ft.at[VEL, ACC].set(-R_new)
    Ft = Ft.at[VEL, GRA].set(I3)
    Ft = Ft.at[ATT, ATT].set(-so3.skew(gyr - s.bw))
    Ft = Ft.at[ATT, GYR].set(-I3)

    Gt = jnp.zeros((DIM, NOISE_DIM), dtype)
    Gt = Gt.at[VEL, 0:3].set(-R_new)
    Gt = Gt.at[ATT, 3:6].set(-I3)
    Gt = Gt.at[ACC, 6:9].set(I3)
    Gt = Gt.at[GYR, 9:12].set(I3)
    Gt = Gt * dt

    I = jnp.eye(DIM, dtype=dtype)
    F = I + Ft * dt + 0.5 * (Ft @ Ft) * dt * dt
    P = F @ s.P @ F.T + Gt @ Q @ Gt.T
    P = 0.5 * (P + P.T)

    return s._replace(rn=rn, vn=vn, qbn=q_new, P=P, time=s.time + dt,
                      acc_last=acc, gyr_last=gyr)


@partial(jax.jit, static_argnames=("cfg",))
def propagate_sequential(s: FilterState, dts, accs, gyrs, valid,
                         cfg: SlamConfig):
    """Reference-exact propagation: sequential per-sample covariance update
    (kept for parity tests; the production path is `propagate`)."""
    Q = process_noise(cfg, s.rn.dtype)

    def step(carry, x):
        dt, acc, gyr, ok = x
        new = predict_step(carry, dt, acc, gyr, Q)
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, carry)
        return out, None

    s, _ = jax.lax.scan(step, s, (dts, accs, gyrs, valid))
    return s


@partial(jax.jit, static_argnames=("cfg",))
def propagate(s: FilterState, dts, accs, gyrs, valid, cfg: SlamConfig):
    """Propagate through a padded IMU batch — TPU-fast two-phase form.

    Phase 1: a cheap `lax.scan` integrates only the nominal state (small
    vector ops) while emitting the per-step linearization inputs.
    Phase 2: all per-step transition matrices F_k and process noises
    Q_k = G_k Q G_kᵀ are built *batched*, and the covariance recursion
    P -> F P Fᵀ + Q (an affine map, associative under composition
    (A2,B2)∘(A1,B1) = (A2A1, A2 B1 A2ᵀ + B2)) collapses via
    `associative_scan` to log2(K) levels of batched 18x18 matmuls.

    Equivalent to the reference recursion (KalmanFilter.hpp:125-186) up to
    dropping the per-step symmetrization (re-applied once at the end).
    """
    dtype = s.rn.dtype
    Q = process_noise(cfg, dtype)
    K = dts.shape[0]

    # ---- fully parallel nominal-state integration ----
    # rotation: all midpoint gyro increments are known up front, so the
    # orientation trajectory is an associative quaternion prefix product
    dts_m = jnp.where(valid, dts, 0.0)
    gyr_prev = jnp.concatenate([s.gyr_last[None, :], gyrs[:-1]])
    un_gyr = 0.5 * (gyr_prev + gyrs) - s.bw[None, :]
    dq = so3.exp_axis(un_gyr * dts_m[:, None])
    dq = jnp.where(valid[:, None], dq, so3.quat_identity(dtype)[None, :])
    q_traj = jax.lax.associative_scan(so3.quat_mul,
                                      jnp.concatenate([s.qbn[None], dq]))[1:]
    q_traj = so3.quat_normalize(q_traj)

    # accelerations at the known orientations, then velocity/position as
    # prefix sums
    q_prev = jnp.concatenate([s.qbn[None], q_traj[:-1]])
    acc_prev = jnp.concatenate([s.acc_last[None, :], accs[:-1]])
    un_acc0 = so3.quat_rotate(q_prev, acc_prev - s.ba[None, :]) + s.gn[None, :]
    un_acc1 = so3.quat_rotate(q_traj, accs - s.ba[None, :]) + s.gn[None, :]
    un_acc = 0.5 * (un_acc0 + un_acc1)
    un_acc = jnp.where(valid[:, None], un_acc, 0.0)

    dv = dts_m[:, None] * un_acc
    vn_traj = s.vn[None, :] + jnp.cumsum(dv, axis=0)
    vn_prev = jnp.concatenate([s.vn[None], vn_traj[:-1]])
    dr = dts_m[:, None] * vn_prev + 0.5 * (dts_m ** 2)[:, None] * un_acc
    rn_final = s.rn + jnp.sum(dr, axis=0)

    # last *valid* measurement becomes acc_last/gyr_last
    any_valid = jnp.any(valid)
    last_i = jnp.where(any_valid,
                       K - 1 - jnp.argmax(jnp.flip(valid)), 0)
    s_out = s._replace(
        rn=rn_final, vn=vn_traj[-1],
        qbn=jnp.where(any_valid, q_traj[-1], s.qbn),
        time=s.time + jnp.sum(dts_m),
        acc_last=jnp.where(any_valid, accs[last_i], s.acc_last),
        gyr_last=jnp.where(any_valid, gyrs[last_i], s.gyr_last))
    ba_traj = jnp.broadcast_to(s.ba, (K, 3))
    bw_traj = jnp.broadcast_to(s.bw, (K, 3))

    # batched F_k, Q_k from the per-step linearization points
    def build(dt, acc, gyr, q_new, ba, bw, ok):
        I3 = jnp.eye(3, dtype=dtype)
        R_new = so3.quat_to_mat(q_new)
        Ft = jnp.zeros((DIM, DIM), dtype)
        Ft = Ft.at[POS, VEL].set(I3)
        Ft = Ft.at[VEL, ATT].set(-R_new @ so3.skew(acc - ba))
        Ft = Ft.at[VEL, ACC].set(-R_new)
        Ft = Ft.at[VEL, GRA].set(I3)
        Ft = Ft.at[ATT, ATT].set(-so3.skew(gyr - bw))
        Ft = Ft.at[ATT, GYR].set(-I3)
        Gt = jnp.zeros((DIM, NOISE_DIM), dtype)
        Gt = Gt.at[VEL, 0:3].set(-R_new)
        Gt = Gt.at[ATT, 3:6].set(-I3)
        Gt = Gt.at[ACC, 6:9].set(I3)
        Gt = Gt.at[GYR, 9:12].set(I3)
        Gt = Gt * dt
        I = jnp.eye(DIM, dtype=dtype)
        F = I + Ft * dt + 0.5 * (Ft @ Ft) * dt * dt
        Qk = Gt @ Q @ Gt.T
        F = jnp.where(ok, F, I)
        Qk = jnp.where(ok, Qk, jnp.zeros_like(Qk))
        return F, Qk

    F, Qk = jax.vmap(build)(dts, accs, gyrs, q_traj, ba_traj, bw_traj, valid)

    def combine(m1, m2):
        A1, B1 = m1
        A2, B2 = m2
        A = jnp.einsum("...ij,...jk->...ik", A2, A1)
        B = jnp.einsum("...ij,...jk,...lk->...il", A2, B1, A2) + B2
        return A, B

    A_tot, B_tot = jax.lax.associative_scan(combine, (F, Qk))
    A_f, B_f = A_tot[-1], B_tot[-1]
    P = A_f @ s.P @ A_f.T + B_f
    P = 0.5 * (P + P.T)
    return s_out._replace(P=P)


def reset_relative(s: FilterState, cfg: SlamConfig) -> FilterState:
    """StatePredictor::reset(1) — the robocentric re-anchoring after each scan
    (KalmanFilter.hpp:320-353): rotate velocity/gravity covariance into the new
    body frame, re-zero relative pose, renormalize gravity to |g|."""
    dtype = s.rn.dtype
    R = so3.quat_to_mat(s.qbn)
    att_std = so3.deg2rad(jnp.asarray(cfg.init_att_std, dtype))

    vel_cov = R.T @ s.P[VEL, VEL] @ R
    gra_cov = R.T @ s.P[GRA, GRA] @ R

    P = jnp.zeros((DIM, DIM), dtype)
    P = P.at[POS, POS].set(jnp.diag(jnp.asarray(cfg.init_pos_std, dtype) ** 2))
    P = P.at[VEL, VEL].set(vel_cov)
    P = P.at[ATT, ATT].set(jnp.diag(att_std ** 2))
    P = P.at[ACC, ACC].set(s.P[ACC, ACC])
    P = P.at[GYR, GYR].set(s.P[GYR, GYR])
    P = P.at[GRA, GRA].set(gra_cov)

    vn = so3.quat_rotate_inv(s.qbn, s.vn)
    gn = so3.quat_rotate_inv(s.qbn, s.gn)
    gn = gn * cfg.gravity / jnp.maximum(jnp.linalg.norm(gn), 1e-9)
    return s._replace(rn=jnp.zeros(3, dtype), vn=vn,
                      qbn=so3.quat_identity(dtype), gn=gn, P=P)


def calculate_rp_from_gravity(f_b: jnp.ndarray, gravity: float):
    """Roll/pitch from a body-frame specific-force/gravity vector
    (StateEstimator.hpp:602-605)."""
    sign_z = jnp.sign(f_b[2])
    sign_z = jnp.where(sign_z == 0, 1.0, sign_z)
    pitch = -sign_z * jnp.arcsin(jnp.clip(f_b[0] / gravity, -1.0, 1.0))
    roll = sign_z * jnp.arcsin(jnp.clip(f_b[1] / gravity, -1.0, 1.0))
    return roll, pitch
