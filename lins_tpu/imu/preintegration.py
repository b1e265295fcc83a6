"""VINS-Mono style IMU preintegration (reference C12, integrationBase.h:32-216).

Used during the two-scan bootstrap: relative-motion prior for the initial ICP
and the gyro-bias least-squares solve.  One `lax.scan` over the padded IMU
batch; keeps the 15x15 bias jacobian ([p v att ba bg] layout, att block at 6:9)
needed by solveGyroscopeBias (StateEstimator.hpp:1422-1445).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.geom import so3


class Preintegration(NamedTuple):
    delta_p: jnp.ndarray   # (3,)
    delta_q: jnp.ndarray   # (4,) wxyz
    delta_v: jnp.ndarray   # (3,)
    sum_dt: jnp.ndarray    # scalar
    jacobian: jnp.ndarray  # (15,15) d(delta)/d(bias) chain
    acc_0: jnp.ndarray     # (3,) last accel sample
    gyr_0: jnp.ndarray     # (3,) last gyro sample
    ba: jnp.ndarray        # (3,) linearization point
    bw: jnp.ndarray        # (3,)


def init_preintegration(acc0, gyr0, ba, bw, dtype=jnp.float64) -> Preintegration:
    return Preintegration(
        delta_p=jnp.zeros(3, dtype),
        delta_q=so3.quat_identity(dtype),
        delta_v=jnp.zeros(3, dtype),
        sum_dt=jnp.asarray(0.0, dtype),
        jacobian=jnp.eye(15, dtype=dtype),
        acc_0=jnp.asarray(acc0, dtype), gyr_0=jnp.asarray(gyr0, dtype),
        ba=jnp.asarray(ba, dtype), bw=jnp.asarray(bw, dtype))


def midpoint_step(pre: Preintegration, dt, acc1, gyr1) -> Preintegration:
    """One midpoint step (integrationBase.h:61-158), jacobian included."""
    dtype = pre.delta_p.dtype
    un_acc_0 = so3.quat_rotate(pre.delta_q, pre.acc_0 - pre.ba)
    un_gyr = 0.5 * (pre.gyr_0 + gyr1) - pre.bw
    dq = so3.quat_normalize(so3.quat_mul(pre.delta_q, so3.delta_q(un_gyr * dt)))
    un_acc_1 = so3.quat_rotate(dq, acc1 - pre.ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    delta_p = pre.delta_p + pre.delta_v * dt + 0.5 * un_acc * dt * dt
    delta_v = pre.delta_v + un_acc * dt

    # bias jacobian (integrationBase.h:83-139): rows/cols [p v att ba bg]
    R0 = so3.quat_to_mat(pre.delta_q)
    R1 = so3.quat_to_mat(dq)
    Rw = so3.skew(un_gyr)
    Ra0 = so3.skew(pre.acc_0 - pre.ba)
    Ra1 = so3.skew(acc1 - pre.ba)
    I3 = jnp.eye(3, dtype=dtype)

    P, V, A, BA, BG = (slice(0, 3), slice(3, 6), slice(6, 9),
                       slice(9, 12), slice(12, 15))
    F = jnp.zeros((15, 15), dtype)
    F = F.at[P, P].set(I3)
    F = F.at[P, A].set(-0.25 * R0 @ Ra0 * dt * dt
                       - 0.25 * R1 @ Ra1 @ (I3 - Rw * dt) * dt * dt)
    F = F.at[P, V].set(I3 * dt)
    F = F.at[P, BA].set(-0.25 * (R0 + R1) * dt * dt)
    F = F.at[P, BG].set(0.25 * R1 @ Ra1 * dt * dt * dt)
    F = F.at[A, A].set(I3 - Rw * dt)
    F = F.at[A, BG].set(-I3 * dt)
    F = F.at[V, A].set(-0.5 * R0 @ Ra0 * dt
                       - 0.5 * R1 @ Ra1 @ (I3 - Rw * dt) * dt)
    F = F.at[V, V].set(I3)
    F = F.at[V, BA].set(-0.5 * (R0 + R1) * dt)
    F = F.at[V, BG].set(0.5 * R1 @ Ra1 * dt * dt)
    F = F.at[BA, BA].set(I3)
    F = F.at[BG, BG].set(I3)

    return pre._replace(
        delta_p=delta_p, delta_q=dq, delta_v=delta_v,
        sum_dt=pre.sum_dt + dt, jacobian=F @ pre.jacobian,
        acc_0=acc1, gyr_0=gyr1)


@jax.jit
def preintegrate(pre: Preintegration, dts, accs, gyrs, valid) -> Preintegration:
    """Integrate a padded IMU batch (invalid slots are no-ops)."""

    def step(carry, x):
        dt, acc, gyr, ok = x
        new = midpoint_step(carry, dt, acc, gyr)
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, carry)
        return out, None

    pre, _ = jax.lax.scan(step, pre, (dts, accs, gyrs, valid))
    return pre


def solve_gyro_bias(pre: Preintegration, q_meas: jnp.ndarray) -> jnp.ndarray:
    """Gyro-bias LS correction from one preintegrated interval vs a measured
    relative rotation (solveGyroscopeBias, StateEstimator.hpp:1422-1445)."""
    A_blk = pre.jacobian[6:9, 12:15]
    resid = so3.quat_mul(so3.quat_inv(pre.delta_q), q_meas)
    b = 2.0 * resid[1:4]
    A = A_blk.T @ A_blk
    rhs = A_blk.T @ b
    return jnp.linalg.solve(A + 1e-12 * jnp.eye(3, dtype=A.dtype), rhs)
