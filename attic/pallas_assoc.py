"""SUNSET 2026-08-21 — NOT part of the production tree.

Fused Mosaic scan-to-scan association kernels (de-skew -> ring-window NN ->
residual rows -> J6'J6/J6'r per tile).  Never executed on the round-2..5
relay toolchain: round-2/3 compiles hung 40-50 minutes; the round-5 canary
ladder (tools/r5_assoc_canary.py) finally produced the definitive
diagnostic in 79 s — the kernel's scoped-VMEM stack is 43.21 MB at even a
(Q=128, R=256) toy shape vs the 16 MB Mosaic limit, SHAPE-INDEPENDENT, so
the kernel class as written cannot execute regardless of problem size.
The production scan-to-scan path is the XLA masked-argmin association
(odometry/association.py + ieskf._blocks_xla), which is exact and fast
(225 scans/s odometry).  Revisit only with a fundamentally restructured
kernel (streamed reference tiles, no per-tile full-R residency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lins_tpu.geom import so3

_BIG = 1e30


def _normalized_onehot(d2, m):
    """Rows: 1/multiplicity at columns equal to the row min, else 0."""
    hit = (d2 <= m[:, None]).astype(d2.dtype)
    return hit / jnp.maximum(jnp.sum(hit, axis=1, keepdims=True), 1.0)


def _deskew(q, rel, phi_x, phi_y, phi_z, rn_x, rn_y, rn_z):
    """transform_to_start with scalar pose components: exp(rel*phi) ⊗ q + rel*rn."""
    vx = rel * phi_x
    vy = rel * phi_y
    vz = rel * phi_z
    theta = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    small = theta < 1e-10
    safe = jnp.where(small, 1.0, theta)
    half = theta * 0.5
    sh = jnp.where(small, 0.0, jnp.sin(half) / safe)
    w = jnp.cos(half)
    qx, qy, qz = vx * sh, vy * sh, vz * sh
    # rotate q by quaternion (w, qx,qy,qz): v + 2(w*(u×v) + u×(u×v))
    px, py, pz = q[:, 0], q[:, 1], q[:, 2]
    cx = qy * pz - qz * py
    cy = qz * px - qx * pz
    cz = qx * py - qy * px
    c2x = qy * cz - qz * cy
    c2y = qz * cx - qx * cz
    c2z = qx * cy - qy * cx
    ox = px + 2.0 * (w * cx + c2x) + rel * rn_x
    oy = py + 2.0 * (w * cy + c2y) + rel * rn_y
    oz = pz + 2.0 * (w * cz + c2z) + rel * rn_z
    return jnp.stack([ox, oy, oz], axis=1)


def _surf_kernel(scal_ref, q_xyz_ref, q_rel_ref, q_valid_ref,
                 r_xyz_ref, r_ring_ref, r_valid_ref, jtj_ref):
    """scal (26,) SMEM: rn(0:3), phi(3:6), weighted flag(6), max_d2(7),
    RlT row-major (8:17), Rinv row-major (17:26)."""
    i = pl.program_id(0)

    weighted = scal_ref[6]
    max_d2 = scal_ref[7]

    q = q_xyz_ref[...]                     # (TQ, 3)
    rel = q_rel_ref[...][:, 0]
    qv = q_valid_ref[...][:, 0] > 0
    r = r_xyz_ref[...]                     # (R, 3)
    ring = r_ring_ref[...][:, 0]
    rv = r_valid_ref[...][:, 0] > 0

    p0 = _deskew(q, rel, scal_ref[3], scal_ref[4], scal_ref[5],
                 scal_ref[0], scal_ref[1], scal_ref[2])

    d2 = (jnp.sum(p0 * p0, axis=1, keepdims=True)
          + jnp.sum(r * r, axis=1)[None, :]
          - 2.0 * jax.lax.dot_general(
              p0, r, (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32))
    d2 = jnp.where(rv[None, :], jnp.maximum(d2, 0.0), _BIG)

    d1 = jnp.min(d2, axis=1)
    sel1 = _normalized_onehot(d2, d1)
    ring1 = sel1 @ ring[:, None]           # (TQ, 1)
    near = d1 < max_d2

    same = (ring[None, :] == ring1) & (d2 > d1[:, None])
    m2 = jnp.min(jnp.where(same, d2, _BIG), axis=1)
    sel2 = _normalized_onehot(jnp.where(same, d2, _BIG), m2)

    other = ((ring[None, :] != ring1)
             & (jnp.abs(ring[None, :] - ring1) <= 2.5) & rv[None, :])
    m3 = jnp.min(jnp.where(other, d2, _BIG), axis=1)
    sel3 = _normalized_onehot(jnp.where(other, d2, _BIG), m3)

    P1 = sel1 @ r
    P2 = sel2 @ r
    P3 = sel3 @ r

    ax, ay, az = (P1 - P2)[:, 0], (P1 - P2)[:, 1], (P1 - P2)[:, 2]
    bx, by, bz = (P1 - P3)[:, 0], (P1 - P3)[:, 1], (P1 - P3)[:, 2]
    Mx = ay * bz - az * by
    My = az * bx - ax * bz
    Mz = ax * by - ay * bx
    mn = jnp.sqrt(Mx * Mx + My * My + Mz * Mz)
    mn_safe = jnp.maximum(mn, 1e-12)
    dpx, dpy, dpz = ((p0 - P1)[:, 0], (p0 - P1)[:, 1], (p0 - P1)[:, 2])
    res = (dpx * Mx + dpy * My + dpz * Mz) / mn_safe
    jx, jy, jz = Mx / mn_safe, My / mn_safe, Mz / mn_safe

    pnorm = jnp.sqrt(jnp.sum(p0 * p0, axis=1))
    w = 1.0 - 1.8 * jnp.abs(res) / jnp.sqrt(
        jnp.sqrt(jnp.maximum(pnorm, 1e-12)))
    s = jnp.where(weighted >= 0.5, w, 1.0)

    ok = (qv & near & (m2 < max_d2) & (m3 < max_d2)
          & (s > 0.1) & (res != 0.0) & (mn > 1e-12))
    okf = ok.astype(jnp.float32)

    cx = okf * s * jx
    cy = okf * s * jy
    cz = okf * s * jz
    rw = okf * s * res

    # c2 = -Rlᵀ coeff  (components; RlT is row-major Rᵀ)
    T = lambda k: scal_ref[8 + k]
    c2x = -(T(0) * cx + T(1) * cy + T(2) * cz)
    c2y = -(T(3) * cx + T(4) * cy + T(5) * cz)
    c2z = -(T(6) * cx + T(7) * cy + T(8) * cz)
    # cross(c2, q)
    gx = c2y * q[:, 2] - c2z * q[:, 1]
    gy = c2z * q[:, 0] - c2x * q[:, 2]
    gz = c2x * q[:, 1] - c2y * q[:, 0]
    # H_att = cross(c2, q) @ Rinv
    V = lambda k: scal_ref[17 + k]
    h0 = gx * V(0) + gy * V(3) + gz * V(6)
    h1 = gx * V(1) + gy * V(4) + gz * V(7)
    h2 = gx * V(2) + gy * V(5) + gz * V(8)

    # One 8x8 Gram matrix carries everything: cols 0..5 = J6 rows,
    # col 6 = weighted residual, col 7 = match flag.  Then
    # G[:6,:6] = J6ᵀJ6, G[:6,6] = J6ᵀr, G[6,6] = Σr², G[7,7] = count.
    J8 = jnp.stack([h0, h1, h2, cx, cy, cz, rw, okf], axis=1)  # (TQ, 8)
    gram = jax.lax.dot_general(J8, J8, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        jtj_ref[...] = jnp.zeros_like(jtj_ref)

    jtj_ref[...] += gram


def _corner_kernel(scal_ref, q_xyz_ref, q_rel_ref, q_valid_ref,
                   r_xyz_ref, r_ring_ref, r_valid_ref, jtj_ref):
    """Point-to-line variant (findCorrespondingCornerFeatures,
    StateEstimator.hpp:955-1063): tripod1 = global NN, tripod2 = NN on a
    different ring within ±2; residual = dist(point, line(P1,P2)).
    Same SMEM layout as _surf_kernel."""
    i = pl.program_id(0)

    weighted = scal_ref[6]
    max_d2 = scal_ref[7]

    q = q_xyz_ref[...]
    rel = q_rel_ref[...][:, 0]
    qv = q_valid_ref[...][:, 0] > 0
    r = r_xyz_ref[...]
    ring = r_ring_ref[...][:, 0]
    rv = r_valid_ref[...][:, 0] > 0

    p0 = _deskew(q, rel, scal_ref[3], scal_ref[4], scal_ref[5],
                 scal_ref[0], scal_ref[1], scal_ref[2])

    d2 = (jnp.sum(p0 * p0, axis=1, keepdims=True)
          + jnp.sum(r * r, axis=1)[None, :]
          - 2.0 * jax.lax.dot_general(
              p0, r, (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32))
    d2 = jnp.where(rv[None, :], jnp.maximum(d2, 0.0), _BIG)

    d1 = jnp.min(d2, axis=1)
    sel1 = _normalized_onehot(d2, d1)
    ring1 = sel1 @ ring[:, None]
    near = d1 < max_d2

    other = ((ring[None, :] != ring1)
             & (jnp.abs(ring[None, :] - ring1) <= 2.5) & rv[None, :])
    m2 = jnp.min(jnp.where(other, d2, _BIG), axis=1)
    sel2 = _normalized_onehot(jnp.where(other, d2, _BIG), m2)

    P1 = sel1 @ r
    P2 = sel2 @ r

    # Pc = (P0-P1) x (P0-P2); res = |Pc| / |P1-P2|
    ax, ay, az = (p0 - P1)[:, 0], (p0 - P1)[:, 1], (p0 - P1)[:, 2]
    bx, by, bz = (p0 - P2)[:, 0], (p0 - P2)[:, 1], (p0 - P2)[:, 2]
    cx_ = ay * bz - az * by
    cy_ = az * bx - ax * bz
    cz_ = ax * by - ay * bx
    rr = jnp.sqrt(cx_ * cx_ + cy_ * cy_ + cz_ * cz_)
    dx, dy, dz = (P2 - P1)[:, 0], (P2 - P1)[:, 1], (P2 - P1)[:, 2]
    d12 = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    d12_safe = jnp.maximum(d12, 1e-12)
    denom = jnp.maximum(d12 * rr, 1e-12)
    res = rr / d12_safe
    # jac = Pcᵀ skew(P2-P1) / (d12 r) = cross(Pc, P2-P1) / denom
    jx = (cy_ * dz - cz_ * dy) / denom
    jy = (cz_ * dx - cx_ * dz) / denom
    jz = (cx_ * dy - cy_ * dx) / denom

    w = 1.0 - 1.8 * jnp.abs(res)
    s = jnp.where(weighted >= 0.5, w, 1.0)

    ok = (qv & near & (m2 < max_d2)
          & (s > 0.1) & (res != 0.0) & (rr > 1e-12))
    okf = ok.astype(jnp.float32)

    cx = okf * s * jx
    cy = okf * s * jy
    cz = okf * s * jz
    rw = okf * s * res

    T = lambda k: scal_ref[8 + k]
    c2x = -(T(0) * cx + T(1) * cy + T(2) * cz)
    c2y = -(T(3) * cx + T(4) * cy + T(5) * cz)
    c2z = -(T(6) * cx + T(7) * cy + T(8) * cz)
    gx = c2y * q[:, 2] - c2z * q[:, 1]
    gy = c2z * q[:, 0] - c2x * q[:, 2]
    gz = c2x * q[:, 1] - c2y * q[:, 0]
    V = lambda k: scal_ref[17 + k]
    h0 = gx * V(0) + gy * V(3) + gz * V(6)
    h1 = gx * V(1) + gy * V(4) + gz * V(7)
    h2 = gx * V(2) + gy * V(5) + gz * V(8)

    J8 = jnp.stack([h0, h1, h2, cx, cy, cz, rw, okf], axis=1)
    gram = jax.lax.dot_general(J8, J8, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        jtj_ref[...] = jnp.zeros_like(jtj_ref)

    jtj_ref[...] += gram


def _run_assoc_kernel(kernel, q_xyz, q_rel, q_valid, r_xyz, r_ring, r_valid,
                      rn, qbn, weighted, max_d2, interpret, tile_q):
    Q = q_xyz.shape[0]
    R = r_xyz.shape[0]
    qbn32 = qbn.astype(jnp.float32)
    phi = so3.log_quat(qbn32)
    RlT = so3.quat_to_mat(qbn32).T.reshape(-1)
    Rinv = so3.rinv_left(-phi).reshape(-1)
    scal = jnp.concatenate([
        rn.astype(jnp.float32), phi,
        jnp.stack([jnp.asarray(weighted, jnp.float32),
                   jnp.asarray(max_d2, jnp.float32)]), RlT, Rinv])

    out = pl.pallas_call(
        kernel,
        grid=(Q // tile_q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0)),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0)),
            pl.BlockSpec((R, 3), lambda i: (0, 0)),
            pl.BlockSpec((R, 1), lambda i: (0, 0)),
            pl.BlockSpec((R, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 8), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        interpret=interpret,
    )(scal,
      q_xyz.astype(jnp.float32), q_rel.astype(jnp.float32)[:, None],
      q_valid.astype(jnp.float32)[:, None],
      r_xyz.astype(jnp.float32), r_ring.astype(jnp.float32)[:, None],
      r_valid.astype(jnp.float32)[:, None])

    return (out[:6, :6], out[:6, 6], out[6, 6],
            out[7, 7].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("max_d2", "interpret", "tile_q",
                                              "icp_freq"))
def surf_normal_equations(q_xyz, q_rel, q_valid, r_xyz, r_ring, r_valid,
                          rn, qbn, iter_count, max_d2=25.0,
                          interpret=False, tile_q=128, icp_freq=1):
    """Fused surf association + reduction.

    Returns (JtJ (6,6), Jtr (6,), res_sq_sum, n_matched) in f32.
    Q must be a multiple of tile_q.
    """
    weighted = (jnp.asarray(iter_count, jnp.float32)
                >= icp_freq).astype(jnp.float32)
    return _run_assoc_kernel(
        _surf_kernel, q_xyz, q_rel, q_valid, r_xyz, r_ring, r_valid,
        rn, qbn, weighted, max_d2, interpret, tile_q)


@functools.partial(jax.jit, static_argnames=("max_d2", "interpret", "tile_q",
                                              "icp_freq"))
def corner_normal_equations(q_xyz, q_rel, q_valid, r_xyz, r_ring, r_valid,
                            rn, qbn, iter_count, max_d2=25.0,
                            interpret=False, tile_q=128, icp_freq=1):
    """Fused corner (point-to-line) association + reduction.

    Returns (JtJ (6,6), Jtr (6,), res_sq_sum, n_matched) in f32.
    Q must be a multiple of tile_q.
    """
    weighted = (jnp.asarray(iter_count, jnp.float32)
                >= icp_freq).astype(jnp.float32)
    return _run_assoc_kernel(
        _corner_kernel, q_xyz, q_rel, q_valid, r_xyz, r_ring, r_valid,
        rn, qbn, weighted, max_d2, interpret, tile_q)
