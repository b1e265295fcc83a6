"""Scan-to-scan Gauss-Newton ICP (reference C15, StateEstimator.hpp:1163-1320).

Used for second-scan bootstrap and as the IESKF divergence fallback.  6-DOF
[rot(rpy), pos] GN over the same stacked point-to-line/plane rows, with the
LOAM degeneracy projection (eigendecompose JᵀJ, null out directions with
eigenvalue < 10) and the reference's convergence thresholds (0.1 deg / 0.1 cm).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3
from lins_tpu.odometry import association as assoc


def gn_step(rn, qbn, m: assoc.Matches, rel_time, iter_count, proj, cfg,
            dtype):
    """One GN iteration.  Returns (rn, qbn, converged, proj, JtJ)."""
    coeff = jnp.where(m.valid[:, None], m.coeff, 0.0).astype(dtype)
    res = jnp.where(m.valid, m.resid, 0.0).astype(dtype)
    pt = m.point.astype(dtype)

    phi = so3.log_quat(qbn)
    q_s = so3.exp_axis(rel_time[:, None].astype(dtype) * phi[None, :])
    R_s = so3.quat_to_mat(q_s)                              # (M,3,3)
    RS = -jnp.einsum("nij,njk->nik", R_s, so3.skew(pt))     # (M,3,3)
    J_rot = jnp.einsum("ni,nij->nj", coeff, RS)             # (M,3)
    J6 = jnp.concatenate([J_rot, coeff], axis=-1)           # (M,6)
    b = -0.05 * res                                          # (M,)

    JtJ = J6.T @ J6
    Jtb = J6.T @ b
    x = jnp.linalg.solve(JtJ + 1e-12 * jnp.eye(6, dtype=dtype), Jtb)

    # degeneracy projection, built on the first iteration
    # (StateEstimator.hpp:1266-1302)
    def build_proj(_):
        w, V = jnp.linalg.eigh(JtJ)
        keep = (w >= 10.0).astype(dtype)
        return V @ jnp.diag(keep) @ V.T

    proj = jax.lax.cond(iter_count == 0, build_proj, lambda _: proj, None)
    x = proj @ x

    dq = so3.rpy_to_quat(x[0:3])
    qbn_new = so3.quat_normalize(so3.quat_mul(qbn, dq))
    rn_new = rn + x[3:6]

    delta_r = jnp.linalg.norm(so3.rad2deg(x[0:3]))
    delta_t = jnp.linalg.norm(100.0 * x[3:6])
    converged = (delta_r < 0.1) & (delta_t < 0.1)
    return rn_new, qbn_new, converged, proj


def estimate_transform(rn0, qbn0, new_flat, new_sharp, last_surf, last_corner,
                       cfg: SlamConfig):
    """Full GN ICP loop (estimateTransform, StateEstimator.hpp:1163-1196).

    Iterates association + GN step up to num_iter times; skips the solve when
    matches are insufficient (<10 surf or <5 corner), like the reference.
    Returns (rn, qbn, iters).
    """
    dtype = rn0.dtype

    def body(carry):
        rn, qbn, it, conv, proj = carry
        surf = assoc.find_surf_matches(
            new_flat.xyz.astype(dtype), new_flat.rel_time.astype(dtype),
            new_flat.valid, last_surf["xyz"].astype(dtype), last_surf["ring"],
            last_surf["valid"], rn, qbn, it, cfg)
        corn = assoc.find_corner_matches(
            new_sharp.xyz.astype(dtype), new_sharp.rel_time.astype(dtype),
            new_sharp.valid, last_corner["xyz"].astype(dtype),
            last_corner["ring"], last_corner["valid"], rn, qbn, it, cfg)
        enough = (jnp.sum(surf.valid) >= 10) & (jnp.sum(corn.valid) >= 5)

        m = assoc.stack_matches(surf, corn)
        rel = jnp.concatenate([new_flat.rel_time, new_sharp.rel_time])
        rn_n, qbn_n, conv_n, proj_n = gn_step(
            rn, qbn, m, rel, it, proj, cfg, dtype)

        rn = jnp.where(enough, rn_n, rn)
        qbn = jnp.where(enough, qbn_n, qbn)
        proj = jnp.where(enough, proj_n, proj)
        return rn, qbn, it + 1, conv_n & enough, proj

    def cond(carry):
        _, _, it, conv, _ = carry
        return (it < cfg.num_iter) & ~conv

    init = (rn0, qbn0, jnp.int32(0), jnp.asarray(False),
            jnp.eye(6, dtype=dtype))
    rn, qbn, iters, _, _ = jax.lax.while_loop(cond, body, init)
    return rn, qbn, iters
