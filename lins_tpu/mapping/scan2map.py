"""Scan-to-map Gauss-Newton refinement (reference C20,
lidar_mapping_node.cpp:1351-1652) — the second fused TPU kernel.

Per GN iteration, in one compiled region:
  corner: 5-NN in the corner map -> 3x3 PCA -> point-to-line residual when
          the cluster is linear (λ1 > 3 λ2)
  surf:   5-NN in the surf map -> plane fit (normal equations) -> point-to-
          plane residual when the fit is tight (all |d| <= 0.2)
  stack -> 6x6 normal equations -> solve with the LOAM degeneracy projection
          (eigenvalue threshold 100)
Pose is (t, q) with axis-angle right-perturbation instead of the reference's
hand-expanded YZX Euler jacobians (lidar_mapping_node.cpp:1543-1576) — same
first-order geometry, no convention gymnastics.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3
from lins_tpu.ops.grid_nn import build_grid, grid_knn
from lins_tpu.ops.lin3 import eigh_sym3x3, solve_sym3x3


def corner_residuals(q_pts, q_valid, t, q, grid):
    """Point-to-line residuals vs 5-NN PCA lines
    (cornerOptimization, lidar_mapping_node.cpp:1351-1458).

    5-NN via the 1 m voxel-hash grid (ops/grid_nn.py) — identical accepted
    matches to brute force because the `d2[4] < 1.0` gate below bounds the
    useful search radius to one cell."""
    p_w = so3.quat_rotate(q[None, :], q_pts) + t[None, :]
    nn, d2 = grid_knn(p_w, q_valid, grid, k=5)   # (Q,5,3), (Q,5)
    near = d2[:, 4] < 1.0
    c = jnp.mean(nn, axis=1)                  # centroid
    dcm = nn - c[:, None, :]
    A = jnp.einsum("nki,nkj->nij", dcm, dcm) / 5.0
    w, V = eigh_sym3x3(A)                     # ascending; closed form —
    # jnp.linalg.eigh costs ~2 ms per call at this batch size on TPU
    lam1, lam2 = w[:, 2], w[:, 1]
    linear = lam1 > 3.0 * lam2
    v = V[:, :, 2]                            # principal direction

    # point-to-line through centroid with direction v
    d = p_w - c
    cr = jnp.cross(d, v)
    res = jnp.linalg.norm(cr, axis=-1)
    res_safe = jnp.maximum(res, 1e-12)
    # gradient of distance wrt p_w:  (cr x v)/|cr|  — unit, in-plane
    grad = jnp.cross(cr, v) / res_safe[:, None]
    gn = jnp.linalg.norm(grad, axis=-1)
    grad = grad / jnp.maximum(gn, 1e-12)[:, None]

    s = 1.0 - 0.9 * jnp.abs(res)
    ok = q_valid & near & linear & (s > 0.1) & (res > 1e-9)
    return p_w, grad * s[:, None], s * res, ok


def surf_residuals(q_pts, q_valid, t, q, grid):
    """Point-to-plane residuals vs 5-NN plane fits
    (surfOptimization, lidar_mapping_node.cpp:1460-1521).  5-NN via the
    voxel-hash grid, same argument as corner_residuals."""
    p_w = so3.quat_rotate(q[None, :], q_pts) + t[None, :]
    nn, d2 = grid_knn(p_w, q_valid, grid, k=5)   # (Q,5,3), (Q,5)
    near = d2[:, 4] < 1.0
    # solve A n = -1 (plane n·x + 1 = 0) via normal equations
    AtA = jnp.einsum("nki,nkj->nij", nn, nn)
    Atb = -jnp.sum(nn, axis=1)
    n = solve_sym3x3(AtA + 1e-9 * jnp.eye(3, dtype=q_pts.dtype), Atb)
    norm = jnp.linalg.norm(n, axis=-1)
    norm_safe = jnp.maximum(norm, 1e-12)
    pa = n / norm_safe[:, None]
    pd = 1.0 / norm_safe

    fit = jnp.abs(jnp.einsum("nki,ni->nk", nn, pa) + pd[:, None])
    plane_ok = jnp.all(fit <= 0.2, axis=1)

    pd2 = jnp.einsum("ni,ni->n", p_w, pa) + pd
    s = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(
        jnp.sqrt(jnp.maximum(jnp.linalg.norm(p_w, axis=-1), 1e-12)))
    ok = q_valid & near & plane_ok & (s > 0.1)
    return p_w, pa * s[:, None], s * pd2, ok


def _gn_normal_eqs(q_pts, coeff, res, ok, q):
    """Stack [J_rot | J_t] rows into 6x6 normal equations.

    J_rot = -coeffᵀ R [p]x (right-perturbation), J_t = coeff
    (LMOptimization, lidar_mapping_node.cpp:1523-1633 re-derived)."""
    R = so3.quat_to_mat(q)
    coeff = jnp.where(ok[:, None], coeff, 0.0)
    res = jnp.where(ok, res, 0.0)
    Rp = jnp.einsum("ij,njk->nik", R, so3.skew(q_pts))
    J_rot = -jnp.einsum("ni,nij->nj", coeff, Rp)
    J = jnp.concatenate([J_rot, coeff], axis=-1)
    return J.T @ J, J.T @ (-res), jnp.sum(ok)


@partial(jax.jit, static_argnames=("cfg",))
def scan_to_map(t0, q0, corner_pts, corner_valid, surf_pts, surf_valid,
                corner_map, corner_map_valid, surf_map, surf_map_valid,
                cfg: SlamConfig):
    """Full GN refinement loop (scan2MapOptimization,
    lidar_mapping_node.cpp:1635-1652).  Returns (t, q, iters, n_matches)."""
    dtype = t0.dtype
    enough_map = ((jnp.sum(corner_map_valid) > 10)
                  & (jnp.sum(surf_map_valid) > 100))

    # hash the (fixed) local maps once; only the queries move per iteration
    corner_grid = build_grid(corner_map, corner_map_valid, cell=1.0,
                             table=8192)
    surf_grid = build_grid(surf_map, surf_map_valid, cell=1.0, table=16384)

    def body(carry):
        t, q, it, conv, proj, nm = carry
        pc, cc, rc, okc = corner_residuals(corner_pts, corner_valid, t, q,
                                           corner_grid)
        ps, cs, rs, oks = surf_residuals(surf_pts, surf_valid, t, q,
                                         surf_grid)
        # normal equations over both residual sets (body-frame points)
        H1, b1, n1 = _gn_normal_eqs(corner_pts, cc, rc, okc, q)
        H2, b2, n2 = _gn_normal_eqs(surf_pts, cs, rs, oks, q)
        H, b = H1 + H2, b1 + b2
        n_sel = n1 + n2
        enough = n_sel >= 50   # LMOptimization:1531-1533

        x = jnp.linalg.solve(H + 1e-9 * jnp.eye(6, dtype=dtype), b)

        def build_proj(_):
            w, V = jnp.linalg.eigh(H)
            keep = (w >= 100.0).astype(dtype)
            return V @ jnp.diag(keep) @ V.T

        proj = jax.lax.cond(it == 0, build_proj, lambda _: proj, None)
        x = proj @ x

        q_new = so3.quat_normalize(so3.quat_mul(q, so3.exp_axis(x[0:3])))
        t_new = t + x[3:6]
        do = enough & enough_map
        t = jnp.where(do, t_new, t)
        q = jnp.where(do, q_new, q)

        delta_r = jnp.linalg.norm(so3.rad2deg(x[0:3]))
        delta_t = jnp.linalg.norm(100.0 * x[3:6])
        conv = do & (delta_r < 0.05) & (delta_t < 0.05)
        return t, q, it + 1, conv, proj, n_sel.astype(jnp.int32)

    def cond(carry):
        _, _, it, conv, _, _ = carry
        return (it < cfg.scan2map_iters) & ~conv

    init = (t0, q0, jnp.int32(0), jnp.asarray(False),
            jnp.eye(6, dtype=dtype), jnp.int32(0))
    t, q, iters, _, _, n_sel = jax.lax.while_loop(cond, body, init)
    return t, q, iters, n_sel
