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

TPU-native NN structure (replaces the reference's per-iteration KD-tree
queries, :1355-1357, 1465): the voxel-hash-grid candidate gather — the only
irregular-memory op, DMA-descriptor-bound on TPU — runs ONCE per mapping
step (ops/grid_nn.gather_candidates); every GN iteration then re-ranks the
compact cached (Q, C, 3) candidate block at the current pose with dense
vector math (knn_from_candidates).  Two per-query bounds (neighborhood
coverage + C-th-candidate distance) trigger a re-gather inside the loop
when — and only when — the pose has moved far enough that the cache could
miss a point inside the 1 m acceptance ball, so accepted correspondences
are IDENTICAL to per-iteration brute force.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3
from lins_tpu.ops.grid_nn import (build_grid, gather_candidates,
                                  knn_from_candidates)
from lins_tpu.ops.lin3 import eigh_sym3x3, solve_sym3x3

# default cached candidates per query (one-shot scan_to_map path; the
# production loop reads cfg.s2m_cand): an upper bound on realistic map
# densities within the ~1.2-2 m gathered neighborhoods (a 0.4 m-leaf plane
# patch holds ~36, a 0.2 m-leaf edge bundle far fewer); the d2C re-gather
# bound makes pruning exact regardless of the width
_CAND = 64


class _Gather(NamedTuple):
    pc: jnp.ndarray       # corner query world positions at gather time
    ps: jnp.ndarray       # surf query world positions at gather time
    cc: jnp.ndarray       # (Qc, C, 3) corner candidates
    cc_ok: jnp.ndarray
    cc_d2C: jnp.ndarray   # (Qc,) distance^2 of the pruned C-th candidate
    cc_cov: jnp.ndarray   # (Qc,) coverage radius of the gathered block
    sc: jnp.ndarray
    sc_ok: jnp.ndarray
    sc_d2C: jnp.ndarray
    sc_cov: jnp.ndarray


# NOTE on contraction style in this file: every small contraction in the
# residual-fit path is written as explicit multiply+sum, NOT einsum/matmul.
# TPU f32 einsums default to bf16 MXU passes; at world coordinates of tens
# of meters that is 0.05-0.1 m of error INSIDE the plane-validity and
# s-weight gates — the round-5 selfcheck canary measured 86/2279 match
# flips and 1.5 cm/step pose error from exactly this (the same silent-
# accuracy class round 3 fixed in association/top_k, missed here).
# precision=HIGHEST is NOT the fix: a HIGHEST einsum adjacent to this loop
# came back WRONG inside the fused program on this toolchain (round-4 ban,
# ops/grid_nn.py:334-373).  Explicit mul+sum lowers to the VPU as exact
# f32 and is faster than an MXU trip at these tiny sizes anyway.


def _dot(a, b):
    """Exact-f32 inner product over the last axis (VPU, no MXU lowering)."""
    return jnp.sum(a * b, axis=-1)


def _outer_sum(x):
    """(..., k, 3) -> (..., 3, 3) sum of outer products, exact f32."""
    return jnp.sum(x[..., :, :, None] * x[..., :, None, :], axis=-3)


def corner_residuals(p_w, nn, d2, q_valid):
    """Point-to-line residuals vs 5-NN PCA lines
    (cornerOptimization, lidar_mapping_node.cpp:1351-1458)."""
    near = d2[:, 4] < 1.0
    c = jnp.mean(nn, axis=1)                  # centroid
    dcm = nn - c[:, None, :]
    A = _outer_sum(dcm) / 5.0
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
    return grad * s[:, None], s * res, ok


def surf_residuals(p_w, nn, d2, q_valid):
    """Point-to-plane residuals vs 5-NN plane fits
    (surfOptimization, lidar_mapping_node.cpp:1460-1521)."""
    near = d2[:, 4] < 1.0
    # solve A n = -1 (plane n·x + 1 = 0) via normal equations
    AtA = _outer_sum(nn)
    Atb = -jnp.sum(nn, axis=1)
    n = solve_sym3x3(AtA + 1e-9 * jnp.eye(3, dtype=p_w.dtype), Atb)
    norm = jnp.linalg.norm(n, axis=-1)
    norm_safe = jnp.maximum(norm, 1e-12)
    pa = n / norm_safe[:, None]
    pd = 1.0 / norm_safe

    fit = jnp.abs(_dot(nn, pa[:, None, :]) + pd[:, None])
    plane_ok = jnp.all(fit <= 0.2, axis=1)

    pd2 = _dot(p_w, pa) + pd
    s = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(
        jnp.sqrt(jnp.maximum(jnp.linalg.norm(p_w, axis=-1), 1e-12)))
    ok = q_valid & near & plane_ok & (s > 0.1)
    return pa * s[:, None], s * pd2, ok


def _gn_normal_eqs(q_pts, coeff, res, ok, q):
    """Stack [J_rot | J_t] rows into 6x6 normal equations.

    J_rot = -coeffᵀ R [p]x (right-perturbation), J_t = coeff
    (LMOptimization, lidar_mapping_node.cpp:1523-1633 re-derived)."""
    R = so3.quat_to_mat(q)
    coeff = jnp.where(ok[:, None], coeff, 0.0)
    res = jnp.where(ok, res, 0.0)
    # explicit mul+sum throughout (see NOTE above corner_residuals):
    # Rp[n,i,k] = sum_j R[i,j] skew(p_n)[j,k]
    sk = so3.skew(q_pts)
    Rp = jnp.sum(R[None, :, :, None] * sk[:, None, :, :], axis=2)
    J_rot = -jnp.sum(coeff[:, :, None] * Rp, axis=1)
    J = jnp.concatenate([J_rot, coeff], axis=-1)
    JtJ = jnp.sum(J[:, :, None] * J[:, None, :], axis=0)
    Jtr = jnp.sum(J * (-res)[:, None], axis=0)
    return JtJ, Jtr, jnp.sum(ok)


def scan_to_map_grids(t0, q0, corner_pts, corner_valid, surf_pts, surf_valid,
                      corner_grid, surf_grid, n_corner_map, n_surf_map,
                      cfg: SlamConfig):
    """Full GN refinement loop (scan2MapOptimization,
    lidar_mapping_node.cpp:1635-1652) against PREBUILT map hash grids —
    the production path: the mapper caches the grids across mapping steps
    (mapping/local_map.py) and this loop caches the candidate gather across
    GN iterations (module docstring).  Returns
    (t, q, iters, n_matches, n_refresh) — n_refresh the number of in-loop
    cache re-gathers the staleness bounds forced (0 on most steps; the
    cfg.s2m_cand A/B reads this as its exactness-cost metric)."""
    dtype = t0.dtype
    enough_map = (n_corner_map > 10) & (n_surf_map > 100)

    def world(t, q):
        return (so3.quat_rotate(q[None, :], corner_pts) + t[None, :],
                so3.quat_rotate(q[None, :], surf_pts) + t[None, :])

    use_pallas = cfg.use_pallas_select
    interp = jax.default_backend() == "cpu"
    C = getattr(cfg, "s2m_cand", _CAND)

    def gather_all(t, q):
        pc, ps = world(t, q)
        cc, cc_ok, cc_d2C, cc_cov = gather_candidates(
            pc, corner_valid, corner_grid, C, use_pallas, interp)
        sc, sc_ok, sc_d2C, sc_cov = gather_candidates(
            ps, surf_valid, surf_grid, C, use_pallas, interp)
        return _Gather(pc, ps, cc, cc_ok, cc_d2C, cc_cov,
                       sc, sc_ok, sc_d2C, sc_cov)

    Qc = corner_pts.shape[0]

    def rerank_both(pc, ps, G):
        """ONE fused 5-NN re-rank over the concatenated corner+surf caches:
        knn_from_candidates is latency-floor-bound (~1.5 ms/call on v5e
        regardless of Q), so one call on (Qc+Qs, C) halves the
        per-iteration re-rank cost vs two per-channel calls.  (The fusion
        is exactness-verified on device — the round-4 sort-carry re-rank
        regression bisected to knn_from_candidates' internals, not to this
        concat; see its docstring.)"""
        nn, d2 = knn_from_candidates(
            jnp.concatenate([pc, ps]),
            jnp.concatenate([corner_valid, surf_valid]),
            jnp.concatenate([G.cc, G.sc]),
            jnp.concatenate([G.cc_ok, G.sc_ok]))
        return nn[:Qc], d2[:Qc], nn[Qc:], d2[Qc:]

    def stale(p_now, p_gat, valid, d2_5, d2C, cov):
        """True iff some query's cached top-5 may differ from brute force.

        Any map point NOT in a query's cache was, at gather time, at
        distance >= safe = min(cover, sqrt(d2C)) from the gather-time query
        (outside the gathered block => >= cover; gathered but pruned =>
        >= sqrt(d2C)); after the query moved by d it is >= safe - d.  The
        cached top-5 re-ranked at the current pose is therefore the TRUE
        top-5 whenever its 5th distance r5 <= safe - d, and when r5 > 1 the
        acceptance gate (d2[4] < 1) rejects both the cached and the true
        match as long as 1 <= safe - d.  So the cache is exact-for-accepted
        iff min(r5, 1) + d <= safe — which always holds at d = 0 (r5 is a
        subset-5th of the same gather, so r5 <= sqrt(d2C); cover >= 1 by
        grid construction)."""
        d = jnp.linalg.norm(p_now - p_gat, axis=1)
        safe = jnp.minimum(cov, jnp.sqrt(d2C))
        r5 = jnp.minimum(jnp.sqrt(d2_5), 1.0)
        return jnp.any(valid & (r5 + d > safe))

    def body(carry):
        t, q, it, conv, proj, nm, nref, G = carry
        pc, ps = world(t, q)
        nn_c, d2_c, nn_s, d2_s = rerank_both(pc, ps, G)
        need = (stale(pc, G.pc, corner_valid, d2_c[:, 4], G.cc_d2C,
                      G.cc_cov)
                | stale(ps, G.ps, surf_valid, d2_s[:, 4], G.sc_d2C,
                        G.sc_cov))
        nref = nref + need.astype(jnp.int32)

        def refresh(_):
            G2 = gather_all(t, q)
            nn_c2, d2_c2, nn_s2, d2_s2 = rerank_both(pc, ps, G2)
            return G2, nn_c2, d2_c2, nn_s2, d2_s2

        G, nn_c, d2_c, nn_s, d2_s = jax.lax.cond(
            need, refresh, lambda _: (G, nn_c, d2_c, nn_s, d2_s), None)
        cc, rc, okc = corner_residuals(pc, nn_c, d2_c, corner_valid)
        cs, rs, oks = surf_residuals(ps, nn_s, d2_s, surf_valid)
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
            # V diag(keep) V^T as explicit mul+sum (see contraction NOTE)
            return jnp.sum((V * keep[None, :])[:, None, :]
                           * V[None, :, :], axis=2)

        proj = jax.lax.cond(it == 0, build_proj, lambda _: proj, None)
        x = jnp.sum(proj * x[None, :], axis=1)

        q_new = so3.quat_normalize(so3.quat_mul(q, so3.exp_axis(x[0:3])))
        t_new = t + x[3:6]
        do = enough & enough_map
        t = jnp.where(do, t_new, t)
        q = jnp.where(do, q_new, q)

        delta_r = jnp.linalg.norm(so3.rad2deg(x[0:3]))
        delta_t = jnp.linalg.norm(100.0 * x[3:6])
        conv = do & (delta_r < 0.05) & (delta_t < 0.05)
        return t, q, it + 1, conv, proj, n_sel.astype(jnp.int32), nref, G

    def cond(carry):
        _, _, it, conv, _, _, _, _ = carry
        return (it < cfg.scan2map_iters) & ~conv

    init = (t0, q0, jnp.int32(0), jnp.asarray(False),
            jnp.eye(6, dtype=dtype), jnp.int32(0), jnp.int32(0),
            gather_all(t0, q0))
    t, q, iters, _, _, n_sel, n_refresh, _ = jax.lax.while_loop(
        cond, body, init)
    return t, q, iters, n_sel, n_refresh


@partial(jax.jit, static_argnames=("cfg",))
def scan_to_map(t0, q0, corner_pts, corner_valid, surf_pts, surf_valid,
                corner_map, corner_map_valid, surf_map, surf_map_valid,
                cfg: SlamConfig):
    """scan_to_map_grids with the grids built in-line from point maps —
    the one-shot/oracle path (tests, ad-hoc alignment)."""
    corner_grid = build_grid(corner_map, corner_map_valid, cell=1.2,
                             table=8192, cap=224)
    surf_grid = build_grid(surf_map, surf_map_valid, cell=1.2, table=16384,
                           cap=224)
    return scan_to_map_grids(
        t0, q0, corner_pts, corner_valid, surf_pts, surf_valid,
        corner_grid, surf_grid, jnp.sum(corner_map_valid),
        jnp.sum(surf_map_valid), cfg)