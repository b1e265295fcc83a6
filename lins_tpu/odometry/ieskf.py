"""Iterated error-state Kalman filter update (reference C14,
StateEstimator.hpp:465-600) — the flagship fused per-scan region.

TPU-native redesign: the reference stacks an (M,18) H, forms the (M,M)
innovation covariance S = HPHᵀ+R and LLT-solves it (StateEstimator.hpp:541-546).
Since only the att/pos columns of H are nonzero and R = σ²I, we use the
*information form*:

    K (r + Hδ) = (P⁻¹ + HᵀH/σ²)⁻¹ Hᵀ(r + Hδ)/σ²

so every per-iteration solve is 18×18 and the per-point work collapses to two
MXU contractions (J6ᵀJ6 and J6ᵀr over the padded match rows).  The iteration
runs as one `lax.while_loop` with the reference's convergence (‖Δ‖ ≤ 1e-2),
divergence (NaN or 10× residual-norm growth), and final Joseph-form covariance
update (StateEstimator.hpp:552-598), all inside a single compiled region.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3
from lins_tpu.imu import eskf
from lins_tpu.odometry import association as assoc


class IESKFResult(NamedTuple):
    state: eskf.FilterState   # updated filter state (post covariance update)
    diverged: jnp.ndarray     # bool — caller should run the GN fallback
    iters: jnp.ndarray        # iterations executed
    n_surf: jnp.ndarray       # matched surf rows (last iteration)
    n_corner: jnp.ndarray     # matched corner rows (last iteration)
    residual_norm: jnp.ndarray


def _embed6(J66, dtype):
    """Embed a 6x6 [att,pos] block into the 18x18 error-state layout."""
    H = jnp.zeros((eskf.DIM, eskf.DIM), dtype)
    H = H.at[eskf.ATT, eskf.ATT].set(J66[0:3, 0:3])
    H = H.at[eskf.ATT, eskf.POS].set(J66[0:3, 3:6])
    H = H.at[eskf.POS, eskf.ATT].set(J66[3:6, 0:3])
    H = H.at[eskf.POS, eskf.POS].set(J66[3:6, 3:6])
    return H


def _embed6v(v6, dtype):
    v = jnp.zeros((eskf.DIM,), dtype)
    v = v.at[eskf.ATT].set(v6[0:3])
    v = v.at[eskf.POS].set(v6[3:6])
    return v


def _spd_inverse(A, jitter_scale):
    """Cholesky inverse with relative jitter (P can be near-singular right
    after the robocentric reset when init stds are zero)."""
    n = A.shape[0]
    jitter = jitter_scale * (jnp.trace(A) / n) + 1e-16
    A_j = A + jitter * jnp.eye(n, dtype=A.dtype)
    cho = jax.scipy.linalg.cho_factor(A_j)
    return jax.scipy.linalg.cho_solve(cho, jnp.eye(n, dtype=A.dtype))


def _measurement_blocks(m: assoc.Matches, lin_rn, lin_qbn, cfg, dtype):
    """Compressed normal-equation blocks from stacked matches.

    Rows: H_att = coeffᵀ(−R·skew(p))·Rinvleft(−φ), H_pos = coeffᵀ
    (StateEstimator.hpp:515-532).  Returns (JtJ (6,6), Jtr (6,), res_norm).
    """
    axis = so3.log_quat(lin_qbn)
    R = so3.quat_to_mat(lin_qbn)
    Rinv = so3.rinv_left(-axis)

    pt = m.point.astype(dtype)
    coeff = jnp.where(m.valid[:, None], m.coeff, 0.0).astype(dtype)
    res = jnp.where(m.valid, cfg.lidar_scale * m.resid, 0.0).astype(dtype)

    RS = -jnp.einsum("ij,njk->nik", R, so3.skew(pt))        # (M,3,3)
    RSJ = jnp.einsum("nik,kj->nij", RS, Rinv)               # (M,3,3)
    H_att = jnp.einsum("ni,nij->nj", coeff, RSJ)            # (M,3)
    J6 = jnp.concatenate([H_att, coeff], axis=-1)           # (M,6)

    JtJ = J6.T @ J6
    Jtr = J6.T @ res
    res_norm = jnp.sqrt(jnp.sum(res * res))
    return JtJ, Jtr, res_norm


def _blocks_xla(new_flat, new_sharp, last_surf, last_corner, lin, it,
                cfg, dtype):
    """Association + normal-equation blocks on the XLA path (default)."""
    surf = assoc.find_surf_matches(
        new_flat.xyz.astype(dtype), new_flat.rel_time.astype(dtype),
        new_flat.valid, last_surf["xyz"].astype(dtype), last_surf["ring"],
        last_surf["valid"], lin.rn, lin.qbn, it, cfg)
    corn = assoc.find_corner_matches(
        new_sharp.xyz.astype(dtype), new_sharp.rel_time.astype(dtype),
        new_sharp.valid, last_corner["xyz"].astype(dtype),
        last_corner["ring"], last_corner["valid"], lin.rn, lin.qbn, it, cfg)
    m = assoc.stack_matches(surf, corn)
    JtJ, Jtr, res_norm = _measurement_blocks(m, lin.rn, lin.qbn, cfg, dtype)
    return (JtJ, Jtr, res_norm,
            jnp.sum(surf.valid).astype(jnp.int32),
            jnp.sum(corn.valid).astype(jnp.int32))


# The fused Mosaic association kernels (_blocks_pallas) were sunset
# 2026-08-21: their scoped-VMEM stack is 43.2 MB at even a 128x256 toy
# shape vs the 16 MB Mosaic limit — shape-independent, measured by
# tools/r5_assoc_canary.py — so the kernel class as written cannot execute
# on this toolchain.  The code lives in attic/pallas_assoc.py; the XLA
# masked-argmin path below is the production (and only) implementation.


def update(filter_state: eskf.FilterState,
           new_flat, new_sharp, last_surf, last_corner,
           cfg: SlamConfig) -> IESKFResult:
    """Run the iterated update against the previous scan's feature sets.

    new_flat/new_sharp: FeatureClouds of the current scan (query sets).
    last_surf/last_corner: dicts with xyz (R,3), ring (R,), valid (R,) — the
    previous scan's less-flat / less-sharp sets in its end frame.
    """
    dtype = filter_state.rn.dtype
    Pk = filter_state.P
    sigma2 = jnp.asarray(cfg.lidar_std ** 2, dtype)
    jit_scale = 1e-9 if dtype == jnp.float64 else 1e-6
    P_inv = _spd_inverse(Pk, jit_scale)

    nominal0 = filter_state
    blocks = _blocks_xla

    def one_iter(carry):
        lin, it, res_prev, HtH_s, A_inv, conv, div, ns, nc, rn_out = carry

        JtJ, Jtr, res_norm, ns_new, nc_new = blocks(
            new_flat, new_sharp, last_surf, last_corner, lin, it, cfg, dtype)
        HtH_s_new = _embed6(JtJ, dtype) / sigma2
        Htr_s = _embed6v(Jtr, dtype) / sigma2

        A = P_inv + HtH_s_new
        A_inv_new = _spd_inverse(A, jit_scale * 1e-3)

        delta = eskf.box_minus(nominal0, lin)
        upd = -(A_inv_new @ (Htr_s + HtH_s_new @ delta)) + delta

        has_nan = jnp.any(jnp.isnan(upd))
        div_new = has_nan | (res_norm > res_prev * 10.0)
        upd = jnp.nan_to_num(upd)

        lin_new = eskf.box_plus(lin, upd)
        # on divergence the reference breaks *before* applying the update
        lin_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(div_new, a, b), lin, lin_new)
        conv_new = jnp.linalg.norm(upd) <= 1e-2

        keep = div_new  # diverged iteration: keep previous blocks
        HtH_s = jnp.where(keep, HtH_s, HtH_s_new)
        A_inv = jnp.where(keep, A_inv, A_inv_new)
        res_out = jnp.where(keep, res_prev, res_norm)
        return (lin_new, it + 1, res_out, HtH_s, A_inv,
                conv_new & ~div_new, div | div_new,
                ns_new, nc_new, res_norm)

    def cond(carry):
        _, it, _, _, _, conv, div, _, _, _ = carry
        return (it < cfg.num_iter) & ~conv & ~div

    init = (nominal0, jnp.int32(0), jnp.asarray(1e6, dtype),
            jnp.zeros((eskf.DIM, eskf.DIM), dtype),
            jnp.zeros((eskf.DIM, eskf.DIM), dtype),
            jnp.asarray(False), jnp.asarray(False),
            jnp.int32(0), jnp.int32(0), jnp.asarray(0.0, dtype))
    (lin, iters, _, HtH_s, A_inv, conv, div, ns, nc, res_norm) = (
        jax.lax.while_loop(cond, one_iter, init))

    # Joseph-form covariance update once at the end (StateEstimator.hpp:595-598)
    KH = A_inv @ HtH_s
    IKH = jnp.eye(eskf.DIM, dtype=dtype) - KH
    KRK = A_inv @ HtH_s @ A_inv.T
    P_new = IKH @ Pk @ IKH.T + KRK
    P_new = 0.5 * (P_new + P_new.T)

    updated = lin._replace(P=P_new, time=filter_state.time,
                           acc_last=filter_state.acc_last,
                           gyr_last=filter_state.gyr_last)
    # diverged: caller substitutes the GN fallback pose; keep Pk unchanged
    out_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(div, a, b),
        filter_state, updated)
    return IESKFResult(state=out_state, diverged=div, iters=iters,
                       n_surf=ns, n_corner=nc, residual_norm=res_norm)
