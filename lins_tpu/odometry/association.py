"""Scan-to-scan feature correspondence + residual/Jacobian construction
(reference C13, StateEstimator.hpp:829-1063).

TPU-native redesign: the FLANN KD-tree 1-NN plus ring-constrained support
search is replaced by an exact masked-argmin over an MXU-computed distance
matrix — (Q,R) pairwise distances via |a|²+|b|²-2abᵀ, then ring-mask argmins
for the support points.  This is *exact* nearest neighbor (the KD-tree is
exact too), with the reference's ring constraints expressed as masks:

  surf   : tripod1 = global NN;  tripod2 = NN on the same ring;
           tripod3 = NN on a different ring within ±2 rings
  corner : tripod1 = global NN;  tripod2 = NN on a different ring within ±2

All support distances gate at nearest_feature_search_sq_dist (= 25 m²,
exp_port.yaml:14).  Residuals, analytic direction vectors, and the distance
weight `s` follow StateEstimator.hpp:917-950 / :1031-1060 exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.geom import so3


class Matches(NamedTuple):
    """Per-query stacked measurement rows (padded, masked)."""

    point: jnp.ndarray   # (Q,3) original (untransformed) new-scan point
    coeff: jnp.ndarray   # (Q,3) s * residual direction
    resid: jnp.ndarray   # (Q,)  s * point-to-feature distance
    valid: jnp.ndarray   # (Q,)  bool


def transform_to_start(pts, rel_time, rn, qbn):
    """Per-point constant-velocity de-skew into the scan start frame
    (transformToStart, StateEstimator.hpp:1066-1080)."""
    phi = so3.log_quat(qbn)
    q_s = so3.exp_axis(rel_time[:, None] * phi[None, :])
    return so3.quat_rotate(q_s, pts) + rel_time[:, None] * rn[None, :]


def transform_to_end(pts, rel_time, rn, qbn):
    """De-skew into the scan end frame (transformToEnd,
    StateEstimator.hpp:1083-1101)."""
    p1 = transform_to_start(pts, rel_time, rn, qbn)
    return so3.quat_rotate_inv(qbn[None, :], p1 - rn[None, :])


def _pairwise_sq_dist(a, b):
    """(Q,3),(R,3) -> (Q,R) squared distances via one MXU contraction.

    precision=HIGHEST is load-bearing: TPU f32 matmuls default to bf16
    passes, and with |p|^2 ~ 10^3 m^2 the bf16 relative error puts multiple
    m^2 of noise on d^2 — enough to pick wrong nearest neighbors (measured
    up to 2.3 m^2 at map scales).  HIGHEST runs the 6-pass bf16 expansion,
    restoring ~f32 accuracy at trivial cost for 3-deep contractions."""
    aa = jnp.sum(a * a, axis=-1, keepdims=True)
    bb = jnp.sum(b * b, axis=-1)
    ab = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(aa + bb[None, :] - 2.0 * ab, 0.0)


def _masked_argmin(d, mask):
    d_m = jnp.where(mask, d, jnp.inf)
    idx = jnp.argmin(d_m, axis=-1)
    val = jnp.take_along_axis(d_m, idx[:, None], axis=-1)[:, 0]
    return idx, val


def find_surf_matches(q_pts, q_rel, q_valid, r_pts, r_ring, r_valid,
                      rn, qbn, iter_count, cfg) -> Matches:
    """Point-to-plane matches of new flat features against last less-flat set
    (findCorrespondingSurfFeatures, StateEstimator.hpp:829-953)."""
    max_d2 = cfg.nearest_feature_search_sq_dist
    p_start = transform_to_start(q_pts, q_rel, rn, qbn)

    d2 = _pairwise_sq_dist(p_start, r_pts)
    i1, d1 = _masked_argmin(d2, r_valid[None, :])
    ring1 = r_ring[i1]
    near = d1 < max_d2

    same_ring = (r_ring[None, :] == ring1[:, None]) & r_valid[None, :]
    cols = jnp.arange(r_pts.shape[0])
    same_ring = same_ring & (cols[None, :] != i1[:, None])
    i2, d2_min = _masked_argmin(d2, same_ring)

    other_ring = ((r_ring[None, :] != ring1[:, None])
                  & (jnp.abs(r_ring[None, :] - ring1[:, None]) <= 2)
                  & r_valid[None, :])
    i3, d3_min = _masked_argmin(d2, other_ring)

    matched = q_valid & near & (d2_min < max_d2) & (d3_min < max_d2)

    P0, P1, P2, P3 = p_start, r_pts[i1], r_pts[i2], r_pts[i3]
    M = jnp.cross(P1 - P2, P1 - P3)
    m = jnp.linalg.norm(M, axis=-1)
    m_safe = jnp.maximum(m, 1e-12)
    res = jnp.sum((P0 - P1) * M, axis=-1) / m_safe
    jac = M / m_safe[:, None]

    w = 1.0 - 1.8 * jnp.abs(res) / jnp.sqrt(
        jnp.sqrt(jnp.maximum(jnp.linalg.norm(P0, axis=-1), 1e-12)))
    s = jnp.where(iter_count >= cfg.icp_freq, w, 1.0)

    ok = matched & (s > 0.1) & (res != 0.0) & (m > 1e-12)
    return Matches(point=q_pts, coeff=s[:, None] * jac, resid=s * res, valid=ok)


def find_corner_matches(q_pts, q_rel, q_valid, r_pts, r_ring, r_valid,
                        rn, qbn, iter_count, cfg) -> Matches:
    """Point-to-line matches of new sharp features against last less-sharp set
    (findCorrespondingCornerFeatures, StateEstimator.hpp:955-1063)."""
    max_d2 = cfg.nearest_feature_search_sq_dist
    p_start = transform_to_start(q_pts, q_rel, rn, qbn)

    d2 = _pairwise_sq_dist(p_start, r_pts)
    i1, d1 = _masked_argmin(d2, r_valid[None, :])
    ring1 = r_ring[i1]
    near = d1 < max_d2

    other_ring = ((r_ring[None, :] != ring1[:, None])
                  & (jnp.abs(r_ring[None, :] - ring1[:, None]) <= 2)
                  & r_valid[None, :])
    i2, d2_min = _masked_argmin(d2, other_ring)

    matched = q_valid & near & (d2_min < max_d2)

    P0, P1, P2 = p_start, r_pts[i1], r_pts[i2]
    Pc = jnp.cross(P0 - P1, P0 - P2)
    r = jnp.linalg.norm(Pc, axis=-1)
    d12 = jnp.linalg.norm(P1 - P2, axis=-1)
    denom = jnp.maximum(d12 * r, 1e-12)
    res = r / jnp.maximum(d12, 1e-12)
    # jac = Pᵀ [P2-P1]x / (d12 r)   (StateEstimator.hpp:1044-1045)
    jac = jnp.einsum("ni,nij->nj", Pc, so3.skew(P2 - P1)) / denom[:, None]

    w = 1.0 - 1.8 * jnp.abs(res)
    s = jnp.where(iter_count >= cfg.icp_freq, w, 1.0)

    ok = matched & (s > 0.1) & (res != 0.0) & (r > 1e-12)
    return Matches(point=q_pts, coeff=s[:, None] * jac, resid=s * res, valid=ok)


def stack_matches(surf: Matches, corner: Matches) -> Matches:
    return Matches(
        point=jnp.concatenate([surf.point, corner.point]),
        coeff=jnp.concatenate([surf.coeff, corner.coeff]),
        resid=jnp.concatenate([surf.resid, corner.resid]),
        valid=jnp.concatenate([surf.valid, corner.valid]))
