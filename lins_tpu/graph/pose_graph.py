"""SE(3) pose-graph optimization, gtsam-free (reference C22,
lidar_mapping_node.cpp:1654-1795 — PriorFactor/BetweenFactor/iSAM2).

TPU-native design: the incremental iSAM2 solver is replaced by a batched
Gauss-Newton re-solve over the whole graph (LINS-scale graphs are <= a few
thousand nodes, and loop closures are rare).  Per GN iteration:

  * per-edge 6-dim residuals  r = [log(q_m⁻¹ q_i⁻¹ q_j), R_iᵀ(p_j-p_i) - t_m]
  * per-edge 6x12 Jacobians via vmapped forward-mode autodiff (exact, no
    hand-derived BCH approximations)
  * scatter-add of the four 6x6 blocks into the dense (6K, 6K) normal matrix
  * one Cholesky solve; boxplus update

A node-0 prior pins the gauge (reference :1684-1692).  Edges and nodes live
in fixed-capacity masked arrays.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.geom import so3


class EdgeSet(NamedTuple):
    """Fixed-capacity between-factor set (odometry + loop edges)."""

    i: jnp.ndarray        # (E,) int32 source node
    j: jnp.ndarray        # (E,) int32 target node
    t: jnp.ndarray        # (E,3) measured translation (in i's frame)
    q: jnp.ndarray        # (E,4) measured rotation i->j (wxyz)
    w_rot: jnp.ndarray    # (E,) rotation information weight (1/sigma^2)
    w_pos: jnp.ndarray    # (E,) translation information weight
    valid: jnp.ndarray    # (E,)
    count: jnp.ndarray    # scalar int32


def empty_edges(cap: int, dtype=jnp.float32) -> EdgeSet:
    return EdgeSet(
        i=jnp.zeros(cap, jnp.int32), j=jnp.zeros(cap, jnp.int32),
        t=jnp.zeros((cap, 3), dtype),
        q=jnp.zeros((cap, 4), dtype).at[:, 0].set(1.0),
        w_rot=jnp.zeros(cap, dtype), w_pos=jnp.zeros(cap, dtype),
        valid=jnp.zeros(cap, bool), count=jnp.int32(0))


def add_edge(e: EdgeSet, i, j, t, q, w_rot, w_pos) -> EdgeSet:
    """Append an edge at ring slot count % E.  With ring keyframe eviction
    (mapping/keyframes.py) old edges reference evicted nodes and are masked
    out by live_view, so overwriting the oldest edge is the matching
    retirement policy (a still-live loop edge could in principle be
    overwritten after E more edges — at E = max_keyframes + 128 that means
    the loop partner is itself about to evict)."""
    k = (e.count % e.i.shape[0]).astype(jnp.int32)
    return e._replace(
        i=e.i.at[k].set(jnp.asarray(i, jnp.int32)),
        j=e.j.at[k].set(jnp.asarray(j, jnp.int32)),
        t=e.t.at[k].set(t.astype(e.t.dtype)),
        q=e.q.at[k].set(q.astype(e.q.dtype)),
        w_rot=e.w_rot.at[k].set(w_rot), w_pos=e.w_pos.at[k].set(w_pos),
        valid=e.valid.at[k].set(True), count=e.count + 1)


def live_view(edges: EdgeSet, count, K: int) -> EdgeSet:
    """Translate ABSOLUTE keyframe-id endpoints into ring slots of a
    K-capacity keyframe store, retiring edges with an evicted endpoint
    (id < count - K) — the static-shape equivalent of dropping factors on
    marginalized nodes."""
    oldest = jnp.maximum(count - K, 0)
    ok = (edges.valid & (edges.i >= oldest) & (edges.j >= oldest)
          & (edges.i < count) & (edges.j < count))
    return edges._replace(i=(edges.i % K).astype(jnp.int32),
                          j=(edges.j % K).astype(jnp.int32), valid=ok)


def relative_pose(p_i, q_i, p_j, q_j):
    """(t, q) of node j expressed in node i's frame."""
    q_rel = so3.quat_normalize(so3.quat_mul(so3.quat_inv(q_i), q_j))
    t_rel = so3.quat_rotate_inv(q_i, p_j - p_i)
    return t_rel, q_rel


def _edge_residual(xi_i, xi_j, p_i, q_i, p_j, q_j, t_m, q_m):
    """6-dim residual at tangent perturbations (xi = [dtheta(3), dp(3)])."""
    qi = so3.quat_mul(q_i, so3.exp_axis(xi_i[0:3]))
    qj = so3.quat_mul(q_j, so3.exp_axis(xi_j[0:3]))
    pi = p_i + xi_i[3:6]
    pj = p_j + xi_j[3:6]
    r_rot = so3.log_quat(so3.quat_mul(so3.quat_inv(q_m),
                                      so3.quat_mul(so3.quat_inv(qi), qj)))
    r_pos = so3.quat_rotate_inv(qi, pj - pi) - t_m
    return jnp.concatenate([r_rot, r_pos])


def _edge_blocks(p_i, q_i, p_j, q_j, t_m, q_m, w_rot, w_pos):
    """Residual + exact Jacobians d r / d (xi_i, xi_j) via autodiff."""
    z = jnp.zeros(6, p_i.dtype)
    r = _edge_residual(z, z, p_i, q_i, p_j, q_j, t_m, q_m)
    Ji = jax.jacfwd(_edge_residual, argnums=0)(z, z, p_i, q_i, p_j, q_j,
                                               t_m, q_m)
    Jj = jax.jacfwd(_edge_residual, argnums=1)(z, z, p_i, q_i, p_j, q_j,
                                               t_m, q_m)
    w = jnp.concatenate([jnp.full(3, w_rot), jnp.full(3, w_pos)])
    return r, Ji, Jj, w


def _active_mask(active, K):
    """Accept either a node count (legacy) or a (K,) bool live mask."""
    active = jnp.asarray(active)
    if active.ndim == 0:
        return jnp.arange(K) < active
    return active


def _robust_scale(r, w, edges: EdgeSet, huber_delta: float, K: int):
    """Per-edge IRLS Huber weight on LOOP edges (odometry between-factors
    are always consecutive ids, mapper._mapping_step_impl; modulo-K
    adjacency so ring-slot endpoints from live_view — where the wrap edge
    is (K-1, 0) — classify correctly).  r (E,6) residuals, w (E,6)
    information weights; returns (E,) scales in (0, 1] —
    min(1, delta/||r||_W), the standard Huber IRLS factor."""
    if huber_delta <= 0.0:
        return jnp.ones(r.shape[0], r.dtype)
    rnorm = jnp.sqrt(jnp.maximum(jnp.sum(w * r * r, axis=1), 1e-30))
    is_loop = ((edges.j - edges.i) % K) != 1
    scale = jnp.minimum(1.0, huber_delta / rnorm)
    return jnp.where(is_loop, scale, 1.0).astype(r.dtype)


@partial(jax.jit, static_argnames=("iters", "huber_delta"))
def optimize(pos, quat, active, edges: EdgeSet, iters: int = 8,
             prior_w: float = 1e6, damping: float = 1e-6,
             prior_slot=0, huber_delta: float = 0.0):
    """Batched GN over the pose graph.  pos (K,3), quat (K,4); `active` is
    a node count or a (K,) live mask (ring stores); `prior_slot` carries the
    gauge prior (the oldest live node once node 0 has been evicted).
    huber_delta > 0 enables the IRLS Huber loss on loop edges
    (_robust_scale).  Returns (pos, quat)."""
    K = pos.shape[0]
    active = _active_mask(active, K)

    def gn_iter(_, state):
        pos, quat = state
        H, g = build_normal_system(pos, quat, edges, huber_delta)
        dx = solve_and_clamp(H, g, active, prior_w, damping, prior_slot)
        # failed solve (non-finite dx, e.g. a numerically indefinite system)
        # degrades to a no-op iteration instead of poisoning every pose —
        # the NaN-scrub analogue of the reference's guard
        # (lidar_mapping_node.cpp:738-750); callers additionally reject
        # whole-solve failures (mapping/mapper._loop_step_impl)
        good = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(good, dx, 0.0)
        quat_new = so3.quat_normalize(
            so3.quat_mul(quat, so3.exp_axis(dx[:, 0:3])))
        pos_new = pos + dx[:, 3:6]
        return pos_new, quat_new

    return jax.lax.fori_loop(0, iters, gn_iter, (pos, quat))


def build_normal_system(pos, quat, edges: EdgeSet, huber_delta: float = 0.0):
    """Dense block normal equations (H (K,6,K,6), g (K,6)) from an edge set.

    Pure edge-parallel reduction — the distributed solver shards edges over
    devices, runs this per shard, and psum-reduces the outputs.
    huber_delta > 0 IRLS-downweights loop edges (_robust_scale)."""
    K = pos.shape[0]
    dtype = pos.dtype
    p_i, q_i = pos[edges.i], quat[edges.i]
    p_j, q_j = pos[edges.j], quat[edges.j]

    r, Ji, Jj, w = jax.vmap(_edge_blocks)(
        p_i, q_i, p_j, q_j, edges.t, edges.q, edges.w_rot, edges.w_pos)
    w = w * _robust_scale(r, w, edges, huber_delta, K)[:, None]
    ok = edges.valid[:, None]
    rw = jnp.where(edges.valid[:, None], r * w, 0.0)
    Jiw = jnp.where(ok[..., None], Ji * w[:, :, None], 0.0)
    Jjw = jnp.where(ok[..., None], Jj * w[:, :, None], 0.0)
    Ji_m = jnp.where(ok[..., None], Ji, 0.0)
    Jj_m = jnp.where(ok[..., None], Jj, 0.0)

    # precision=HIGHEST: TPU f32 einsums default to bf16 MXU passes; the
    # ~0.4%-relative block errors they inject make the (ill-conditioned at
    # hundreds of chain nodes) normal matrix indefinite, and the Cholesky
    # then emits NaN — the round-4 bigloop 322-keyframe loop-closure solve
    # NaN'd exactly this way while true-f32 CPU runs of the identical graph
    # converged (same pathology class as the round-3 distance-matmul bug).
    hp = jax.lax.Precision.HIGHEST
    Hii = jnp.einsum("eri,erj->eij", Jiw, Ji_m, precision=hp)
    Hij = jnp.einsum("eri,erj->eij", Jiw, Jj_m, precision=hp)
    Hji = jnp.einsum("eri,erj->eij", Jjw, Ji_m, precision=hp)
    Hjj = jnp.einsum("eri,erj->eij", Jjw, Jj_m, precision=hp)
    gi = jnp.einsum("eri,er->ei", Ji_m, rw, precision=hp)
    gj = jnp.einsum("eri,er->ei", Jj_m, rw, precision=hp)

    H = jnp.zeros((K, 6, K, 6), dtype)
    H = H.at[edges.i, :, edges.i, :].add(Hii)
    H = H.at[edges.i, :, edges.j, :].add(Hij)
    H = H.at[edges.j, :, edges.i, :].add(Hji)
    H = H.at[edges.j, :, edges.j, :].add(Hjj)
    g = jnp.zeros((K, 6), dtype)
    g = g.at[edges.i].add(gi)
    g = g.at[edges.j].add(gj)
    return H, g


def solve_and_clamp(H, g, active, prior_w, damping, prior_slot=0):
    """Add gauge prior/damping, Cholesky-solve, zero inactive updates."""
    K = g.shape[0]
    dtype = g.dtype
    node_ids = jnp.arange(K)
    diag_w = jnp.where(node_ids == prior_slot, prior_w,
                       jnp.where(active, damping, prior_w))
    Hd = H.reshape(6 * K, 6 * K) + jnp.diag(
        jnp.repeat(diag_w, 6).astype(dtype))
    # true-f32 blocked Cholesky: the trailing-matrix-update matmuls inside
    # XLA's factorization otherwise run bf16 on TPU (see build_normal_system)
    with jax.default_matmul_precision("highest"):
        dx = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hd), g.reshape(-1)).reshape(K, 6)
    return jnp.where(active[:, None], dx, 0.0)


# --- sparse (matrix-free) solve -------------------------------------------
# The dense (6K)^2 Cholesky above walls out at a few thousand keyframes
# (K=4096 would need a 2.4 GB normal matrix).  Pose graphs are chain+loop
# sparse: H has one 6x6 block per node pair that shares an edge.  The
# TPU-native sparse solve is matrix-free preconditioned CG: the Hv product
# is a per-edge batched (6x6)@(6,) contraction plus a segment scatter-add —
# pure data-parallel work that shards over devices with one psum per CG
# iteration (parallel/dist_graph.make_sharded_cg_optimizer).  (A pose graph
# has no landmark block to Schur-eliminate — gtsam's iSAM2 factors the same
# reduced system; CG with a block-Jacobi preconditioner is its batch
# equivalent at scale.)


def _edge_system(pos, quat, edges: EdgeSet, huber_delta: float = 0.0):
    """Per-edge residuals/Jacobians + weights, masked. (E,6),(E,6,6)x2,(E,6).
    huber_delta > 0 IRLS-downweights loop edges (_robust_scale)."""
    p_i, q_i = pos[edges.i], quat[edges.i]
    p_j, q_j = pos[edges.j], quat[edges.j]
    r, Ji, Jj, w = jax.vmap(_edge_blocks)(
        p_i, q_i, p_j, q_j, edges.t, edges.q, edges.w_rot, edges.w_pos)
    w = w * _robust_scale(r, w, edges, huber_delta, pos.shape[0])[:, None]
    ok = edges.valid
    r = jnp.where(ok[:, None], r, 0.0)
    Ji = jnp.where(ok[:, None, None], Ji, 0.0)
    Jj = jnp.where(ok[:, None, None], Jj, 0.0)
    w = jnp.where(ok[:, None], w, 0.0)
    return r, Ji, Jj, w


def _gradient_and_diag(r, Ji, Jj, w, i, j, K):
    """g = J^T W r (K,6) and the block-diagonal of H (K,6,6)."""
    hp = jax.lax.Precision.HIGHEST
    gi = jnp.einsum("eri,er->ei", Ji, w * r, precision=hp)
    gj = jnp.einsum("eri,er->ei", Jj, w * r, precision=hp)
    g = jnp.zeros((K, 6), r.dtype).at[i].add(gi).at[j].add(gj)
    Dii = jnp.einsum("eri,er,erj->eij", Ji, w, Ji, precision=hp)
    Djj = jnp.einsum("eri,er,erj->eij", Jj, w, Jj, precision=hp)
    D = jnp.zeros((K, 6, 6), r.dtype).at[i].add(Dii).at[j].add(Djj)
    return g, D


def _hv(v, Ji, Jj, w, i, j, diag_w, K):
    """Matrix-free (H + diag) @ v, v (K,6)."""
    hp = jax.lax.Precision.HIGHEST
    re = (jnp.einsum("erc,ec->er", Ji, v[i], precision=hp)
          + jnp.einsum("erc,ec->er", Jj, v[j], precision=hp))
    re = w * re
    out = jnp.zeros((K, 6), v.dtype)
    out = out.at[i].add(jnp.einsum("erc,er->ec", Ji, re, precision=hp))
    out = out.at[j].add(jnp.einsum("erc,er->ec", Jj, re, precision=hp))
    return out + diag_w[:, None] * v


def _pcg(matvec, Minv, b, iters: int):
    """Standard preconditioned CG on SPD systems, fixed iteration count
    (static for jit; pose-graph systems at LINS scale converge in far
    fewer — the final GN residual check is the safety net)."""
    x = jnp.zeros_like(b)
    r = b
    z = Minv(r)
    p = z
    rz = jnp.sum(r * z)

    def body(_, carry):
        x, r, p, rz = carry
        hp = matvec(p)
        denom = jnp.sum(p * hp)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * hp
        z = Minv(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


@partial(jax.jit, static_argnames=("iters", "cg_iters", "huber_delta"))
def optimize_cg(pos, quat, active, edges: EdgeSet, iters: int = 8,
                cg_iters: int = 64, prior_w: float = 1e6,
                damping: float = 1e-3, prior_slot=0,
                huber_delta: float = 0.0):
    """Sparse pose-graph GN: same problem as `optimize`, solved matrix-free
    with block-Jacobi-preconditioned CG — O(E) memory instead of O((6K)^2),
    handles K=4096+ where the dense path cannot allocate."""
    K = pos.shape[0]
    dtype = pos.dtype
    active = _active_mask(active, K)
    node_ids = jnp.arange(K)
    diag_w = jnp.where(node_ids == prior_slot, prior_w,
                       jnp.where(active, damping, prior_w)).astype(dtype)

    def gn_iter(_, state):
        pos, quat = state
        r, Ji, Jj, w = _edge_system(pos, quat, edges, huber_delta)
        g, D = _gradient_and_diag(r, Ji, Jj, w, edges.i, edges.j, K)
        D = D + jnp.eye(6, dtype=dtype)[None] * diag_w[:, None, None]
        Dinv = jnp.linalg.inv(D)            # batched 6x6 (block Jacobi)

        def Minv(v):
            return jnp.einsum("kij,kj->ki", Dinv, v,
                              precision=jax.lax.Precision.HIGHEST)

        def matvec(v):
            return _hv(v, Ji, Jj, w, edges.i, edges.j, diag_w, K)

        dx = -_pcg(matvec, Minv, g, cg_iters)
        dx = jnp.where(active[:, None], dx, 0.0)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)  # cf. optimize
        quat_new = so3.quat_normalize(
            so3.quat_mul(quat, so3.exp_axis(dx[:, 0:3])))
        return pos + dx[:, 3:6], quat_new

    return jax.lax.fori_loop(0, iters, gn_iter, (pos, quat))


def graph_cost(pos, quat, edges: EdgeSet):
    """Weighted SSE of all edge residuals (for tests/telemetry)."""
    p_i, q_i = pos[edges.i], quat[edges.i]
    p_j, q_j = pos[edges.j], quat[edges.j]
    z = jnp.zeros(6, pos.dtype)
    r = jax.vmap(lambda a, b, c, d, e, f: _edge_residual(z, z, a, b, c, d,
                                                         e, f))(
        p_i, q_i, p_j, q_j, edges.t, edges.q)
    w = jnp.concatenate([
        jnp.broadcast_to(edges.w_rot[:, None], (r.shape[0], 3)),
        jnp.broadcast_to(edges.w_pos[:, None], (r.shape[0], 3))], axis=1)
    return jnp.sum(jnp.where(edges.valid[:, None], w * r * r, 0.0))
