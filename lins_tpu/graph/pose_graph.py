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
    k = jnp.minimum(e.count, e.i.shape[0] - 1).astype(jnp.int32)
    return e._replace(
        i=e.i.at[k].set(jnp.asarray(i, jnp.int32)),
        j=e.j.at[k].set(jnp.asarray(j, jnp.int32)),
        t=e.t.at[k].set(t.astype(e.t.dtype)),
        q=e.q.at[k].set(q.astype(e.q.dtype)),
        w_rot=e.w_rot.at[k].set(w_rot), w_pos=e.w_pos.at[k].set(w_pos),
        valid=e.valid.at[k].set(True), count=e.count + 1)


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


@partial(jax.jit, static_argnames=("iters",))
def optimize(pos, quat, n_nodes, edges: EdgeSet, iters: int = 8,
             prior_w: float = 1e6, damping: float = 1e-6):
    """Batched GN over the pose graph.  pos (K,3), quat (K,4); nodes beyond
    n_nodes are inactive.  Returns (pos, quat)."""
    K = pos.shape[0]
    dtype = pos.dtype
    node_ids = jnp.arange(K)
    active = node_ids < n_nodes

    def gn_iter(_, state):
        pos, quat = state
        H, g = build_normal_system(pos, quat, edges)
        dx = solve_and_clamp(H, g, active, prior_w, damping)
        quat_new = so3.quat_normalize(
            so3.quat_mul(quat, so3.exp_axis(dx[:, 0:3])))
        pos_new = pos + dx[:, 3:6]
        return pos_new, quat_new

    return jax.lax.fori_loop(0, iters, gn_iter, (pos, quat))


def build_normal_system(pos, quat, edges: EdgeSet):
    """Dense block normal equations (H (K,6,K,6), g (K,6)) from an edge set.

    Pure edge-parallel reduction — the distributed solver shards edges over
    devices, runs this per shard, and psum-reduces the outputs."""
    K = pos.shape[0]
    dtype = pos.dtype
    p_i, q_i = pos[edges.i], quat[edges.i]
    p_j, q_j = pos[edges.j], quat[edges.j]

    r, Ji, Jj, w = jax.vmap(_edge_blocks)(
        p_i, q_i, p_j, q_j, edges.t, edges.q, edges.w_rot, edges.w_pos)
    ok = edges.valid[:, None]
    rw = jnp.where(edges.valid[:, None], r * w, 0.0)
    Jiw = jnp.where(ok[..., None], Ji * w[:, :, None], 0.0)
    Jjw = jnp.where(ok[..., None], Jj * w[:, :, None], 0.0)
    Ji_m = jnp.where(ok[..., None], Ji, 0.0)
    Jj_m = jnp.where(ok[..., None], Jj, 0.0)

    Hii = jnp.einsum("eri,erj->eij", Jiw, Ji_m)
    Hij = jnp.einsum("eri,erj->eij", Jiw, Jj_m)
    Hji = jnp.einsum("eri,erj->eij", Jjw, Ji_m)
    Hjj = jnp.einsum("eri,erj->eij", Jjw, Jj_m)
    gi = jnp.einsum("eri,er->ei", Ji_m, rw)
    gj = jnp.einsum("eri,er->ei", Jj_m, rw)

    H = jnp.zeros((K, 6, K, 6), dtype)
    H = H.at[edges.i, :, edges.i, :].add(Hii)
    H = H.at[edges.i, :, edges.j, :].add(Hij)
    H = H.at[edges.j, :, edges.i, :].add(Hji)
    H = H.at[edges.j, :, edges.j, :].add(Hjj)
    g = jnp.zeros((K, 6), dtype)
    g = g.at[edges.i].add(gi)
    g = g.at[edges.j].add(gj)
    return H, g


def solve_and_clamp(H, g, active, prior_w, damping):
    """Add gauge prior/damping, Cholesky-solve, zero inactive updates."""
    K = g.shape[0]
    dtype = g.dtype
    node_ids = jnp.arange(K)
    diag_w = jnp.where(node_ids == 0, prior_w,
                       jnp.where(active, damping, prior_w))
    Hd = H.reshape(6 * K, 6 * K) + jnp.diag(
        jnp.repeat(diag_w, 6).astype(dtype))
    dx = -jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(Hd), g.reshape(-1)).reshape(K, 6)
    return jnp.where(active[:, None], dx, 0.0)


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
