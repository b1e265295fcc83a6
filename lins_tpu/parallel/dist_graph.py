"""Distributed pose-graph optimization over a device mesh (SURVEY.md §2 P3).

The reference's backend is a single-process gtsam solve; the TPU build
shards the *edge set* across devices with `shard_map`: every device builds
the normal-equation contribution of its edge shard (pure MXU work), the
contributions are reduced with a single `psum` over the mesh axis, and the
(replicated) 6K x 6K solve runs on every device.  This is the reduction
skeleton the Schur-complement BA uses at scale; communication is one
all-reduce of (6K)² + 6K floats per GN iteration, riding ICI inside a slice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from lins_tpu.geom import so3
from lins_tpu.graph import pose_graph as pg


def pad_edges(edges: pg.EdgeSet, n_devices: int) -> pg.EdgeSet:
    """Pad the edge arrays so the capacity divides the mesh size."""
    E = edges.i.shape[0]
    E_pad = ((E + n_devices - 1) // n_devices) * n_devices
    if E_pad == E:
        return edges
    pad = E_pad - E

    def padf(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])

    return pg.EdgeSet(
        i=padf(edges.i), j=padf(edges.j), t=padf(edges.t),
        q=padf(edges.q).at[E:, 0].set(1.0),
        w_rot=padf(edges.w_rot), w_pos=padf(edges.w_pos),
        valid=padf(edges.valid, False), count=edges.count)


def make_sharded_cg_optimizer(mesh: Mesh, K: int, iters: int = 8,
                              cg_iters: int = 64, prior_w: float = 1e6,
                              damping: float = 1e-3, axis: str = "seq"):
    """Edge-sharded SPARSE pose-graph GN (matrix-free block-Jacobi PCG,
    pose_graph.optimize_cg): every device computes the gradient / diagonal /
    Hv contribution of its edge shard, reduced with one psum per CG
    iteration (a (K,6) vector — rides ICI), node state replicated.  O(E/n +
    K) memory per device; handles K=4096+ where the dense (6K)^2 path
    cannot allocate."""
    n_dev = mesh.devices.size

    edge_spec = pg.EdgeSet(
        i=P(axis), j=P(axis), t=P(axis), q=P(axis), w_rot=P(axis),
        w_pos=P(axis), valid=P(axis), count=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), edge_spec), out_specs=(P(), P()))
    def run(pos, quat, n_nodes, prior_slot, edges):
        active = pg._active_mask(n_nodes, K)
        dtype = pos.dtype
        node_ids = jnp.arange(K)
        diag_w = jnp.where(node_ids == prior_slot, prior_w,
                           jnp.where(active, damping, prior_w)).astype(dtype)
        zero_diag = jnp.zeros((K,), dtype)

        def gn_iter(_, state):
            pos, quat = state
            r, Ji, Jj, w = pg._edge_system(pos, quat, edges)
            g_l, D_l = pg._gradient_and_diag(r, Ji, Jj, w, edges.i,
                                             edges.j, K)
            g = jax.lax.psum(g_l, axis)
            D = jax.lax.psum(D_l, axis)
            D = D + jnp.eye(6, dtype=dtype)[None] * diag_w[:, None, None]
            Dinv = jnp.linalg.inv(D)

            def Minv(v):
                return jnp.einsum("kij,kj->ki", Dinv, v,
                                  precision=jax.lax.Precision.HIGHEST)

            def matvec(v):
                hv_l = pg._hv(v, Ji, Jj, w, edges.i, edges.j, zero_diag, K)
                return jax.lax.psum(hv_l, axis) + diag_w[:, None] * v

            dx = -pg._pcg(matvec, Minv, g, cg_iters)
            dx = jnp.where(active[:, None], dx, 0.0)
            # failed-solve no-op guard (cf. pose_graph.optimize)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
            quat_new = so3.quat_normalize(
                so3.quat_mul(quat, so3.exp_axis(dx[:, 0:3])))
            return pos + dx[:, 3:6], quat_new

        return jax.lax.fori_loop(0, iters, gn_iter, (pos, quat))

    jitted = jax.jit(run)

    def apply(pos, quat, n_nodes, edges: pg.EdgeSet, prior_slot=0):
        edges = pad_edges(edges, n_dev)

        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        edges = jax.tree_util.tree_map(
            lambda x, s: put(x, s), edges, edge_spec)
        n_nodes = jnp.asarray(n_nodes)
        if n_nodes.ndim == 0:
            n_nodes = n_nodes.astype(jnp.int32)
        return jitted(put(pos, P()), put(quat, P()), put(n_nodes, P()),
                      put(jnp.int32(prior_slot), P()), edges)

    return apply


def make_sharded_optimizer(mesh: Mesh, K: int, iters: int = 8,
                           prior_w: float = 1e6, damping: float = 1e-6,
                           axis: str = "seq"):
    """Build a jitted sharded GN optimizer for graphs with K node slots.

    Returned fn: (pos (K,3), quat (K,4), n_nodes, edges[padded, sharded])
    -> (pos, quat), with edge arrays sharded along the mesh axis and
    node state replicated.
    """
    n_dev = mesh.devices.size

    edge_spec = pg.EdgeSet(
        i=P(axis), j=P(axis), t=P(axis), q=P(axis), w_rot=P(axis),
        w_pos=P(axis), valid=P(axis), count=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), edge_spec), out_specs=(P(), P()))
    def run(pos, quat, n_nodes, edges):
        active = pg._active_mask(n_nodes, K)

        def gn_iter(_, state):
            pos, quat = state
            H_local, g_local = pg.build_normal_system(pos, quat, edges)
            H = jax.lax.psum(H_local, axis)
            g = jax.lax.psum(g_local, axis)
            dx = pg.solve_and_clamp(H, g, active, prior_w, damping)
            quat_new = so3.quat_normalize(
                so3.quat_mul(quat, so3.exp_axis(dx[:, 0:3])))
            return pos + dx[:, 3:6], quat_new

        return jax.lax.fori_loop(0, iters, gn_iter, (pos, quat))

    jitted = jax.jit(run)

    def apply(pos, quat, n_nodes, edges: pg.EdgeSet):
        edges = pad_edges(edges, n_dev)
        # place shardings explicitly
        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))
        edges = jax.tree_util.tree_map(
            lambda x, s: put(x, s), edges, edge_spec)
        n_nodes = jnp.asarray(n_nodes)
        if n_nodes.ndim == 0:
            n_nodes = n_nodes.astype(jnp.int32)
        return jitted(put(pos, P()), put(quat, P()),
                      put(n_nodes, P()), edges)

    return apply
