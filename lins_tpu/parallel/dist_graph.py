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
        active = jnp.arange(K) < n_nodes

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
        return jitted(put(pos, P()), put(quat, P()),
                      put(jnp.int32(n_nodes), P()), edges)

    return apply
