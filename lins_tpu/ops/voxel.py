"""Fixed-shape voxel-grid downsampling (pcl::VoxelGrid equivalent).

Centroid-per-voxel over a masked point set, entirely static-shape: sort by a
mixed voxel hash, centroid via cumulative-sum differences at run starts,
compact valid centroids to the front.  Used by the mapping backend
(lidar_mapping_node.cpp:283-291 leaf sizes) and the front-end.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_downsample(xyz: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     cap: int | None = None):
    """Downsample a masked (N,3) cloud to voxel centroids.

    Returns (xyz (cap,3), valid (cap,)) with centroids compacted to the
    front; cap defaults to N.
    """
    N = xyz.shape[0]
    cap = cap or N
    v = jnp.floor(xyz / leaf).astype(jnp.int32)
    h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349663) ^ (v[:, 2] * 83492791)
    h = jnp.where(mask, h, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(h)
    hs = h[order]
    xs = xyz[order]
    ms = mask[order]

    start = jnp.concatenate([jnp.asarray([True]), hs[1:] != hs[:-1]]) & ms
    cx = jnp.concatenate([jnp.zeros((1, 3), xs.dtype), jnp.cumsum(
        jnp.where(ms[:, None], xs, 0.0), axis=0)])
    cn = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                          jnp.cumsum(ms.astype(jnp.int32))])

    nxt = jnp.concatenate([start[1:], jnp.asarray([True])])
    pos = jnp.where(nxt, jnp.arange(1, N + 1), N)
    next_pos = jax.lax.associative_scan(jnp.minimum, pos, reverse=True)

    n_run = cn[next_pos] - cn[jnp.arange(N)]
    cent = (cx[next_pos] - cx[jnp.arange(N)]) / jnp.maximum(n_run, 1)[:, None]

    # compact run-start centroids to the front
    key = jnp.where(start, jnp.arange(N, dtype=jnp.int32), N)
    order2 = jnp.argsort(key)[:cap]
    return (jnp.where(start[order2][:, None], cent[order2], 0.0),
            start[order2])


def top_k_nn(query: jnp.ndarray, q_valid: jnp.ndarray, ref: jnp.ndarray,
             r_valid: jnp.ndarray, k: int = 5, chunk: int = 8192):
    """k nearest neighbors of each query in ref, chunked so the distance
    matrix never materializes beyond (Q, chunk).

    Replaces the mapping KD-trees (lidar_mapping_node.cpp:1355-1357, 1465)
    with MXU-friendly chunked brute force.  Returns (idx (Q,k), d2 (Q,k));
    invalid refs get +inf distance.
    """
    Q = query.shape[0]
    R = ref.shape[0]
    n_chunks = (R + chunk - 1) // chunk
    pad = n_chunks * chunk - R
    ref_p = jnp.concatenate([ref, jnp.zeros((pad, 3), ref.dtype)])
    rv_p = jnp.concatenate([r_valid, jnp.zeros((pad,), bool)])

    qq = jnp.sum(query * query, axis=-1, keepdims=True)

    def body(c, carry):
        best_d, best_i = carry
        r = jax.lax.dynamic_slice_in_dim(ref_p, c * chunk, chunk)
        rv = jax.lax.dynamic_slice_in_dim(rv_p, c * chunk, chunk)
        d2 = qq + jnp.sum(r * r, axis=-1)[None, :] - 2.0 * (query @ r.T)
        d2 = jnp.where(rv[None, :], jnp.maximum(d2, 0.0), jnp.inf)
        idx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx, (Q, chunk))],
                                axis=1)
        neg_d, sel = jax.lax.top_k(-cat_d, k)
        return (-neg_d, jnp.take_along_axis(cat_i, sel, axis=1))

    init = (jnp.full((Q, k), jnp.inf, query.dtype),
            jnp.zeros((Q, k), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    best_d = jnp.where(q_valid[:, None], best_d, jnp.inf)
    return best_i, best_d
