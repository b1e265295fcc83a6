"""Keyframe store + local-map assembly (reference C19,
lidar_mapping_node.cpp:113-131, 1201-1349).

TPU-native: a fixed-capacity ring of device arrays (poses + per-keyframe
corner/surf clouds), updated with dynamic_update_slice; the local map is a
gather of the most recent `surrounding_keyframe_search_num` keyframes'
clouds, transformed by their poses and voxel-filtered — all static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3
from lins_tpu.ops.voxel import voxel_downsample


class KeyframeStore(NamedTuple):
    pos: jnp.ndarray         # (K, 3) keyframe positions (world)
    quat: jnp.ndarray        # (K, 4) wxyz
    time: jnp.ndarray        # (K,)
    corner: jnp.ndarray      # (K, Cc, 3) body-frame corner cloud
    corner_valid: jnp.ndarray  # (K, Cc)
    surf: jnp.ndarray        # (K, Cs, 3) body-frame surf (+outlier) cloud
    surf_valid: jnp.ndarray  # (K, Cs)
    count: jnp.ndarray       # scalar int32


def empty_store(cfg: SlamConfig, corner_cap: int = 1024, surf_cap: int = 4096,
                dtype=jnp.float32) -> KeyframeStore:
    K = cfg.max_keyframes
    return KeyframeStore(
        pos=jnp.zeros((K, 3), dtype),
        quat=jnp.zeros((K, 4), dtype).at[:, 0].set(1.0),
        time=jnp.zeros((K,), dtype),
        corner=jnp.zeros((K, corner_cap, 3), dtype),
        corner_valid=jnp.zeros((K, corner_cap), bool),
        surf=jnp.zeros((K, surf_cap, 3), dtype),
        surf_valid=jnp.zeros((K, surf_cap), bool),
        count=jnp.int32(0),
    )


def add_keyframe(store: KeyframeStore, pos, quat, time,
                 corner, corner_valid, surf, surf_valid) -> KeyframeStore:
    """Append one keyframe at slot `count` (capacity-clamped)."""
    i = jnp.minimum(store.count, store.pos.shape[0] - 1).astype(jnp.int32)
    z = jnp.int32(0)
    ds = jax.lax.dynamic_update_slice
    return store._replace(
        pos=ds(store.pos, pos[None].astype(store.pos.dtype), (i, z)),
        quat=ds(store.quat, quat[None].astype(store.quat.dtype), (i, z)),
        time=ds(store.time, jnp.asarray([time], store.time.dtype), (i,)),
        corner=ds(store.corner, corner[None].astype(store.corner.dtype),
                  (i, z, z)),
        corner_valid=ds(store.corner_valid, corner_valid[None], (i, z)),
        surf=ds(store.surf, surf[None].astype(store.surf.dtype), (i, z, z)),
        surf_valid=ds(store.surf_valid, surf_valid[None], (i, z)),
        count=store.count + 1,
    )


def set_poses(store: KeyframeStore, pos, quat) -> KeyframeStore:
    """Overwrite all keyframe poses (after a pose-graph correction,
    correctPoses, lidar_mapping_node.cpp:1767-1795)."""
    return store._replace(pos=pos.astype(store.pos.dtype),
                          quat=quat.astype(store.quat.dtype))


def gather_window(store: KeyframeStore, center: jnp.ndarray, n_window: int):
    """Indices of the `n_window` keyframes ending at `center` (inclusive),
    clamped at 0 — the recent-keyframe local map of the reference's
    loop-closure mode (lidar_mapping_node.cpp:1205-1235)."""
    start = jnp.maximum(center - (n_window - 1), 0)
    idx = start + jnp.arange(n_window)
    ok = idx <= center
    idx = jnp.clip(idx, 0, store.pos.shape[0] - 1)
    return idx, ok


@partial(jax.jit, static_argnames=("n_window", "corner_cap", "surf_cap",
                                  "corner_leaf", "surf_leaf"))
def assemble_local_map(store: KeyframeStore, center,
                       n_window: int = 50,
                       corner_cap: int = 32768, surf_cap: int = 65536,
                       corner_leaf: float = 0.2, surf_leaf: float = 0.4):
    """Local map around keyframe `center`: transform each window keyframe's
    clouds to world, concatenate, voxel-filter (extractSurroundingKeyFrames +
    downsample, lidar_mapping_node.cpp:1201-1324)."""
    idx, ok = gather_window(store, center, n_window)

    def to_world(cloud, valid, p, q, keep):
        w = so3.quat_rotate(q[None, :], cloud) + p[None, :]
        return w, valid & keep

    cw, cv = jax.vmap(to_world)(store.corner[idx], store.corner_valid[idx],
                                store.pos[idx], store.quat[idx], ok)
    sw, sv = jax.vmap(to_world)(store.surf[idx], store.surf_valid[idx],
                                store.pos[idx], store.quat[idx], ok)

    corner_map, corner_ok = voxel_downsample(
        cw.reshape(-1, 3), cv.reshape(-1), corner_leaf, corner_cap)
    surf_map, surf_ok = voxel_downsample(
        sw.reshape(-1, 3), sv.reshape(-1), surf_leaf, surf_cap)
    return corner_map, corner_ok, surf_map, surf_ok
