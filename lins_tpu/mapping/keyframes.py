"""Keyframe store (reference C19, lidar_mapping_node.cpp:113-131) as a
fixed-capacity RING of device arrays.

The reference grows std::vectors without bound (:1753-1764); a static-shape
TPU store needs an eviction policy instead.  Semantics here:

  * `count` is the MONOTONIC number of keyframes ever added; a keyframe's
    absolute id is the value of `count` at its insertion.
  * id `k` lives in slot `k % K` (K = max_keyframes).  Once count > K the
    oldest keyframe is overwritten — ids in [count-K, count) are "live".
  * `kf_id[slot]` records which absolute id currently occupies a slot
    (-1 while empty), so window gathers, loop detection and the pose-graph
    solve can mask out evicted/empty slots exactly.

Pose-graph edges store ABSOLUTE ids; `graph.pose_graph.live_view` translates
them to slots and retires edges with an evicted endpoint.

Per keyframe the store holds the scan's voxel-downsampled corner / surf /
outlier clouds in the BODY frame (the reference keeps exactly these three,
lidar_mapping_node.cpp:1753-1764) — world-frame assembly lives in
mapping/local_map.py so pose rewrites after loop closure never stale the
stored geometry.
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
    kf_id: jnp.ndarray       # (K,) int32 absolute id in this slot, -1 empty
    corner: jnp.ndarray      # (K, Cc, 3) body-frame corner cloud
    corner_valid: jnp.ndarray  # (K, Cc)
    surf: jnp.ndarray        # (K, Cs, 3) body-frame surf cloud
    surf_valid: jnp.ndarray  # (K, Cs)
    outlier: jnp.ndarray     # (K, Co, 3) body-frame outlier cloud
    outlier_valid: jnp.ndarray  # (K, Co)
    count: jnp.ndarray       # scalar int32, monotonic

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


def empty_store(cfg: SlamConfig, corner_cap: int = 1024, surf_cap: int = 4096,
                outlier_cap: int = 2048, dtype=jnp.float32) -> KeyframeStore:
    K = cfg.max_keyframes
    return KeyframeStore(
        pos=jnp.zeros((K, 3), dtype),
        quat=jnp.zeros((K, 4), dtype).at[:, 0].set(1.0),
        time=jnp.zeros((K,), dtype),
        kf_id=jnp.full((K,), -1, jnp.int32),
        corner=jnp.zeros((K, corner_cap, 3), dtype),
        corner_valid=jnp.zeros((K, corner_cap), bool),
        surf=jnp.zeros((K, surf_cap, 3), dtype),
        surf_valid=jnp.zeros((K, surf_cap), bool),
        outlier=jnp.zeros((K, outlier_cap, 3), dtype),
        outlier_valid=jnp.zeros((K, outlier_cap), bool),
        count=jnp.int32(0),
    )


def add_keyframe(store: KeyframeStore, pos, quat, time,
                 corner, corner_valid, surf, surf_valid,
                 outlier=None, outlier_valid=None) -> KeyframeStore:
    """Append one keyframe at slot `count % K` (ring eviction)."""
    K = store.pos.shape[0]
    i = (store.count % K).astype(jnp.int32)
    z = jnp.int32(0)
    ds = jax.lax.dynamic_update_slice
    if outlier is None:
        outlier = jnp.zeros(store.outlier.shape[1:], store.outlier.dtype)
        outlier_valid = jnp.zeros(store.outlier_valid.shape[1:], bool)
    return store._replace(
        pos=ds(store.pos, pos[None].astype(store.pos.dtype), (i, z)),
        quat=ds(store.quat, quat[None].astype(store.quat.dtype), (i, z)),
        time=ds(store.time, jnp.asarray(time, store.time.dtype)[None], (i,)),
        kf_id=ds(store.kf_id, store.count[None].astype(jnp.int32), (i,)),
        corner=ds(store.corner, corner[None].astype(store.corner.dtype),
                  (i, z, z)),
        corner_valid=ds(store.corner_valid, corner_valid[None], (i, z)),
        surf=ds(store.surf, surf[None].astype(store.surf.dtype), (i, z, z)),
        surf_valid=ds(store.surf_valid, surf_valid[None], (i, z)),
        outlier=ds(store.outlier, outlier[None].astype(store.outlier.dtype),
                   (i, z, z)),
        outlier_valid=ds(store.outlier_valid, outlier_valid[None], (i, z)),
        count=store.count + 1,
    )


def set_poses(store: KeyframeStore, pos, quat) -> KeyframeStore:
    """Overwrite all keyframe poses (after a pose-graph correction,
    correctPoses, lidar_mapping_node.cpp:1767-1795)."""
    return store._replace(pos=pos.astype(store.pos.dtype),
                          quat=quat.astype(store.quat.dtype))


def live_mask(store: KeyframeStore) -> jnp.ndarray:
    """(K,) bool — slots currently holding a live (non-evicted) keyframe."""
    return store.kf_id >= 0


def slot_of(store: KeyframeStore, kf_id) -> jnp.ndarray:
    return (kf_id % store.pos.shape[0]).astype(jnp.int32)


def gather_window(store: KeyframeStore, center: jnp.ndarray, n_window: int):
    """Ring slots of the `n_window` keyframe IDS ending at id `center`
    (inclusive) — the recent-keyframe local map of the reference's
    loop-closure mode (lidar_mapping_node.cpp:1205-1235).

    Returns (slots, ok, ids); ok masks ids before 0 or already evicted."""
    K = store.pos.shape[0]
    start = center - (n_window - 1)
    ids = start + jnp.arange(n_window, dtype=jnp.int32)
    oldest = jnp.maximum(store.count - K, 0)
    ok = (ids >= 0) & (ids >= oldest) & (ids <= center) & (ids < store.count)
    slots = (jnp.clip(ids, 0, None) % K).astype(jnp.int32)
    return slots, ok, ids


@partial(jax.jit, static_argnames=("n_window", "corner_cap", "surf_cap",
                                  "corner_leaf", "surf_leaf",
                                  "with_outlier"))
def assemble_local_map(store: KeyframeStore, center,
                       n_window: int = 50,
                       corner_cap: int = 32768, surf_cap: int = 65536,
                       corner_leaf: float = 0.2, surf_leaf: float = 0.4,
                       with_outlier: bool = False):
    """Local map around keyframe id `center`: transform each window
    keyframe's clouds to world, concatenate, voxel-filter
    (extractSurroundingKeyFrames + downsample, :1201-1324).  The production
    mapper keeps this incrementally (mapping/local_map.py); this one-shot
    assembly is the oracle/reference path (tests, sharded-store gathers)."""
    slots, ok, _ = gather_window(store, center, n_window)

    def to_world(cloud, valid, p, q, keep):
        w = so3.quat_rotate(q[None, :], cloud) + p[None, :]
        return w, valid & keep

    cw, cv = jax.vmap(to_world)(store.corner[slots],
                                store.corner_valid[slots],
                                store.pos[slots], store.quat[slots], ok)
    sw, sv = jax.vmap(to_world)(store.surf[slots], store.surf_valid[slots],
                                store.pos[slots], store.quat[slots], ok)
    sw = sw.reshape(-1, 3)
    sv = sv.reshape(-1)
    if with_outlier:
        # the reference merges the outlier channel into the surf map in both
        # local-map modes (lidar_mapping_node.cpp:1220, 1238, 1306-1313)
        ow, ov = jax.vmap(to_world)(store.outlier[slots],
                                    store.outlier_valid[slots],
                                    store.pos[slots], store.quat[slots], ok)
        sw = jnp.concatenate([sw, ow.reshape(-1, 3)])
        sv = jnp.concatenate([sv, ov.reshape(-1)])

    corner_map, corner_ok = voxel_downsample(
        cw.reshape(-1, 3), cv.reshape(-1), corner_leaf, corner_cap)
    surf_map, surf_ok = voxel_downsample(sw, sv, surf_leaf, surf_cap)
    return corner_map, corner_ok, surf_map, surf_ok
