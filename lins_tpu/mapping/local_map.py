"""Incremental local-map maintenance (reference C19,
extractSurroundingKeyFrames, lidar_mapping_node.cpp:1201-1324).

The reference re-concatenates and re-voxel-filters the 50-keyframe window
every mapping step (deque + PCL VoxelGrid + KD-tree rebuild).  That cost
re-paid per step was the round-1 bottleneck (~80 ms/step on TPU v5e).  This
module makes the local map INCREMENTAL:

  * the window's world-frame clouds live in a fixed (W, C, 3) ring of device
    arrays, written once per keyframe (surf and outlier channels merged, as
    the reference does at :1220/:1238/:1306-1313);
  * the union voxel filter and the 5-NN hash-grid build are FUSED into one
    sort (ops/grid_nn.build_grid_voxelized) and re-run ONLY when the window
    content changes: a keyframe insert, a loop-closure pose rewrite, or a
    radius-mode re-selection;
  * mapping steps in between reuse the cached grids and pay only for the
    scan-to-map GN itself.

Two window modes, matching the reference:
  * recent-window (loop-closure mode, :1205-1235): the last W keyframes,
    ring slot = keyframe id mod W;
  * radius mode (loop closure off, :1248-1324): the W nearest live keyframes
    within surrounding_keyframe_search_radius of the current pose, rebuilt
    when the selected id set changes.  (The reference additionally thins the
    candidate poses with a 1 m voxel filter; the nearest-W cap plays the
    same boundedness role and is exact for windows under W keyframes.)

One deliberate improvement over the reference: its deques hold clouds
world-transformed at insertion time and are NOT re-transformed after a
loop-closure pose rewrite (stale until they cycle out of the 50-window);
here `rebuild_window` re-transforms the window from the body-frame store
whenever poses change.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3
from lins_tpu.mapping import keyframes as kf
from lins_tpu.ops.grid_nn import HashGrid, build_grid_voxelized


class GridParams(NamedTuple):
    """Static geometry of the two map hash grids, derived from the config.

    cap = m^3 rounded up to a multiple of 8 guarantees a grid cell can hold
    EVERY voxel centroid it can geometrically contain (closes the round-1
    cap=32 hole for the 0.2 m corner leaf, where a 1 m cell holds up to 125
    centroids).  Neighborhood mode per channel (ops/grid_nn.HashGrid.nb):
    SUPERCELL (nb=8, cell = leaf*m >= 2.3 m, 2x2x2 query blocks — 3.4x
    fewer DMA descriptors in the gather) when m^3 fits a reasonable cap,
    else the classic 27-cell block with cell >= 1.15 m.  Either way the
    coverage radius exceeds the 1 m acceptance ball by >= 0.15 m — the
    slack that lets the GN loop reuse the gather across iterations
    (scan2map.stale's safe-radius argument)."""

    corner_leaf: float
    corner_m: int
    corner_table: int
    corner_cap: int
    corner_nb: int
    surf_leaf: float
    surf_m: int
    surf_table: int
    surf_cap: int
    surf_nb: int


def _derive_grid(leaf: float):
    # supercell blocks must cover radius >= 1.15 m (cell/2 >= 1.15), not
    # just the 1 m acceptance ball: the slack is what lets the GN loop reuse
    # the gather across iterations (scan2map.stale's safe-radius argument —
    # a boundary query with nothing nearby goes stale as soon as the pose
    # moves past cover - 1)
    m8 = max(1, math.ceil(round(2.3 / leaf, 6)))
    if m8 ** 3 <= 224:
        return m8, max(8, ((m8 ** 3 + 7) // 8) * 8), 8
    m27 = max(1, math.ceil(round(1.15 / leaf, 6)))
    return m27, max(8, ((m27 ** 3 + 7) // 8) * 8), 27


def grid_params(cfg: SlamConfig) -> GridParams:
    m_c, cap_c, nb_c = _derive_grid(cfg.map_corner_leaf)
    m_s, cap_s, nb_s = _derive_grid(cfg.map_surf_leaf)
    return GridParams(
        corner_leaf=cfg.map_corner_leaf, corner_m=m_c,
        corner_table=max(2048, cfg.max_map_corner // 4), corner_cap=cap_c,
        corner_nb=nb_c,
        surf_leaf=cfg.map_surf_leaf, surf_m=m_s,
        surf_table=max(4096, cfg.max_map_surf // 4), surf_cap=cap_s,
        surf_nb=nb_s)


class LocalMapState(NamedTuple):
    sel: jnp.ndarray        # (W,) int32 keyframe ids in the window, -1 empty
    wcorner: jnp.ndarray    # (W, Cc, 3) world-frame corner clouds
    wcval: jnp.ndarray      # (W, Cc)
    wsurf: jnp.ndarray      # (W, Cs+Co, 3) world-frame surf+outlier clouds
    wsval: jnp.ndarray      # (W, Cs+Co)
    corner_grid: HashGrid
    surf_grid: HashGrid
    n_corner: jnp.ndarray   # scalar int32: corner map voxel count
    n_surf: jnp.ndarray     # scalar int32: surf map voxel count


def _empty_grid(table: int, cap: int, cell: float, nb: int,
                dtype) -> HashGrid:
    return HashGrid(cells=jnp.zeros((table, 3, cap), dtype),
                    cnt=jnp.zeros((table,), jnp.int32),
                    cell=float(cell), table=int(table), cap=int(cap),
                    nb=int(nb))


def empty_local_map(cfg: SlamConfig, n_window: int, corner_cap: int,
                    surf_cap: int, outlier_cap: int,
                    dtype=jnp.float32, gp: GridParams = None) -> LocalMapState:
    gp = gp or grid_params(cfg)
    W = n_window
    cs = surf_cap + outlier_cap
    return LocalMapState(
        sel=jnp.full((W,), -1, jnp.int32),
        wcorner=jnp.zeros((W, corner_cap, 3), dtype),
        wcval=jnp.zeros((W, corner_cap), bool),
        wsurf=jnp.zeros((W, cs, 3), dtype),
        wsval=jnp.zeros((W, cs), bool),
        corner_grid=_empty_grid(gp.corner_table, gp.corner_cap,
                                gp.corner_leaf * gp.corner_m, gp.corner_nb,
                                dtype),
        surf_grid=_empty_grid(gp.surf_table, gp.surf_cap,
                              gp.surf_leaf * gp.surf_m, gp.surf_nb, dtype),
        n_corner=jnp.int32(0), n_surf=jnp.int32(0))


def _rebuild_grids(lm: LocalMapState, gp: GridParams) -> LocalMapState:
    """Fused union-voxel-filter + hash-grid build over the whole window ring
    (ONE sort per channel; replaces voxel_downsample + build_grid)."""
    cg, n_c = build_grid_voxelized(
        lm.wcorner.reshape(-1, 3), lm.wcval.reshape(-1), gp.corner_leaf,
        gp.corner_m, gp.corner_table, gp.corner_cap, gp.corner_nb)
    sg, n_s = build_grid_voxelized(
        lm.wsurf.reshape(-1, 3), lm.wsval.reshape(-1), gp.surf_leaf,
        gp.surf_m, gp.surf_table, gp.surf_cap, gp.surf_nb)
    return lm._replace(corner_grid=cg, surf_grid=sg,
                       n_corner=n_c.astype(jnp.int32),
                       n_surf=n_s.astype(jnp.int32))


def _to_world(cloud, valid, p, q, keep):
    return (so3.quat_rotate(q[None, :], cloud) + p[None, :]), (valid & keep)


def push_keyframe(lm: LocalMapState, kf_id, pos, quat,
                  corner, cval, surf, sval, outl, oval,
                  gp: GridParams) -> LocalMapState:
    """Insert one keyframe's clouds (recent-window mode: the ring slot
    id % W evicts the keyframe leaving the window, the deque push/pop of
    lidar_mapping_node.cpp:1226-1235) and rebuild the cached grids."""
    W = lm.sel.shape[0]
    slot = (kf_id % W).astype(jnp.int32)
    t = jnp.bool_(True)
    cw, cv = _to_world(corner.astype(lm.wcorner.dtype), cval, pos, quat, t)
    sw, sv = _to_world(surf.astype(lm.wsurf.dtype), sval, pos, quat, t)
    ow, ov = _to_world(outl.astype(lm.wsurf.dtype), oval, pos, quat, t)
    s_all = jnp.concatenate([sw, ow])
    v_all = jnp.concatenate([sv, ov])
    z = jnp.int32(0)
    ds = jax.lax.dynamic_update_slice
    lm = lm._replace(
        sel=ds(lm.sel, kf_id.astype(jnp.int32)[None], (slot,)),
        wcorner=ds(lm.wcorner, cw[None], (slot, z, z)),
        wcval=ds(lm.wcval, cv[None], (slot, z)),
        wsurf=ds(lm.wsurf, s_all[None], (slot, z, z)),
        wsval=ds(lm.wsval, v_all[None], (slot, z)))
    return _rebuild_grids(lm, gp)


def rebuild_window(lm: LocalMapState, store: kf.KeyframeStore,
                   ids, ok, window_slots, gp: GridParams) -> LocalMapState:
    """Re-transform a full window selection from the body-frame store and
    rebuild the grids.  ids (W,) absolute keyframe ids, ok (W,) live mask,
    window_slots (W,) a permutation of 0..W-1 giving each id's ring row
    (id % W in recent-window mode so later push_keyframe inserts stay
    consistent; arange(W) in radius mode)."""
    kslots = kf.slot_of(store, jnp.clip(ids, 0, None))
    p, q = store.pos[kslots], store.quat[kslots]
    cw, cv = jax.vmap(_to_world)(store.corner[kslots],
                                 store.corner_valid[kslots], p, q, ok)
    sw, sv = jax.vmap(_to_world)(store.surf[kslots],
                                 store.surf_valid[kslots], p, q, ok)
    ow, ov = jax.vmap(_to_world)(store.outlier[kslots],
                                 store.outlier_valid[kslots], p, q, ok)
    lm = lm._replace(
        sel=lm.sel.at[window_slots].set(jnp.where(ok, ids, -1)),
        wcorner=lm.wcorner.at[window_slots].set(cw.astype(lm.wcorner.dtype)),
        wcval=lm.wcval.at[window_slots].set(cv),
        wsurf=lm.wsurf.at[window_slots].set(
            jnp.concatenate([sw, ow], axis=1).astype(lm.wsurf.dtype)),
        wsval=lm.wsval.at[window_slots].set(jnp.concatenate([sv, ov],
                                                            axis=1)))
    return _rebuild_grids(lm, gp)


def recent_window_ids(store: kf.KeyframeStore, n_window: int):
    """(ids, ok, window_slots) of the last n_window keyframes, rows keyed
    id % W (recent-window mode)."""
    center = store.count - 1
    ids = (center - (n_window - 1)
           + jnp.arange(n_window, dtype=jnp.int32))
    oldest = jnp.maximum(store.count - store.capacity, 0)
    ok = (ids >= 0) & (ids >= oldest) & (ids < store.count)
    return ids, ok, (jnp.mod(ids, n_window)).astype(jnp.int32)


def select_radius(store: kf.KeyframeStore, cur_pos, radius: float,
                  n_window: int):
    """The (up to) n_window nearest live keyframes within `radius` of the
    current position (radius mode, lidar_mapping_node.cpp:1248-1260),
    canonically sorted by id so set-equality compares elementwise.

    Returns (ids (W,) with -1 for empty, ok (W,))."""
    live = kf.live_mask(store)
    d = jnp.linalg.norm(store.pos - cur_pos[None, :], axis=1)
    d = jnp.where(live, d, jnp.inf)
    neg_d, slots = jax.lax.top_k(-d, n_window)
    ok = (-neg_d) < radius
    ids = jnp.where(ok, store.kf_id[slots], -1)
    ids = jnp.sort(ids)
    return ids, ids >= 0
