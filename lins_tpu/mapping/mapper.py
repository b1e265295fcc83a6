"""Mapping backend driver (reference C19-C21: lidar_mapping_node.cpp main
loop without the ROS plumbing).

Per mapped scan (throttled to mapping_process_interval like the reference's
0.3 s gate, lidar_mapping_node.cpp:1821):
  1. warm-start pose = last map correction ∘ new odometry pose
     (transformAssociateToMap, :411-536 — quaternion compose instead of the
     hand-expanded Euler algebra)
  2. voxel-downsample the scan's corner/surf/outlier clouds and merge
     surf+outlier into the GN query set (downsampleCurrentScan, :1326-1349)
  3. local map: CACHED hash grids over the keyframe window
     (mapping/local_map.py) — recent-window mode when loop closure is on,
     50 m-radius mode when off (extractSurroundingKeyFrames, :1201-1324);
     grids rebuild only when the window content changes
  4. scan-to-map GN refinement against the cached grids (:1635-1652)
  5. roll/pitch blend with the latest IMU attitude, weight 0.998/0.002
     (transformUpdate, :538-577; roll/pitch derived from the accelerometer
     where the reference reads its driver's AHRS orientation)
  6. keyframe gating at 0.3 m (:1660-1667) + ring store/window update
Everything after the host-side throttle is one fused jit per mapped scan.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3
from lins_tpu.graph import loop_closure as lc
from lins_tpu.graph import pose_graph as pg
from lins_tpu.utils.lazy import ChunkMetrics, LazyRows
from lins_tpu.mapping import keyframes as kf
from lins_tpu.mapping import local_map as lmn
from lins_tpu.mapping.scan2map import scan_to_map_grids
from lins_tpu.ops.voxel import voxel_downsample


class MapperState(NamedTuple):
    store: kf.KeyframeStore
    lmap: lmn.LocalMapState
    bef_pos: jnp.ndarray   # odometry pose at last correction
    bef_quat: jnp.ndarray
    aft_pos: jnp.ndarray   # refined pose at last correction
    aft_quat: jnp.ndarray
    edges: "pg.EdgeSet"    # pose-graph factors (odometry + loop)
    n_loops: jnp.ndarray   # scalar int32


def derive_caps(cfg: SlamConfig, corner_cap=None, surf_cap=None,
                outlier_cap=None):
    """Per-keyframe cloud capacity defaults scaled from the sensor preset.

    Per-keyframe clouds are the odometry feature sets voxel-downsampled at
    the map leaf sizes (roughly halves/keeps them).  For the VLP-16 preset
    these reproduce the hand-tuned 1024/4096/2048."""
    corner_cap = corner_cap or max(256, cfg.max_less_sharp // 2)
    surf_cap = surf_cap or max(1024, (cfg.max_less_flat * 2) // 3)
    outlier_cap = outlier_cap or max(256, cfg.max_outlier // 2)
    return corner_cap, surf_cap, outlier_cap


def init_mapper(cfg: SlamConfig, corner_cap=1024, surf_cap=4096,
                outlier_cap=2048, n_window=50, grid: lmn.GridParams = None,
                dtype=jnp.float32) -> MapperState:
    z = jnp.zeros(3, dtype)
    e = so3.quat_identity(dtype)
    gp = grid or lmn.grid_params(cfg)
    lm = lmn.empty_local_map(cfg, n_window, corner_cap, surf_cap,
                             outlier_cap, dtype, gp)
    return MapperState(
        store=kf.empty_store(cfg, corner_cap, surf_cap, outlier_cap, dtype),
        lmap=lm, bef_pos=z, bef_quat=e, aft_pos=z, aft_quat=e,
        edges=pg.empty_edges(cfg.max_keyframes + 128, dtype),
        n_loops=jnp.int32(0))


def warm_start(state: MapperState, odo_pos, odo_quat):
    """T_warm = T_aft ∘ T_bef⁻¹ ∘ T_odo (transformAssociateToMap)."""
    dq = so3.quat_mul(state.aft_quat, so3.quat_inv(state.bef_quat))
    pos = state.aft_pos + so3.quat_rotate(
        dq, odo_pos - state.bef_pos)
    quat = so3.quat_normalize(so3.quat_mul(dq, odo_quat))
    return pos, quat


def _mapping_step_impl(state: MapperState, odo_pos, odo_quat, time,
                       corner_xyz, corner_valid, surf_xyz, surf_valid,
                       outl_xyz, outl_valid, imu_rp,
                       cfg: SlamConfig, corner_cap: int, surf_cap: int,
                       outlier_cap: int, n_window: int, gp: lmn.GridParams):
    dtype = state.bef_pos.dtype
    odo_pos = odo_pos.astype(dtype)
    odo_quat = odo_quat.astype(dtype)
    radius_mode = not cfg.loop_closure_enabled
    # radius-SELECTED map (vs the recent-keyframe ring) — always in radius
    # mode, and in LC mode when lc_map_mode == "radius" (config.py)
    radius_map = radius_mode or cfg.lc_map_mode == "radius"

    t_w, q_w = warm_start(state, odo_pos, odo_quat)

    # downsample the current scan (body frame); the GN surf query set is
    # surf+outlier re-filtered together (downsampleCurrentScan, :1340-1348)
    c_ds, c_ok = voxel_downsample(corner_xyz.astype(dtype), corner_valid,
                                  cfg.map_corner_leaf, corner_cap)
    s_ds, s_ok = voxel_downsample(surf_xyz.astype(dtype), surf_valid,
                                  cfg.map_surf_leaf, surf_cap)
    o_ds, o_ok = voxel_downsample(outl_xyz.astype(dtype), outl_valid,
                                  cfg.map_outlier_leaf, outlier_cap)
    st_ds, st_ok = voxel_downsample(
        jnp.concatenate([s_ds, o_ds]), jnp.concatenate([s_ok, o_ok]),
        cfg.map_surf_leaf, surf_cap + outlier_cap)

    # scan-to-map GN query views: voxel_downsample compacts valid entries to
    # the front, so slicing to the measured-occupancy query caps
    # (cfg.map_query_*) drops nothing in practice — `query_overflow` flags
    # the scan if it ever does
    qc_cap = min(cfg.map_query_corner or corner_cap, corner_cap)
    qs_cap = min(cfg.map_query_surf or (surf_cap + outlier_cap),
                 surf_cap + outlier_cap)
    c_q, c_qok = c_ds[:qc_cap], c_ok[:qc_cap]
    st_q, st_qok = st_ds[:qs_cap], st_ok[:qs_cap]
    query_overflow = jnp.any(c_ok[qc_cap:]) | jnp.any(st_ok[qs_cap:])

    lmap = state.lmap
    if radius_map:
        # 50 m-radius window, rebuilt only when the selected keyframe set
        # changes (extractSurroundingKeyFrames else-branch, :1248-1324)
        ids, okm = lmn.select_radius(
            state.store, t_w, cfg.surrounding_keyframe_search_radius,
            n_window)
        changed = jnp.any(ids != lmap.sel) & (state.store.count > 0)
        wslots = jnp.arange(n_window, dtype=jnp.int32)
        lmap = jax.lax.cond(
            changed,
            lambda lm: lmn.rebuild_window(lm, state.store, ids, okm,
                                          wslots, gp),
            lambda lm: lm, lmap)

    has_map = state.store.count > 0

    def refine(_):
        return scan_to_map_grids(
            t_w, q_w, c_q, c_qok, st_q, st_qok,
            lmap.corner_grid, lmap.surf_grid, lmap.n_corner, lmap.n_surf,
            cfg)

    def first(_):
        return t_w, q_w, jnp.int32(0), jnp.int32(0), jnp.int32(0)

    t_m, q_m, iters, n_sel, n_refresh = jax.lax.cond(
        has_map, refine, first, None)

    # transformUpdate (:538-577): blend roll/pitch with the latest IMU
    # attitude (derived from the accelerometer; the reference interpolates
    # its AHRS orientation queue), weight 0.998/0.002; yaw untouched
    rpy_m = so3.quat_to_rpy(q_m)
    have_imu = jnp.all(jnp.isfinite(imu_rp))
    rp = jnp.where(have_imu, imu_rp.astype(dtype), rpy_m[:2])
    blended = jnp.stack([
        0.998 * rpy_m[0] + 0.002 * rp[0],
        0.998 * rpy_m[1] + 0.002 * rp[1],
        rpy_m[2]])
    q_m = so3.rpy_to_quat(blended)

    # keyframe gate: 0.3 m from the previous keyframe (or always for the 1st)
    K = state.store.capacity
    last_slot = (jnp.maximum(state.store.count - 1, 0) % K).astype(jnp.int32)
    dist = jnp.linalg.norm(t_m - state.store.pos[last_slot])
    add = (~has_map) | (dist > cfg.keyframe_gate_meters)

    def do_add(args):
        store, lmap, edges = args
        new_id = store.count
        store2 = kf.add_keyframe(store, t_m, q_m, time, c_ds, c_ok,
                                 s_ds, s_ok, o_ds, o_ok)
        if not radius_map:
            # recent-window incremental insert (evict-subtract + add-scatter,
            # ops/voxel_map.py); in radius mode the next step's selection
            # picks the new keyframe up instead
            lmap = lmn.push_keyframe(lmap, new_id, t_m, q_m, c_ds, c_ok,
                                     s_ds, s_ok, o_ds, o_ok, gp)
            # periodic compaction: tombstone leak, cell overflow, and f32
            # sum drift are all bounded by a full fused rebuild every
            # map_rebuild_interval keyframes (amortized ~1/interval of the
            # round-2 per-step rebuild cost)
            need = (lmap.pushes >= cfg.map_rebuild_interval) | \
                lmap.rebuild_due
            ids, okm, wslots = lmn.recent_window_ids(store2, n_window)
            lmap = jax.lax.cond(
                need,
                lambda lm: lmn.rebuild_window(lm, store2, ids, okm,
                                              wslots, gp),
                lambda lm: lm, lmap)
        # odometry between-factor prev_kf -> new_kf with ABSOLUTE ids
        # (saveKeyFramesAndFactor, lidar_mapping_node.cpp:1693-1703)
        prev_id = jnp.maximum(new_id - 1, 0)
        t_rel, q_rel = pg.relative_pose(store.pos[last_slot],
                                        store.quat[last_slot], t_m, q_m)
        edges2 = pg.add_edge(edges, prev_id, new_id, t_rel, q_rel,
                             1.0 / cfg.pg_odom_rot_var,
                             1.0 / cfg.pg_odom_pos_var)
        edges = jax.tree_util.tree_map(
            lambda a, b: jnp.where(has_map, a, b), edges2, edges)
        return store2, lmap, edges

    store, lmap, edges = jax.lax.cond(
        add, do_add, lambda a: a, (state.store, lmap, state.edges))

    new_state = MapperState(store=store, lmap=lmap,
                            bef_pos=odo_pos, bef_quat=odo_quat,
                            aft_pos=t_m, aft_quat=q_m, edges=edges,
                            n_loops=state.n_loops)
    metrics = dict(iters=iters, n_matches=n_sel, n_refresh=n_refresh,
                   keyframe_added=add,
                   warm_dist=jnp.linalg.norm(t_m - t_w),
                   query_overflow=query_overflow)
    return new_state, t_m, q_m, metrics


def _loop_step_impl(state: MapperState, time, cfg: SlamConfig,
                    submap_cap: int, cloud_cap: int, opt_iters: int,
                    n_window: int, gp: lmn.GridParams):
    """One loop-closure attempt + (on accept) pose-graph re-solve, keyframe
    pose rewrite, and local-map window re-transform (performLoopClosure +
    correctPoses, lidar_mapping_node.cpp:1114-1186, 1767-1795)."""
    store = state.store
    K = store.capacity
    cur = jnp.maximum(store.count - 1, 0)          # absolute id
    cur_slot = (cur % K).astype(jnp.int32)
    enough = store.count > 2
    idx, found, accepted, t_rel, q_rel, fitness, corr_t = lc.try_close_loop(
        store, cur, time, cfg, submap_cap, cloud_cap)
    accepted = accepted & enough

    # every accepted edge enters the graph; the SOLVE + keyframe/window
    # rewrite only runs when the edge's implied correction is worth the
    # causal-stream discontinuity it causes (loop_rewrite_min_m — iSAM2's
    # relinearization-threshold idea; small confirmations accumulate and
    # are incorporated by the next triggered or final solve)
    var = jnp.maximum(fitness * cfg.pg_loop_var_scale,
                      jnp.asarray(1e-6, fitness.dtype))
    w = 1.0 / var
    edges_new = pg.add_edge(state.edges, idx, cur, t_rel, q_rel, w, w)
    state1 = state._replace(
        edges=jax.tree_util.tree_map(
            lambda a, b: jnp.where(accepted, a, b), edges_new, state.edges),
        n_loops=state.n_loops + accepted.astype(jnp.int32))
    solve = accepted & (corr_t >= cfg.loop_rewrite_min_m)

    def apply(_):
        edges = state1.edges
        live = kf.live_mask(store)
        ev = pg.live_view(edges, store.count, K)
        # gauge prior on the oldest live keyframe (node 0 may be evicted)
        oldest = jnp.maximum(store.count - K, 0)
        prior_slot = (oldest % K).astype(jnp.int32)
        if K > 1024:
            # dense (6K)^2 Cholesky walls out — matrix-free sparse PCG
            pos, quat = pg.optimize_cg(store.pos, store.quat, live, ev,
                                       opt_iters, prior_slot=prior_slot,
                                       huber_delta=cfg.pg_loop_huber)
        else:
            pos, quat = pg.optimize(store.pos, store.quat, live, ev,
                                    opt_iters, prior_slot=prior_slot,
                                    huber_delta=cfg.pg_loop_huber)
        store2 = kf.set_poses(store, pos, quat)
        # re-transform the window from the corrected poses (the reference
        # leaves its deque clouds stale here — documented improvement)
        if cfg.lc_map_mode == "radius":
            # refresh the CURRENT radius selection at the corrected poses
            # (the next mapping step re-selects around the corrected pose)
            ids = state1.lmap.sel
            ok = ids >= 0
            wslots = jnp.arange(n_window, dtype=jnp.int32)
        else:
            ids, ok, wslots = lmn.recent_window_ids(store2, n_window)
        lmap = lmn.rebuild_window(state1.lmap, store2, ids, ok, wslots, gp)
        new = state1._replace(store=store2, lmap=lmap,
                              aft_pos=pos[cur_slot],
                              aft_quat=quat[cur_slot])
        # whole-solve failure guard: if the optimizer returned any
        # non-finite live pose, discard the entire application (edge
        # included — the next attempt re-measures it) instead of rewriting
        # the store/map with poison.  Complements the per-iteration no-op
        # guard in pose_graph.optimize: both exist because one corrupted
        # solve here propagates NaN into every downstream mapping step
        # (round-4 bigloop finding).
        live2 = kf.live_mask(store2)[:, None]
        good = (jnp.all(jnp.where(live2, jnp.isfinite(pos), True))
                & jnp.all(jnp.where(live2, jnp.isfinite(quat), True)))
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), new, state), good

    new_state, applied = jax.lax.cond(
        solve, apply, lambda _: (state1, jnp.bool_(False)), None)
    # `applied` distinguishes edges whose solve actually took effect from
    # add-only edges (corr_t below the rewrite threshold) and from solves
    # the whole-solve guard discarded — without it loop telemetry counts
    # closures that never rewrote anything (advisor r4)
    info = dict(found=found, accepted=accepted, applied=applied,
                fitness=fitness, matched=idx, corr_t=corr_t)
    return new_state, info


def _final_solve_impl(state: MapperState, cfg: SlamConfig, opt_iters: int,
                      n_window: int, gp: lmn.GridParams):
    """One pose-graph solve over ALL accumulated edges + keyframe/window
    rewrite, with no new measurement — incorporates add-only loop edges
    (those below loop_rewrite_min_m) into the final-estimate map.  The
    reference's equivalent is the correctPoses rewrite after its last
    iSAM2 update (lidar_mapping_node.cpp:1767-1795)."""
    store = state.store
    K = store.capacity
    live = kf.live_mask(store)
    ev = pg.live_view(state.edges, store.count, K)
    oldest = jnp.maximum(store.count - K, 0)
    prior_slot = (oldest % K).astype(jnp.int32)
    if K > 1024:
        pos, quat = pg.optimize_cg(store.pos, store.quat, live, ev,
                                   opt_iters, prior_slot=prior_slot,
                                   huber_delta=cfg.pg_loop_huber)
    else:
        pos, quat = pg.optimize(store.pos, store.quat, live, ev,
                                opt_iters, prior_slot=prior_slot,
                                huber_delta=cfg.pg_loop_huber)
    store2 = kf.set_poses(store, pos, quat)
    if cfg.lc_map_mode == "radius":
        ids = state.lmap.sel
        ok = ids >= 0
        wslots = jnp.arange(n_window, dtype=jnp.int32)
    else:
        ids, ok, wslots = lmn.recent_window_ids(store2, n_window)
    lmap = lmn.rebuild_window(state.lmap, store2, ids, ok, wslots, gp)
    cur_slot = (jnp.maximum(store.count - 1, 0) % K).astype(jnp.int32)
    new = state._replace(store=store2, lmap=lmap, aft_pos=pos[cur_slot],
                         aft_quat=quat[cur_slot])
    live2 = live[:, None]
    good = (jnp.all(jnp.where(live2, jnp.isfinite(pos), True))
            & jnp.all(jnp.where(live2, jnp.isfinite(quat), True)))
    ok_all = good & (store.count > 2)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok_all, a, b), new, state)


def _mapping_chunk_impl(state: MapperState, rns, qbns, ts,
                        cxyz, cval, sxyz, sval, oxyz, oval, imu_rp,
                        map_flags, loop_flags,
                        cfg: SlamConfig, corner_cap: int, surf_cap: int,
                        outlier_cap: int, n_window: int,
                        gp: lmn.GridParams, submap_cap: int, cloud_cap: int,
                        opt_iters: int):
    """The whole mapping cadence for a K-scan chunk in ONE compiled region.

    lax.scan over the chunk's per-scan odometry outputs; at each scan a
    lax.cond runs the mapping step (map_flags, the 0.3 s cadence) and/or a
    loop-closure attempt (loop_flags, the 1 Hz cadence), then composes the
    scan's fused high-rate pose with the correction current at that scan —
    exactly the streaming order (process -> loop -> fuse).  Host-side
    per-boundary slicing/dispatch is what this replaces: on remote-attached
    TPUs each host-issued op costs ~45 ms, which made the host loop slower
    than per-scan streaming.
    """
    step = partial(_mapping_step_impl, cfg=cfg, corner_cap=corner_cap,
                   surf_cap=surf_cap, outlier_cap=outlier_cap,
                   n_window=n_window, gp=gp)
    loop = partial(_loop_step_impl, cfg=cfg, submap_cap=submap_cap,
                   cloud_cap=cloud_cap, opt_iters=opt_iters,
                   n_window=n_window, gp=gp)

    def body(st, inp):
        rn, qbn, t, cx, cv, sx, sv, ox, ov, rp, mf, lf = inp

        def do_map(st):
            new_st, _, _, metrics = step(st, rn, qbn, t, cx, cv, sx, sv,
                                         ox, ov, rp)
            return new_st, metrics

        def skip_map(st):
            out_sd = jax.eval_shape(do_map, st)
            return st, jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, x.dtype), out_sd[1])

        st, metrics = jax.lax.cond(mf, do_map, skip_map, st)

        def do_loop(st):
            return loop(st, t)

        def skip_loop(st):
            out_sd = jax.eval_shape(do_loop, st)
            return st, jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, x.dtype), out_sd[1])

        if cfg.loop_closure_enabled and cfg.loop_attempts:
            st, info = jax.lax.cond(lf, do_loop, skip_loop, st)
        else:
            # static gate: window-no-loop and radius modes never fire loop
            # attempts (plan_chunk emits all-False flags), so don't compile
            # the loop program into the chunk step at all
            st, info = skip_loop(st)
        pos, quat = warm_start(st, rn.astype(st.bef_pos.dtype),
                               qbn.astype(st.bef_quat.dtype))
        return st, (pos, quat, st.aft_pos, st.aft_quat, metrics, info)

    state, outs = jax.lax.scan(
        body, state, (rns, qbns, ts, cxyz, cval, sxyz, sval, oxyz, oval,
                      imu_rp, map_flags, loop_flags))
    return state, outs


def imu_roll_pitch(acc, gravity: float):
    """Host-side roll/pitch from a raw accelerometer sample (the stand-in
    for the reference mapping node's AHRS-orientation IMU queue,
    lidar_mapping_node.cpp:726-735; same math as calculateRPfromGravity)."""
    acc = np.asarray(acc, float)
    sz = np.sign(acc[2]) or 1.0
    pitch = -sz * np.arcsin(np.clip(acc[0] / gravity, -1.0, 1.0))
    roll = sz * np.arcsin(np.clip(acc[1] / gravity, -1.0, 1.0))
    return np.asarray([roll, pitch])


_NO_IMU_RP = np.full(2, np.nan)


class LinsMapper:
    """Host driver for the mapping backend."""

    def __init__(self, cfg: SlamConfig, corner_cap=None, surf_cap=None,
                 outlier_cap=None, n_window=None, map_corner_cap=None,
                 map_surf_cap=None, submap_cap=None, cloud_cap=None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        corner_cap, surf_cap, outlier_cap = derive_caps(
            cfg, corner_cap, surf_cap, outlier_cap)
        # loop-closure submap / current-cloud capacities scale with the
        # per-keyframe cloud caps (VLP-16 reproduces the former hardcoded
        # 16384/8192; TINY-class presets compile much smaller programs)
        submap_cap = submap_cap or min(16384, 4 * (corner_cap + surf_cap))
        cloud_cap = cloud_cap or min(8192, 2 * (corner_cap + surf_cap))
        self.caps = (corner_cap, surf_cap, outlier_cap)
        n_window = n_window or cfg.surrounding_keyframe_search_num
        self.n_window = n_window
        # map_*_cap kwargs (legacy local-map assembly capacities) now size
        # the cached grid hash tables
        gp = lmn.grid_params(cfg)
        if map_corner_cap:
            gp = gp._replace(corner_table=max(1024, map_corner_cap // 4))
        if map_surf_cap:
            gp = gp._replace(surf_table=max(2048, map_surf_cap // 4))
        self.gp = gp
        self.state = init_mapper(cfg, corner_cap, surf_cap, outlier_cap,
                                 n_window, gp, dtype)
        self.last_time = -np.inf
        self.metrics = []
        self.trajectory = []
        self._step = jax.jit(partial(
            _mapping_step_impl, cfg=cfg, corner_cap=corner_cap,
            surf_cap=surf_cap, outlier_cap=outlier_cap,
            n_window=n_window, gp=gp))
        self._loop_step = jax.jit(partial(
            _loop_step_impl, cfg=cfg, submap_cap=submap_cap,
            cloud_cap=cloud_cap, opt_iters=8, n_window=n_window, gp=gp))
        self._chunk_step = jax.jit(partial(
            _mapping_chunk_impl, cfg=cfg, corner_cap=corner_cap,
            surf_cap=surf_cap, outlier_cap=outlier_cap, n_window=n_window,
            gp=gp, submap_cap=submap_cap, cloud_cap=cloud_cap, opt_iters=8))
        self.last_loop_time = -np.inf
        self.loop_info = []
        self._shard_mesh = None

    def shard_store_over(self, mesh, axis: str = "seq"):
        """P3: pin the keyframe store sharded along the KEYFRAME axis over
        `mesh` (parallel/shard_map_store.py) and keep it there — every
        step's output store is re-pinned, so the window assembly /
        rebuilds run with XLA-inserted gather collectives while the
        pipeline itself is unchanged (sharded and single-device runs are
        trajectory-identical; tests/test_parallel.py)."""
        self._shard_mesh = (mesh, axis)
        self._repin()

    def _repin(self):
        if self._shard_mesh is None:
            return
        from lins_tpu.parallel.shard_map_store import shard_store
        mesh, axis = self._shard_mesh
        self.state = self.state._replace(
            store=shard_store(self.state.store, mesh, axis))

    def _scan_sds(self, cloud_dtype, chunk=None):
        cd = cloud_dtype or self.dtype
        cfg = self.cfg

        def mk(shape, dt):
            s = ((chunk,) + shape) if chunk else shape
            return jax.ShapeDtypeStruct(s, dt)

        return (mk((3,), cd), mk((4,), cd), mk((), self.dtype),
                mk((cfg.max_less_sharp, 3), cd),
                mk((cfg.max_less_sharp,), jnp.bool_),
                mk((cfg.max_less_flat, 3), cd),
                mk((cfg.max_less_flat,), jnp.bool_),
                mk((cfg.max_outlier, 3), cd),
                mk((cfg.max_outlier,), jnp.bool_),
                mk((2,), cd))

    def warmup(self, cloud_dtype=None, chunk: int | None = None):
        """AOT-compile the mapping + loop-closure programs up front (see
        LinsOdometry.warmup — mid-stream compiles can wedge the remote TPU
        relay; with the persistent cache this is fast on later runs).

        cloud_dtype: dtype of the incoming odometry poses/clouds (the
        odometry driver's dtype; defaults to this mapper's dtype).
        chunk: also compile the K-scan chunked program (replay mode)."""
        sds = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.state)
        args = self._scan_sds(cloud_dtype)
        self._step.lower(sds, *args).compile()
        t = jax.ShapeDtypeStruct((), self.dtype)
        if self.cfg.loop_closure_enabled and self.cfg.loop_attempts:
            self._loop_step.lower(sds, t).compile()
        if chunk:
            p3, q4, _, cx, cv, sx, sv, ox, ov, rp = self._scan_sds(
                cloud_dtype, chunk)
            ts_k = jax.ShapeDtypeStruct((chunk,), jnp.float32)
            flag = jax.ShapeDtypeStruct((chunk,), jnp.bool_)
            self._chunk_step.lower(sds, p3, q4, ts_k, cx, cv, sx, sv,
                                   ox, ov, rp, flag, flag).compile()

    def process(self, time: float, odo_pos, odo_quat,
                corner_xyz, corner_valid, surf_xyz, surf_valid,
                outl_xyz=None, outl_valid=None, imu_rp=None, time_dev=None):
        """Feed one odometry result + its scan clouds (body frame).

        time: host float (cadence gating).  time_dev: optional device scalar
        of the same time — pass it in replay mode so this issues no
        host->device transfer (transfers serialize against queued compute on
        remote-attached TPUs).  imu_rp: optional (roll, pitch) from the raw
        IMU at scan time (imu_roll_pitch); NaN disables the blend.
        Returns (pos, quat) of the refined pose, or None when throttled.
        """
        if time - self.last_time < self.cfg.mapping_process_interval:
            return None
        self.last_time = time
        t_dev = (jnp.asarray(time, self.dtype) if time_dev is None
                 else time_dev.astype(self.dtype))
        if outl_xyz is None:
            outl_xyz = jnp.zeros((self.cfg.max_outlier, 3), self.dtype)
            outl_valid = jnp.zeros((self.cfg.max_outlier,), bool)
        rp = jnp.asarray(_NO_IMU_RP if imu_rp is None else imu_rp,
                         self.dtype)
        (self.state, t_m, q_m, metrics) = self._step(
            self.state, jnp.asarray(odo_pos), jnp.asarray(odo_quat),
            t_dev, corner_xyz, corner_valid,
            surf_xyz, surf_valid, outl_xyz, outl_valid, rp)
        self.metrics.append(metrics)
        self.trajectory.append((time, t_m, q_m))
        self._repin()
        return t_m, q_m

    def plan_chunk(self, ts_host):
        """Host-side cadence gating for a chunk of scan times: which scans
        get a mapping step / loop attempt.  Mirrors (and advances) the
        same last_time/last_loop_time bookkeeping as process /
        maybe_close_loop, so streaming and chunked runs see identical
        cadences.  Returns (map_flags, loop_flags) as host bool arrays."""
        mf = np.zeros(len(ts_host), bool)
        lf = np.zeros(len(ts_host), bool)
        for i, t in enumerate(ts_host):
            t = float(t)
            if t - self.last_time >= self.cfg.mapping_process_interval:
                mf[i] = True
                self.last_time = t
            if (self.cfg.loop_closure_enabled and self.cfg.loop_attempts
                    and t - self.last_loop_time >= 1.0):
                lf[i] = True
                self.last_loop_time = t
        return mf, lf

    def process_chunk(self, ts_host, rns, qbns, clouds, ts_dev,
                      map_flags, loop_flags, flags_dev, imu_rp_dev=None):
        """Mapping + loop closure at their cadences over a K-scan chunk of
        odometry outputs, in ONE device dispatch (_mapping_chunk_impl);
        returns the fused high-rate (pos (K,3), quat (K,4)) blocks.

        ts_host/map_flags/loop_flags: host arrays from plan_chunk (which
        already advanced the gate bookkeeping); ts_dev/flags_dev: the same
        values staged on device up front (mid-stream host->device transfers
        serialize against queued compute on remote-attached TPUs).
        imu_rp_dev: optional (K, 2) staged raw-IMU roll/pitch per scan.
        """
        mf_dev, lf_dev = flags_dev
        K = len(ts_host)
        if imu_rp_dev is None:
            imu_rp_dev = jnp.broadcast_to(
                jnp.asarray(_NO_IMU_RP, self.dtype), (K, 2))
        self.state, (pos, quat, aft_p, aft_q, metrics, infos) = \
            self._chunk_step(self.state, rns, qbns, ts_dev,
                             clouds["cxyz"], clouds["cval"],
                             clouds["sxyz"], clouds["sval"],
                             clouds["oxyz"], clouds["oval"],
                             imu_rp_dev, mf_dev, lf_dev)
        metric_rows = {k: LazyRows(v) for k, v in metrics.items()}
        info_rows = {k: LazyRows(v) for k, v in infos.items()}
        aft_rows_p, aft_rows_q = LazyRows(aft_p), LazyRows(aft_q)
        for i, t in enumerate(ts_host):
            if map_flags[i]:
                self.metrics.append(ChunkMetrics(metric_rows, i))
                self.trajectory.append((float(t), aft_rows_p.row(i),
                                        aft_rows_q.row(i)))
            if loop_flags[i]:
                self.loop_info.append(ChunkMetrics(info_rows, i))
        self._repin()
        return pos, quat

    def maybe_close_loop(self, time: float, time_dev=None):
        """Attempt loop closure at ~1 Hz (loopClosureThread cadence,
        lidar_mapping_node.cpp:1033-1041).  Returns the info dict or None."""
        if not (self.cfg.loop_closure_enabled and self.cfg.loop_attempts):
            return None
        if time - self.last_loop_time < 1.0:
            return None
        self.last_loop_time = time
        t_dev = (jnp.asarray(time, self.dtype) if time_dev is None
                 else time_dev.astype(self.dtype))
        self.state, info = self._loop_step(self.state, t_dev)
        self.loop_info.append(info)
        self._repin()
        return info

    def final_solve(self):
        """Pose-graph solve + rewrite over all accumulated edges (see
        _final_solve_impl).  Call once at end of run, before exporting the
        keyframe trajectory / global map.  No-op outside recent-window
        (loop-closure) mode."""
        if not self.cfg.loop_closure_enabled:
            return
        self.state = jax.jit(partial(
            _final_solve_impl, cfg=self.cfg, opt_iters=8,
            n_window=self.n_window, gp=self.gp))(self.state)
        self._repin()

    def rebuild_local_map(self):
        """Reconstruct the derived local-map caches (voxel maps + eviction
        deltas) from the keyframe store — after load_state (checkpoints do
        not serialize the ~200 MB derived lmap) or any external store edit.
        Radius mode defers to the next mapping step's selection (a fresh
        sel=-1 forces the rebuild there)."""
        fresh = lmn.empty_local_map(self.cfg, self.n_window, *self.caps,
                                    self.dtype, self.gp)
        if self.cfg.loop_closure_enabled and self.cfg.lc_map_mode != "radius":
            # radius-selected maps (either mode) defer to the next mapping
            # step's selection — fresh sel=-1 forces the rebuild there
            ids, ok, wslots = lmn.recent_window_ids(self.state.store,
                                                    self.n_window)
            fresh = jax.jit(lmn.rebuild_window, static_argnames=("gp",))(
                fresh, self.state.store, ids, ok, wslots, self.gp)
        self.state = self.state._replace(lmap=fresh)

    def correction(self):
        """Latest (bef, aft) odometry->map correction for high-rate fusion."""
        return (self.state.bef_pos, self.state.bef_quat,
                self.state.aft_pos, self.state.aft_quat)
