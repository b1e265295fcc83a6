"""Mapping backend driver (reference C19-C21: lidar_mapping_node.cpp main
loop without the ROS plumbing).

Per mapped scan (throttled to mapping_process_interval like the reference's
0.3 s gate, lidar_mapping_node.cpp:1821):
  1. warm-start pose = last map correction ∘ new odometry pose
     (transformAssociateToMap, :411-536 — quaternion compose instead of the
     hand-expanded Euler algebra)
  2. voxel-downsample the scan's corner/surf clouds (:1326-1349)
  3. assemble the local map from recent keyframes (:1201-1324)
  4. scan-to-map GN refinement (:1635-1652)
  5. roll/pitch blend with the odometry attitude (transformUpdate :538-577)
  6. keyframe gating at 0.3 m (:1660-1667) + store update
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
from lins_tpu.mapping.scan2map import scan_to_map
from lins_tpu.ops.voxel import voxel_downsample


class MapperState(NamedTuple):
    store: kf.KeyframeStore
    bef_pos: jnp.ndarray   # odometry pose at last correction
    bef_quat: jnp.ndarray
    aft_pos: jnp.ndarray   # refined pose at last correction
    aft_quat: jnp.ndarray
    edges: "pg.EdgeSet"    # pose-graph factors (odometry + loop)
    n_loops: jnp.ndarray   # scalar int32


def derive_caps(cfg: SlamConfig, corner_cap=None, surf_cap=None,
                map_corner_cap=None, map_surf_cap=None):
    """Capacity defaults scaled from the sensor preset (all overridable).

    Per-keyframe clouds are the odometry feature sets voxel-downsampled at
    the map leaf sizes (roughly halves/keeps them); the local map is a
    50-keyframe window voxel-filtered again, so 32x/16x the per-keyframe
    cap bounds it with margin.  For the VLP-16 preset these reproduce the
    hand-tuned 1024/4096/32768/65536; smaller presets scale down instead of
    paying VLP-16-sized NN matrices in the scan-to-map GN.
    """
    corner_cap = corner_cap or max(256, cfg.max_less_sharp // 2)
    surf_cap = surf_cap or max(1024, (cfg.max_less_flat * 2) // 3)
    map_corner_cap = map_corner_cap or min(32768, 32 * corner_cap)
    map_surf_cap = map_surf_cap or min(65536, 16 * surf_cap)
    return corner_cap, surf_cap, map_corner_cap, map_surf_cap


def init_mapper(cfg: SlamConfig, corner_cap=1024, surf_cap=4096,
                dtype=jnp.float32) -> MapperState:
    z = jnp.zeros(3, dtype)
    e = so3.quat_identity(dtype)
    return MapperState(store=kf.empty_store(cfg, corner_cap, surf_cap, dtype),
                       bef_pos=z, bef_quat=e, aft_pos=z, aft_quat=e,
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
                       cfg: SlamConfig, corner_cap: int, surf_cap: int,
                       n_window: int, map_corner_cap: int, map_surf_cap: int):
    dtype = state.bef_pos.dtype
    odo_pos = odo_pos.astype(dtype)
    odo_quat = odo_quat.astype(dtype)

    t_w, q_w = warm_start(state, odo_pos, odo_quat)

    # downsample the current scan (body frame)
    c_ds, c_ok = voxel_downsample(corner_xyz.astype(dtype), corner_valid,
                                  cfg.map_corner_leaf, corner_cap)
    s_ds, s_ok = voxel_downsample(surf_xyz.astype(dtype), surf_valid,
                                  cfg.map_surf_leaf, surf_cap)

    has_map = state.store.count > 0

    def refine(_):
        center = state.store.count - 1
        cm, cmv, sm, smv = kf.assemble_local_map(
            state.store, center, n_window, map_corner_cap, map_surf_cap,
            cfg.map_corner_leaf, cfg.map_surf_leaf)
        t, q, iters, n_sel = scan_to_map(
            t_w, q_w, c_ds, c_ok, s_ds, s_ok, cm, cmv, sm, smv, cfg)
        return t, q, iters, n_sel

    def first(_):
        return t_w, q_w, jnp.int32(0), jnp.int32(0)

    t_m, q_m, iters, n_sel = jax.lax.cond(has_map, refine, first, None)

    # roll/pitch blend with the odometry attitude (transformUpdate)
    rpy_m = so3.quat_to_rpy(q_m)
    rpy_o = so3.quat_to_rpy(odo_quat)
    blended = jnp.stack([
        0.998 * rpy_m[0] + 0.002 * rpy_o[0],
        0.998 * rpy_m[1] + 0.002 * rpy_o[1],
        rpy_m[2]])
    q_m = so3.rpy_to_quat(blended)

    # keyframe gate: 0.3 m from the previous keyframe (or always for the 1st)
    last_i = jnp.maximum(state.store.count - 1, 0)
    last_pos = state.store.pos[last_i]
    dist = jnp.linalg.norm(t_m - last_pos)
    add = (~has_map) | (dist > cfg.keyframe_gate_meters)

    new_store = kf.add_keyframe(state.store, t_m, q_m, time,
                                c_ds, c_ok, s_ds, s_ok)
    store = jax.tree_util.tree_map(
        lambda a, b: jnp.where(add, a, b), new_store, state.store)

    # odometry between-factor prev_kf -> new_kf
    # (saveKeyFramesAndFactor, lidar_mapping_node.cpp:1693-1703;
    #  variances 1e-6 rot / ~1e-6 trans, :383-385)
    prev_i = jnp.maximum(state.store.count - 1, 0)
    t_rel, q_rel = pg.relative_pose(state.store.pos[prev_i],
                                    state.store.quat[prev_i], t_m, q_m)
    new_edges = pg.add_edge(state.edges, prev_i, state.store.count,
                            t_rel, q_rel, 1.0 / cfg.pg_odom_rot_var,
                            1.0 / cfg.pg_odom_pos_var)
    edges = jax.tree_util.tree_map(
        lambda a, b: jnp.where(add & has_map, a, b), new_edges, state.edges)

    new_state = MapperState(store=store, bef_pos=odo_pos, bef_quat=odo_quat,
                            aft_pos=t_m, aft_quat=q_m, edges=edges,
                            n_loops=state.n_loops)
    metrics = dict(iters=iters, n_matches=n_sel, keyframe_added=add,
                   warm_dist=jnp.linalg.norm(t_m - t_w))
    return new_state, t_m, q_m, metrics


def _loop_step_impl(state: MapperState, time, cfg: SlamConfig,
                    submap_cap: int, cloud_cap: int, opt_iters: int):
    """One loop-closure attempt + (on accept) pose-graph re-solve and
    keyframe pose rewrite (performLoopClosure + correctPoses,
    lidar_mapping_node.cpp:1114-1186, 1767-1795)."""
    cur = jnp.maximum(state.store.count - 1, 0)
    enough = state.store.count > 2
    idx, found, accepted, t_rel, q_rel, fitness = lc.try_close_loop(
        state.store, cur, time, cfg, submap_cap, cloud_cap)
    accepted = accepted & enough

    def apply(_):
        var = jnp.maximum(fitness * cfg.pg_loop_var_scale,
                          jnp.asarray(1e-6, fitness.dtype))
        w = 1.0 / var
        edges = pg.add_edge(state.edges, idx, cur, t_rel, q_rel, w, w)
        pos, quat = pg.optimize(state.store.pos, state.store.quat,
                                state.store.count, edges, opt_iters)
        store = kf.set_poses(state.store, pos, quat)
        return state._replace(store=store, edges=edges,
                              aft_pos=pos[cur], aft_quat=quat[cur],
                              n_loops=state.n_loops + 1)

    new_state = jax.lax.cond(accepted, apply, lambda _: state, None)
    info = dict(found=found, accepted=accepted, fitness=fitness, matched=idx)
    return new_state, info


def _mapping_chunk_impl(state: MapperState, rns, qbns, ts,
                        cxyz, cval, sxyz, sval, map_flags, loop_flags,
                        cfg: SlamConfig, corner_cap: int, surf_cap: int,
                        n_window: int, map_corner_cap: int,
                        map_surf_cap: int, submap_cap: int, cloud_cap: int,
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
                   surf_cap=surf_cap, n_window=n_window,
                   map_corner_cap=map_corner_cap,
                   map_surf_cap=map_surf_cap)
    loop = partial(_loop_step_impl, cfg=cfg, submap_cap=submap_cap,
                   cloud_cap=cloud_cap, opt_iters=opt_iters)

    def body(st, inp):
        rn, qbn, t, cx, cv, sx, sv, mf, lf = inp

        def do_map(st):
            new_st, _, _, metrics = step(st, rn, qbn, t, cx, cv, sx, sv)
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

        st, info = jax.lax.cond(lf, do_loop, skip_loop, st)
        pos, quat = warm_start(st, rn.astype(st.bef_pos.dtype),
                               qbn.astype(st.bef_quat.dtype))
        return st, (pos, quat, st.aft_pos, st.aft_quat, metrics, info)

    state, outs = jax.lax.scan(
        body, state, (rns, qbns, ts, cxyz, cval, sxyz, sval,
                      map_flags, loop_flags))
    return state, outs


class LinsMapper:
    """Host driver for the mapping backend."""

    def __init__(self, cfg: SlamConfig, corner_cap=None, surf_cap=None,
                 n_window=None, map_corner_cap=None, map_surf_cap=None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        corner_cap, surf_cap, map_corner_cap, map_surf_cap = derive_caps(
            cfg, corner_cap, surf_cap, map_corner_cap, map_surf_cap)
        self.state = init_mapper(cfg, corner_cap, surf_cap, dtype)
        self.last_time = -np.inf
        self.metrics = []
        self.trajectory = []
        self._step = jax.jit(partial(
            _mapping_step_impl, cfg=cfg, corner_cap=corner_cap,
            surf_cap=surf_cap,
            n_window=n_window or cfg.surrounding_keyframe_search_num,
            map_corner_cap=map_corner_cap, map_surf_cap=map_surf_cap))
        self._loop_step = jax.jit(partial(
            _loop_step_impl, cfg=cfg, submap_cap=16384, cloud_cap=8192,
            opt_iters=8))
        self._chunk_step = jax.jit(partial(
            _mapping_chunk_impl, cfg=cfg, corner_cap=corner_cap,
            surf_cap=surf_cap,
            n_window=n_window or cfg.surrounding_keyframe_search_num,
            map_corner_cap=map_corner_cap, map_surf_cap=map_surf_cap,
            submap_cap=16384, cloud_cap=8192, opt_iters=8))
        self.last_loop_time = -np.inf
        self.loop_info = []

    def warmup(self, cloud_dtype=None, chunk: int | None = None):
        """AOT-compile the mapping + loop-closure programs up front (see
        LinsOdometry.warmup — mid-stream compiles can wedge the remote TPU
        relay; with the persistent cache this is fast on later runs).

        cloud_dtype: dtype of the incoming odometry poses/clouds (the
        odometry driver's dtype; defaults to this mapper's dtype).
        chunk: also compile the K-scan chunked program (replay mode)."""
        cd = cloud_dtype or self.dtype
        sds = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.state)
        p3 = jax.ShapeDtypeStruct((3,), cd)
        q4 = jax.ShapeDtypeStruct((4,), cd)
        t = jax.ShapeDtypeStruct((), self.dtype)
        cx = jax.ShapeDtypeStruct((self.cfg.max_less_sharp, 3), cd)
        cv = jax.ShapeDtypeStruct((self.cfg.max_less_sharp,), jnp.bool_)
        sx = jax.ShapeDtypeStruct((self.cfg.max_less_flat, 3), cd)
        sv = jax.ShapeDtypeStruct((self.cfg.max_less_flat,), jnp.bool_)
        self._step.lower(sds, p3, q4, t, cx, cv, sx, sv).compile()
        if self.cfg.loop_closure_enabled:
            self._loop_step.lower(sds, t).compile()
        if chunk:
            def k(s):
                return jax.ShapeDtypeStruct((chunk,) + s.shape, s.dtype)
            ts_k = jax.ShapeDtypeStruct((chunk,), jnp.float32)
            flag = jax.ShapeDtypeStruct((chunk,), jnp.bool_)
            self._chunk_step.lower(sds, k(p3), k(q4), ts_k, k(cx), k(cv),
                                   k(sx), k(sv), flag, flag).compile()

    def process(self, time: float, odo_pos, odo_quat,
                corner_xyz, corner_valid, surf_xyz, surf_valid,
                time_dev=None):
        """Feed one odometry result + its scan clouds (body frame).

        time: host float (cadence gating).  time_dev: optional device scalar
        of the same time — pass it in replay mode so this issues no
        host->device transfer (transfers serialize against queued compute on
        remote-attached TPUs).
        Returns (pos, quat) of the refined pose, or None when throttled.
        """
        if time - self.last_time < self.cfg.mapping_process_interval:
            return None
        self.last_time = time
        t_dev = (jnp.asarray(time, self.dtype) if time_dev is None
                 else time_dev.astype(self.dtype))
        (self.state, t_m, q_m, metrics) = self._step(
            self.state, jnp.asarray(odo_pos), jnp.asarray(odo_quat),
            t_dev, corner_xyz, corner_valid,
            surf_xyz, surf_valid)
        self.metrics.append(metrics)
        self.trajectory.append((time, t_m, q_m))
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
            if (self.cfg.loop_closure_enabled
                    and t - self.last_loop_time >= 1.0):
                lf[i] = True
                self.last_loop_time = t
        return mf, lf

    def process_chunk(self, ts_host, rns, qbns, clouds, ts_dev,
                      map_flags, loop_flags, flags_dev):
        """Mapping + loop closure at their cadences over a K-scan chunk of
        odometry outputs, in ONE device dispatch (_mapping_chunk_impl);
        returns the fused high-rate (pos (K,3), quat (K,4)) blocks.

        ts_host/map_flags/loop_flags: host arrays from plan_chunk (which
        already advanced the gate bookkeeping); ts_dev/flags_dev: the same
        values staged on device up front (mid-stream host->device transfers
        serialize against queued compute on remote-attached TPUs).
        """
        mf_dev, lf_dev = flags_dev
        self.state, (pos, quat, aft_p, aft_q, metrics, infos) = \
            self._chunk_step(self.state, rns, qbns, ts_dev,
                             clouds["cxyz"], clouds["cval"],
                             clouds["sxyz"], clouds["sval"], mf_dev, lf_dev)
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
        return pos, quat

    def maybe_close_loop(self, time: float, time_dev=None):
        """Attempt loop closure at ~1 Hz (loopClosureThread cadence,
        lidar_mapping_node.cpp:1033-1041).  Returns the info dict or None."""
        if not self.cfg.loop_closure_enabled:
            return None
        if time - self.last_loop_time < 1.0:
            return None
        self.last_loop_time = time
        t_dev = (jnp.asarray(time, self.dtype) if time_dev is None
                 else time_dev.astype(self.dtype))
        self.state, info = self._loop_step(self.state, t_dev)
        self.loop_info.append(info)
        return info

    def correction(self):
        """Latest (bef, aft) odometry->map correction for high-rate fusion."""
        return (self.state.bef_pos, self.state.bef_quat,
                self.state.aft_pos, self.state.aft_quat)
