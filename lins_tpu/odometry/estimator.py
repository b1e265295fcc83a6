"""LINS odometry estimator: state machine + fused per-scan jit steps
(reference C16-C18: StateEstimator.hpp:279-463 + Estimator.cpp:204-284).

Host-side driver streams pre-decoded arrays (no ROS); each scan triggers at
most three compiled regions: front-end, IMU propagation (lax.scan), and the
fused IESKF/GN update step.  The YZX re-publishing convention of the reference
(StateEstimator.hpp:1116-1161) is dropped — the whole engine stays in XYZ.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lins_tpu.config import SlamConfig
from lins_tpu.utils.lazy import ChunkMetrics as _ChunkMetrics
from lins_tpu.utils.lazy import LazyRows as _LazyRows
from lins_tpu.frontend import ScanFeatures, make_frontend
from lins_tpu.geom import so3
from lins_tpu.imu import eskf
from lins_tpu.imu import preintegration as pre
from lins_tpu.odometry import association as assoc
from lins_tpu.odometry import gn_icp, ieskf

STATUS_INIT = 0
STATUS_FIRST_SCAN = 1
STATUS_RUNNING = 3


class NominalState(NamedTuple):
    """Global (world-frame) state (GlobalState without covariance)."""

    rn: jnp.ndarray
    vn: jnp.ndarray
    qbn: jnp.ndarray
    ba: jnp.ndarray
    bw: jnp.ndarray
    gn: jnp.ndarray


def identity_nominal(cfg: SlamConfig, dtype=jnp.float64) -> NominalState:
    z = jnp.zeros(3, dtype)
    return NominalState(rn=z, vn=z, qbn=so3.quat_identity(dtype), ba=z, bw=z,
                        gn=jnp.asarray([0, 0, -cfg.gravity], dtype))


def _feature_ref(fc, dtype):
    """Reference-set dict for association."""
    return dict(xyz=fc.xyz.astype(dtype), ring=fc.ring, valid=fc.valid)


def _transform_ref(fc, rel, rn, qbn):
    """transformToEnd a feature cloud (updatePointCloud,
    StateEstimator.hpp:1116-1161)."""
    return assoc.transform_to_end(fc.xyz, rel, rn, qbn)


def running_step_impl(filter_state: eskf.FilterState,
                      global_state: NominalState,
                      feats: ScanFeatures, last_surf, last_corner,
                      dts, accs, gyrs, imu_valid, cfg: SlamConfig):
    """STATUS_RUNNING per-scan step: propagate -> IESKF (-> GN fallback) ->
    global composition -> robocentric reset -> feature re-anchoring.

    Mirrors processPointClouds + processScan (Estimator.cpp:204-252,
    StateEstimator.hpp:435-463).
    """
    dtype = filter_state.rn.dtype

    # 1) IMU propagation across the inter-scan batch
    fs = eskf.propagate(filter_state, dts, accs, gyrs, imu_valid, cfg)

    # 2) insufficient-feature rejection (StateEstimator.hpp:436-439)
    enough = ((jnp.sum(feats.less_sharp.valid) > 5)
              & (jnp.sum(feats.less_flat.valid) > 10))

    # 3) iterated ESKF update
    res = ieskf.update(fs, feats.flat, feats.sharp, last_surf, last_corner, cfg)

    # 4) divergence fallback: GN ICP from the propagated pose
    #    (StateEstimator.hpp:585-592)
    def fallback(_):
        rn, qbn, _ = gn_icp.estimate_transform(
            fs.rn, fs.qbn, feats.flat, feats.sharp, last_surf, last_corner,
            cfg)
        return res.state._replace(rn=rn, qbn=qbn, P=fs.P)

    upd = jax.lax.cond(res.diverged, fallback, lambda _: res.state, None)
    # if not enough features, skip the measurement update entirely
    upd = jax.tree_util.tree_map(
        lambda a, b: jnp.where(enough, a, b), upd, fs)

    rel_rn, rel_qbn = upd.rn, upd.qbn

    # 5) compose into the global frame (integrateTransformation,
    #    StateEstimator.hpp:608-617) — order matters
    g_qbn_new = so3.quat_normalize(so3.quat_mul(global_state.qbn, rel_qbn))
    g = NominalState(
        rn=so3.quat_rotate(global_state.qbn, rel_rn) + global_state.rn,
        qbn=g_qbn_new,
        vn=so3.quat_rotate(so3.quat_mul(g_qbn_new, so3.quat_inv(rel_qbn)),
                           upd.vn),
        ba=upd.ba, bw=upd.bw,
        gn=so3.quat_rotate(g_qbn_new, upd.gn))

    # 6) robocentric reset + gravity-based roll/pitch correction
    #    (StateEstimator.hpp:444-453)
    fs_reset = eskf.reset_relative(upd, cfg)
    roll, pitch = eskf.calculate_rp_from_gravity(upd.gn, cfg.gravity)
    rpy = so3.quat_to_rpy(g.qbn)
    q_corr = so3.rpy_to_quat(jnp.stack([roll, pitch, rpy[2]]))
    g = g._replace(qbn=q_corr)

    # 7) re-anchor current features into this scan's end frame for the next
    #    association (updatePointCloud, StateEstimator.hpp:1116-1161)
    ls, lf = feats.less_sharp, feats.less_flat
    new_corner = dict(
        xyz=assoc.transform_to_end(ls.xyz.astype(dtype),
                                   ls.rel_time.astype(dtype), rel_rn, rel_qbn),
        ring=ls.ring, valid=ls.valid)
    new_surf = dict(
        xyz=assoc.transform_to_end(lf.xyz.astype(dtype),
                                   lf.rel_time.astype(dtype), rel_rn, rel_qbn),
        ring=lf.ring, valid=lf.valid)

    # keep previous reference sets when the new scan is too sparse
    # (StateEstimator.hpp:1156-1160)
    keep = ((jnp.sum(ls.valid) >= 5) & (jnp.sum(lf.valid) >= 20))

    def sel(new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(keep, a, b), new, old)

    metrics = dict(iters=res.iters, n_surf=res.n_surf, n_corner=res.n_corner,
                   residual=res.residual_norm, diverged=res.diverged,
                   enough=enough)
    # outlier cloud passed through RAW for the mapping backend — the
    # reference deliberately skips transformToEnd for it
    # (updatePointCloud, StateEstimator.hpp:1141-1143 commented out)
    outl = dict(xyz=feats.outlier.xyz.astype(dtype),
                valid=feats.outlier.valid)
    return (fs_reset, g, sel(new_surf, last_surf), sel(new_corner, last_corner),
            rel_rn, rel_qbn, metrics, outl)


running_step = jax.jit(running_step_impl, static_argnames=("cfg",))


def full_scan_step_impl(filter_state, global_state, last_surf, last_corner,
                        xyz, n_points, dts, accs, gyrs, imu_valid,
                        cfg: SlamConfig):
    """Entire RUNNING-state per-scan path in ONE compiled region:
    front-end + propagation + IESKF + composition + re-anchoring.

    One dispatch per scan — critical on remote-attached TPUs where each
    host->device round trip costs tens of ms, and it lets consecutive scans
    pipeline (host dispatches scan k+1 while the device runs scan k).
    """
    from lins_tpu.frontend.pipeline import process_cloud

    _, _, feats = process_cloud(xyz, n_points, cfg)
    return running_step_impl(filter_state, global_state, feats, last_surf,
                             last_corner, dts, accs, gyrs, imu_valid, cfg)


# note: no donate_argnums — the host driver keeps references to returned
# state (trajectory log), and the state pytrees are small anyway
full_scan_step = jax.jit(full_scan_step_impl, static_argnames=("cfg",))


def chunk_scan_step_impl(filter_state, global_state, last_surf, last_corner,
                         xyz_k, n_k, dts_k, accs_k, gyrs_k, imu_valid_k,
                         cfg: SlamConfig):
    """K consecutive RUNNING-state scans in ONE compiled region / dispatch.

    `lax.scan` over the fused per-scan step: the device runs the K scans
    back-to-back with no host round trip in between.  On remote-attached
    TPUs (dispatch latency ~ device time per scan) this is the throughput
    mode for replay/offline processing; the per-scan `full_scan_step`
    remains the low-latency streaming mode.  Results are bit-identical to
    K sequential full_scan_step calls (same traced body).
    """
    def body(carry, inp):
        fs, gs, lsurf, lcorn = carry
        xyz, n, dts, accs, gyrs, valid = inp
        (fs, gs, lsurf, lcorn, rel_rn, rel_qbn, metrics,
         outl) = full_scan_step_impl(
            fs, gs, lsurf, lcorn, xyz, n, dts, accs, gyrs, valid, cfg)
        # per-scan re-anchored clouds (+ raw outliers) so the mapping
        # backend can consume interior scans without host round trips
        clouds = dict(cxyz=lcorn["xyz"], cval=lcorn["valid"],
                      sxyz=lsurf["xyz"], sval=lsurf["valid"],
                      oxyz=outl["xyz"], oval=outl["valid"])
        return (fs, gs, lsurf, lcorn), (gs.rn, gs.qbn, rel_rn, rel_qbn,
                                        metrics, clouds)

    carry, outs = jax.lax.scan(
        body, (filter_state, global_state, last_surf, last_corner),
        (xyz_k, n_k, dts_k, accs_k, gyrs_k, imu_valid_k))
    return carry, outs


chunk_scan_step = jax.jit(chunk_scan_step_impl, static_argnames=("cfg",))


def chunk_rest_impl(labels_k, pre_k, filter_state, global_state, last_surf,
                    last_corner, dts_k, accs_k, gyrs_k, imu_valid_k,
                    cfg: SlamConfig):
    """Chunked split-pipeline tail: lax.scan of (frontend_post + running
    step) over K pre-labeled scans.  Pairs with a vmapped scan_pre and a
    vmapped Pallas label kernel to process K scans in 3 dispatches total
    (vs 3K for the per-scan split path) — the throughput mode on
    remote-attached TPUs where each dispatch costs ~1.5 ms."""
    from lins_tpu.frontend.pipeline import frontend_post

    def body(carry, inp):
        fs, gs, lsurf, lcorn = carry
        labels, pre, dts, accs, gyrs, valid = inp
        _, feats = frontend_post(labels, pre, cfg)
        (fs, gs, lsurf, lcorn, rel_rn, rel_qbn, metrics,
         outl) = running_step_impl(
            fs, gs, feats, lsurf, lcorn, dts, accs, gyrs, valid, cfg)
        clouds = dict(cxyz=lcorn["xyz"], cval=lcorn["valid"],
                      sxyz=lsurf["xyz"], sval=lsurf["valid"],
                      oxyz=outl["xyz"], oval=outl["valid"])
        return (fs, gs, lsurf, lcorn), (gs.rn, gs.qbn, rel_rn, rel_qbn,
                                        metrics, clouds)

    carry, outs = jax.lax.scan(
        body, (filter_state, global_state, last_surf, last_corner),
        (labels_k, pre_k, dts_k, accs_k, gyrs_k, imu_valid_k))
    return carry, outs


chunk_rest = jax.jit(chunk_rest_impl, static_argnames=("cfg",))


def _kernel_label_fits(L: int, S: int) -> bool:
    """Whether the Mosaic label kernel's per-instance scoped-VMEM stack fits
    the 16 MB limit: ~250 B/cell measured (28.6 MB at (64,1800), batch-
    independent), so 64-row sensors route to the XLA union-find instead."""
    return 250 * L * S <= 15 * 2 ** 20


@partial(jax.jit, static_argnames=("interpret",))
def _label_vmapped(e_right_k, e_down_k, eligible_k, interpret: bool):
    from lins_tpu.ops.pallas_label import label_components_pallas

    fn = partial(label_components_pallas, interpret=interpret)
    # vmap over a grid-less pallas_call keeps the WHOLE (K, L, S) batch of
    # the 3 operands + output on the Mosaic VMEM stack: 4*K*L*S*4 bytes,
    # 14.7 MB at the VLP-16 K=32 chunk (fits the 16 MB scoped limit) but
    # 29.6 MB at HDL-64 K=16 — a hard compile error (round-4 finding, the
    # first non-VLP-16 end-to-end run).  Sub-batching does NOT help: the
    # kernel's internal pointer-doubling stack is batch-independent
    # (measured 28.6 MB scoped at sub-batches of both 8 AND 4 on 64-row
    # scans), so oversized shapes route through the XLA union-find
    # propagation instead — same edges -> representative-labels contract
    # (frontend/segmentation.label_from_edges, parity-tested).
    K, L, S = eligible_k.shape
    if 4 * K * L * S * 4 <= 15 * 2 ** 20 and _kernel_label_fits(L, S):
        return jax.vmap(fn)(e_right_k, e_down_k, eligible_k)
    if L % 16 == 0 and _kernel_label_fits(16, S):
        # 64-row sensors: row-blocked Mosaic labeling + exact seam merge
        # (ops/pallas_label.label_components_blocked) — 26.7 ms/scan XLA
        # union-find was 48% of the HDL-64 pipeline (tools/r5_hdl64_prof).
        # lax.scan, not vmap, over the chunk: the blocked kernel's operand
        # residency stays one scan's blocks (whole-batch vmap residency is
        # the same 29.6 MB hard error as the monolithic kernel)
        from lins_tpu.ops.pallas_label import label_components_blocked

        def body(c, inp):
            er, ed, el = inp
            return c, label_components_blocked(er, ed, el,
                                               interpret=interpret)

        return jax.lax.scan(body, 0,
                            (e_right_k, e_down_k, eligible_k))[1]
    from lins_tpu.frontend.segmentation import label_from_edges

    return jax.vmap(label_from_edges)(e_right_k.astype(bool),
                                      e_down_k.astype(bool),
                                      eligible_k.astype(bool))


def scan_pre_impl(xyz, n_points, cfg: SlamConfig):
    from lins_tpu.frontend.pipeline import frontend_pre

    return frontend_pre(xyz, n_points, cfg)


def scan_rest_impl(labels, pre, filter_state, global_state, last_surf,
                   last_corner, dts, accs, gyrs, imu_valid, cfg: SlamConfig):
    from lins_tpu.frontend.pipeline import frontend_post

    _, feats = frontend_post(labels, pre, cfg)
    return running_step_impl(filter_state, global_state, feats, last_surf,
                             last_corner, dts, accs, gyrs, imu_valid, cfg)


scan_pre = jax.jit(scan_pre_impl, static_argnames=("cfg",))
scan_rest = jax.jit(scan_rest_impl, static_argnames=("cfg",))
@partial(jax.jit, static_argnames=("cfg",))
def scan_pre_vmap(xyz_k, n_k, cfg: SlamConfig):
    # lax.scan, not vmap: the projection scatter lowers poorly when batched
    # (measured 0.82 vs 1.00 ms/scan on TPU); outputs are identical
    def body(c, inp):
        xyz, n = inp
        return c, scan_pre_impl(xyz, n, cfg)

    return jax.lax.scan(body, 0, (xyz_k, n_k))[1]


@partial(jax.jit, static_argnames=("cfg",))
def second_scan_step(feats: ScanFeatures, last_surf, last_corner,
                     preint: pre.Preintegration, imu_acc, imu_gyr,
                     ba0, bw0, cfg: SlamConfig):
    """Two-scan bootstrap (processSecondScan, StateEstimator.hpp:379-425)."""
    dtype = preint.delta_p.dtype
    gn = jnp.asarray([0.0, 0.0, -cfg.gravity], dtype)

    ql = preint.delta_q
    pl = (preint.delta_p + 0.5 * gn * preint.sum_dt * preint.sum_dt)

    rn, qbn, _ = gn_icp.estimate_transform(
        pl, ql, feats.flat, feats.sharp, last_surf, last_corner, cfg)

    # initial velocity from relative translation (estimateInitialState,
    # StateEstimator.hpp:1408-1419); biases from config or static calibration
    v = rn / jnp.maximum(preint.sum_dt, 1e-6)
    ba0 = jnp.asarray(ba0, dtype)
    bw0 = jnp.asarray(bw0, dtype)

    roll, pitch = eskf.calculate_rp_from_gravity(imu_acc - ba0, cfg.gravity)
    g = NominalState(
        rn=rn, vn=v,
        qbn=so3.rpy_to_quat(jnp.stack([roll, pitch, jnp.asarray(0.0, dtype)])),
        ba=ba0, bw=bw0, gn=gn)

    # The reference initializes the filter with rn=r1 and qbn=I and performs
    # no robocentric reset until the *next* scan (StateEstimator.hpp:404-406),
    # which double-counts r1 in the next prior and relies on the ICP fallback
    # to recover.  We instead anchor the relative filter at identity right
    # away: init with the refined (rn, qbn), then reset(1) — so the next
    # scan's prior is pure propagation from this scan's end frame.
    fs = eskf.initial_state(cfg, rn=rn, vn=v, qbn=qbn, ba=ba0, bw=bw0,
                            acc=imu_acc, gyr=imu_gyr, dtype=dtype)
    fs = eskf.reset_relative(fs, cfg)

    new_corner = dict(
        xyz=assoc.transform_to_end(feats.less_sharp.xyz.astype(dtype),
                                   feats.less_sharp.rel_time.astype(dtype),
                                   rn, qbn),
        ring=feats.less_sharp.ring, valid=feats.less_sharp.valid)
    new_surf = dict(
        xyz=assoc.transform_to_end(feats.less_flat.xyz.astype(dtype),
                                   feats.less_flat.rel_time.astype(dtype),
                                   rn, qbn),
        ring=feats.less_flat.ring, valid=feats.less_flat.valid)
    return fs, g, new_surf, new_corner, rn, qbn


# --- single-dispatch bootstrap steps ----------------------------------------
# Every host-issued eager op costs ~45 ms over the remote TPU relay, so the
# INIT/FIRST_SCAN path is folded into three jitted programs with one host
# readback (the feature-count gate).

@partial(jax.jit, static_argnames=("cfg",))
def first_frontend(xyz, n_points, cfg: SlamConfig):
    """Front-end + the feature-count gate values in one dispatch."""
    from lins_tpu.frontend.pipeline import process_cloud

    _, _, feats = process_cloud(xyz, n_points, cfg)
    counts = jnp.stack([jnp.sum(feats.less_sharp.valid).astype(jnp.int32),
                        jnp.sum(feats.less_flat.valid).astype(jnp.int32)])
    return feats, counts


@partial(jax.jit, static_argnames=("dtype", "cfg"))
def first_scan_init(feats: ScanFeatures, t, acc0, gyr0, ba, bw, dtype,
                    cfg: SlamConfig):
    """Filter/preintegration init + reference feature sets
    (processFirstPointCloud, Estimator.cpp:145-175) in one dispatch."""
    fs = eskf.initial_state(cfg, time=t, acc=acc0, gyr=gyr0, dtype=dtype)
    preint = pre.init_preintegration(acc0, gyr0, ba, bw, dtype=dtype)
    return (fs, preint, _feature_ref(feats.less_flat, dtype),
            _feature_ref(feats.less_sharp, dtype))


@partial(jax.jit, static_argnames=("cfg",))
def second_scan_full(feats: ScanFeatures, last_surf, last_corner, preint,
                     dts, accs, gyrs, valid, acc_l, gyr_l, ba0, bw0, t,
                     cfg: SlamConfig):
    """Preintegration + the two-scan bootstrap + time stamping, fused."""
    preint = pre.preintegrate(preint, dts, accs, gyrs, valid)
    fs, g, new_surf, new_corner, rn, qbn = second_scan_step(
        feats, last_surf, last_corner, preint, acc_l, gyr_l, ba0, bw0, cfg)
    return (fs._replace(time=t), g, new_surf, new_corner, rn, qbn)


class LinsOdometry:
    """Host-side odometry driver (replaces LinsFusion, Estimator.cpp:24-348)."""

    def __init__(self, cfg: SlamConfig, dtype=None):
        self.cfg = cfg
        if dtype is None:
            # f64 filter math when x64 is on (CPU parity runs); f32 on TPU —
            # verified to hold ATE within a few mm of the f64 run
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        self.frontend = make_frontend(cfg)
        self.status = STATUS_INIT
        self.filter_state = None
        self.global_state = identity_nominal(cfg, dtype)
        self.last_surf = None
        self.last_corner = None
        self.last_outlier = None
        self.preint = None
        self.rel_pose = None
        # imu buffer (host lists)
        self._imu_t, self._imu_a, self._imu_g = [], [], []
        self._last_imu = None
        self.time = -np.inf
        self.trajectory = []   # (t, pos(3), quat wxyz(4)) per processed scan
        self.metrics = []

        mis = np.deg2rad(cfg.imu_misalign_angle)
        c, s = np.cos(mis), np.sin(mis)
        # alignIMUtoVehicle: out = R(0,0,yaw)ᵀ in (Estimator.cpp:286-292)
        self._R_mis_T = np.asarray([[c, s, 0], [-s, c, 0], [0, 0, 1]])

        # static IMU bias calibration (intended behavior of the reference's
        # commented-out performImuBiasEstimation, Estimator.cpp:322-348)
        self._calib_sum_a = np.zeros(3)
        self._calib_sum_g = np.zeros(3)
        self._calib_n = 0
        self.estimated_ba = np.asarray(cfg.init_ba, float)
        self.estimated_bw = np.asarray(cfg.init_bw, float)
        self.imu_calibrated = not cfg.calibrate_imu

    # ------------------------------------------------------------------ IMU
    def add_imu(self, t: float, acc, gyr):
        acc = self._R_mis_T @ np.asarray(acc, float)
        gyr = self._R_mis_T @ np.asarray(gyr, float)
        if not self.imu_calibrated:
            self._calib_sum_a += acc - np.asarray([0.0, 0.0, self.cfg.gravity])
            self._calib_sum_g += gyr
            self._calib_n += 1
            if self._calib_n >= self.cfg.average_nums:
                self.estimated_ba = self._calib_sum_a / self._calib_n
                self.estimated_bw = self._calib_sum_g / self._calib_n
                self.imu_calibrated = True
        self._imu_t.append(float(t))
        self._imu_a.append(acc)
        self._imu_g.append(gyr)
        self._last_imu = (acc, gyr)

    def _imu_batch(self, t_end: float):
        dts, accs, gyrs, valid = self._imu_batch_np(t_end)
        return (jnp.asarray(dts, self.dtype), jnp.asarray(accs, self.dtype),
                jnp.asarray(gyrs, self.dtype), jnp.asarray(valid))

    def _imu_batch_np(self, t_end: float):
        """Propagation steps covering (self.time, t_end], padded, as host
        numpy (mirrors the drain loop, Estimator.cpp:228-236)."""
        K = self.cfg.max_imu_per_scan
        dts = np.zeros(K)
        accs = np.zeros((K, 3))
        gyrs = np.zeros((K, 3))
        valid = np.zeros(K, bool)
        cur = self.time
        i = 0
        for t, a, g in zip(self._imu_t, self._imu_a, self._imu_g):
            if t <= cur or i >= K:
                continue
            if cur >= t_end:
                break
            step_end = min(t, t_end)
            dts[i] = step_end - cur
            accs[i] = a
            gyrs[i] = g
            valid[i] = dts[i] > 0
            cur = step_end
            i += 1
        # drop consumed imu samples
        self._drop_imu_before(min(cur, t_end) - 1e-9)
        return dts, accs, gyrs, valid

    def _drop_imu_before(self, t: float):
        keep = [k for k, tt in enumerate(self._imu_t) if tt > t]
        self._imu_t = [self._imu_t[k] for k in keep]
        self._imu_a = [self._imu_a[k] for k in keep]
        self._imu_g = [self._imu_g[k] for k in keep]

    # ----------------------------------------------------------------- scans
    def add_scan(self, t: float, xyz: np.ndarray, n_points: int):
        """Process one raw scan; returns the global pose (pos, quat) device
        arrays, or None while initializing.

        In the RUNNING state this issues exactly one device dispatch (the
        fused full_scan_step) and performs no host synchronization, so
        successive scans pipeline; call np.asarray on the returned pose (or
        read .trajectory) to materialize results.
        """
        if self.status == STATUS_RUNNING:
            dts, accs, gyrs, valid = self._imu_batch(t)
            if self.cfg.use_pallas:
                # split pipeline: XLA pre -> Mosaic label kernel -> XLA rest
                from lins_tpu.ops.pallas_label import label_components_pallas

                pre_out = scan_pre(jnp.asarray(xyz, jnp.float32),
                                   jnp.int32(n_points), self.cfg)
                L, S = self.cfg.line_num, self.cfg.scan_num
                interp = jax.default_backend() == "cpu"
                if _kernel_label_fits(L, S):
                    labels = label_components_pallas(
                        pre_out["e_right"], pre_out["e_down"],
                        pre_out["eligible"], interpret=interp)
                elif L % 16 == 0 and _kernel_label_fits(16, S):
                    # 64-row sensors: blocked kernel + exact seam merge
                    from lins_tpu.ops.pallas_label import \
                        label_components_blocked
                    labels = label_components_blocked(
                        pre_out["e_right"], pre_out["e_down"],
                        pre_out["eligible"], interpret=interp)
                else:
                    from lins_tpu.frontend.segmentation import \
                        label_from_edges
                    labels = jax.jit(label_from_edges)(
                        pre_out["e_right"], pre_out["e_down"],
                        pre_out["eligible"])
                (self.filter_state, self.global_state, self.last_surf,
                 self.last_corner, rel_rn, rel_qbn, metrics,
                 self.last_outlier) = scan_rest(
                    labels, pre_out, self.filter_state, self.global_state,
                    self.last_surf, self.last_corner, dts, accs, gyrs,
                    valid, self.cfg)
            else:
                (self.filter_state, self.global_state, self.last_surf,
                 self.last_corner, rel_rn, rel_qbn, metrics,
                 self.last_outlier) = full_scan_step(
                    self.filter_state, self.global_state, self.last_surf,
                    self.last_corner, jnp.asarray(xyz, jnp.float32),
                    jnp.int32(n_points), dts, accs, gyrs, valid, self.cfg)
            self.time = t
            self.rel_pose = (rel_rn, rel_qbn)
            self.metrics.append(metrics)  # device arrays; lazy
            self._record(t)
            return self.global_state.rn, self.global_state.qbn

        # bootstrap path: every step is ONE jitted dispatch + at most one
        # host readback (each host-issued eager op costs ~45 ms over the
        # remote TPU relay — 60+ of them made the 2-scan bootstrap slower
        # than 50 chunked scans)
        feats, counts = first_frontend(jnp.asarray(xyz, jnp.float32),
                                       jnp.int32(n_points), self.cfg)
        n_corner, n_surf = (int(v) for v in np.asarray(counts))

        if self.status == STATUS_INIT:
            if n_corner < 10 or n_surf < 100:
                return None
            if self._last_imu is None or not self.imu_calibrated:
                return None
            acc0, gyr0 = self._last_imu
            d = self.dtype
            (self.filter_state, self.preint, self.last_surf,
             self.last_corner) = first_scan_init(
                feats, np.asarray(t, d), np.asarray(acc0, d),
                np.asarray(gyr0, d), np.asarray(self.estimated_ba, d),
                np.asarray(self.estimated_bw, d), d, self.cfg)
            self.time = t
            self._drop_imu_before(t)
            self.status = STATUS_FIRST_SCAN
            return None

        if self.status == STATUS_FIRST_SCAN:
            if n_corner < 10 or n_surf < 100:
                self.status = STATUS_INIT
                return None
            dts, accs, gyrs, valid = self._imu_batch_np(t)
            acc_l, gyr_l = self._last_imu
            (self.filter_state, self.global_state, self.last_surf,
             self.last_corner, rel_rn, rel_qbn) = second_scan_full(
                feats, self.last_surf, self.last_corner, self.preint,
                dts.astype(self.dtype), accs.astype(self.dtype),
                gyrs.astype(self.dtype), valid,
                np.asarray(acc_l, self.dtype), np.asarray(gyr_l, self.dtype),
                np.asarray(self.estimated_ba, self.dtype),
                np.asarray(self.estimated_bw, self.dtype),
                np.asarray(t, self.dtype), self.cfg)
            self.time = t
            self.rel_pose = (rel_rn, rel_qbn)
            self.last_outlier = dict(xyz=feats.outlier.xyz.astype(self.dtype),
                                     valid=feats.outlier.valid)
            self.status = STATUS_RUNNING
            self._record(t)
            return self._pose()

        return None  # unreachable

    def add_scan_chunk(self, ts, xyzs, n_points, imu=None):
        """Process K consecutive scans with ONE device dispatch
        (chunk_scan_step).  Requires STATUS_RUNNING — feed the first scans
        through add_scan until it returns a pose, then switch to chunks.

        ts: (K,) scan-end times; xyzs: (K, max_points, 3); n_points: (K,).
        imu: optional prebuilt (dts, accs, gyrs, valid) device blocks from
        `prefetch_chunks(..., with_imu=True)` — with them this method issues
        NO host->device transfer (transfers serialize against queued compute
        on remote-attached TPUs).
        Appends K trajectory/metrics entries; returns the last global pose.
        """
        assert self.status == STATUS_RUNNING, "chunked mode needs RUNNING"
        K = len(ts)
        if imu is None:
            imu = self._imu_chunk_np(ts)
            imu = (jnp.asarray(imu[0], self.dtype),
                   jnp.asarray(imu[1], self.dtype),
                   jnp.asarray(imu[2], self.dtype), jnp.asarray(imu[3]))
        else:
            self.time = float(ts[-1])
        dts_k, accs_k, gyrs_k, valid_k = imu
        xyz_k = jnp.asarray(xyzs, jnp.float32)
        n_k = jnp.asarray(n_points, jnp.int32)
        state = (self.filter_state, self.global_state, self.last_surf,
                 self.last_corner)
        if self.cfg.use_pallas:
            # 3-dispatch split: vmapped pre (XLA) -> vmapped Mosaic label
            # kernel -> chunked rest (lax.scan over post + running step)
            pre_k = scan_pre_vmap(xyz_k, n_k, self.cfg)
            labels_k = _label_vmapped(
                pre_k["e_right"], pre_k["e_down"], pre_k["eligible"],
                jax.default_backend() == "cpu")
            state, (rns, qbns, rel_rns, rel_qbns, metrics, clouds) = \
                chunk_rest(labels_k, pre_k, *state, dts_k, accs_k, gyrs_k,
                           valid_k, self.cfg)
        else:
            state, (rns, qbns, rel_rns, rel_qbns, metrics, clouds) = \
                chunk_scan_step(*state, xyz_k, n_k, dts_k, accs_k, gyrs_k,
                                valid_k, self.cfg)
        (self.filter_state, self.global_state, self.last_surf,
         self.last_corner) = state
        self.rel_pose = (rel_rns[-1], rel_qbns[-1])
        # whole-chunk per-scan pose/cloud blocks, for vectorized downstream
        # consumption (LinsSlam.run_replay's mapping feed + fused output)
        self.last_chunk_poses = (rns, qbns)
        self.last_chunk_clouds = clouds
        rn_rows, qbn_rows = _LazyRows(rns), _LazyRows(qbns)
        metric_blocks = {key: _LazyRows(val) for key, val in metrics.items()}
        for k in range(K):
            self.trajectory.append((float(ts[k]), rn_rows.row(k),
                                    qbn_rows.row(k)))
            self.metrics.append(_ChunkMetrics(metric_blocks, k))
        return self.global_state.rn, self.global_state.qbn

    def warmup(self, chunk: int | None = None):
        """AOT-compile the RUNNING-state programs before streaming.

        On the remote-attached TPU relay, a large compile issued mid-stream
        (after many executions) can wedge the session; compiling everything
        up front — from the persistent cache on later runs — avoids it.
        """
        cfg = self.cfg
        xyz = jax.ShapeDtypeStruct((cfg.max_points, 3), jnp.float32)
        n = jax.ShapeDtypeStruct((), jnp.int32)
        dts = jax.ShapeDtypeStruct((cfg.max_imu_per_scan,), self.dtype)
        a3 = jax.ShapeDtypeStruct((cfg.max_imu_per_scan, 3), self.dtype)
        vv = jax.ShapeDtypeStruct((cfg.max_imu_per_scan,), jnp.bool_)
        fs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            eskf.initial_state(cfg, dtype=self.dtype))
        gs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            identity_nominal(cfg, self.dtype))

        def ref(cap):
            return dict(
                xyz=jax.ShapeDtypeStruct((cap, 3), self.dtype),
                ring=jax.ShapeDtypeStruct((cap,), jnp.int32),
                valid=jax.ShapeDtypeStruct((cap,), jnp.bool_))

        surf, corner = ref(cfg.max_less_flat), ref(cfg.max_less_sharp)
        if self.cfg.use_pallas:
            scan_pre.lower(xyz, n, cfg).compile()
            labels = jax.ShapeDtypeStruct(
                (cfg.line_num, cfg.scan_num), jnp.int32)
            pre_out = jax.eval_shape(partial(scan_pre_impl, cfg=cfg), xyz, n)
            scan_rest.lower(labels, pre_out, fs, gs, surf, corner,
                            dts, a3, a3, vv, cfg).compile()
        else:
            full_scan_step.lower(fs, gs, surf, corner, xyz, n,
                                 dts, a3, a3, vv, cfg).compile()
        if chunk:
            def k(s):
                return jax.ShapeDtypeStruct((chunk,) + s.shape, s.dtype)
            xyz_k, n_k = k(xyz), k(n)
            dts_k, a3_k, vv_k = k(dts), k(a3), k(vv)
            if self.cfg.use_pallas:
                scan_pre_vmap.lower(xyz_k, n_k, cfg).compile()
                pre_out_k = jax.eval_shape(
                    lambda x, m: scan_pre_vmap(x, m, cfg), xyz_k, n_k)
                labels_k = jax.ShapeDtypeStruct(
                    (chunk, cfg.line_num, cfg.scan_num), jnp.int32)
                chunk_rest.lower(labels_k, pre_out_k, fs, gs, surf, corner,
                                 dts_k, a3_k, a3_k, vv_k, cfg).compile()
            else:
                chunk_scan_step.lower(fs, gs, surf, corner, xyz_k, n_k,
                                      dts_k, a3_k, a3_k, vv_k, cfg).compile()

        # bootstrap programs (INIT/FIRST_SCAN path): fused front-end+counts,
        # filter init, and the two-scan initializer — otherwise the first
        # scans compile mid-stream, which can wedge the remote TPU relay
        first_frontend.lower(xyz, n, cfg).compile()
        feats_sd = jax.eval_shape(
            lambda x, m: first_frontend(x, m, cfg), xyz, n)[0]
        preint_sd = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            pre.init_preintegration(np.zeros(3), np.zeros(3), np.zeros(3),
                                    np.zeros(3), dtype=self.dtype))
        v3 = jax.ShapeDtypeStruct((3,), self.dtype)
        t0 = jax.ShapeDtypeStruct((), self.dtype)
        first_scan_init.lower(feats_sd, t0, v3, v3, v3, v3,
                              dtype=self.dtype, cfg=cfg).compile()
        second_scan_full.lower(feats_sd, surf, corner, preint_sd, dts, a3,
                               a3, vv, v3, v3, v3, v3, t0, cfg).compile()

    def _imu_chunk_np(self, ts):
        """Per-scan padded IMU batches for a chunk of scan-end times (host
        numpy); consumes the IMU buffer and advances self.time."""
        K = len(ts)
        dts = np.zeros((K, self.cfg.max_imu_per_scan))
        accs = np.zeros((K, self.cfg.max_imu_per_scan, 3))
        gyrs = np.zeros((K, self.cfg.max_imu_per_scan, 3))
        valid = np.zeros((K, self.cfg.max_imu_per_scan), bool)
        for k in range(K):
            d, a, g, v = self._imu_batch_np(float(ts[k]))
            dts[k], accs[k], gyrs[k], valid[k] = d, a, g, v
            self.time = float(ts[k])
        return dts, accs, gyrs, valid

    def prefetch_chunks(self, scan_times, xyzs, n_points, chunk: int,
                        with_imu: bool = False):
        """Stage a replay sequence on device as chunk-shaped buffers.

        On remote-attached TPUs a host->device transfer issued mid-stream
        serializes against the queued compute (measured: it more than eats
        the chunking win), so the replay path transfers all scan data up
        front — (ts, xyz (K,P,3) f32 on device, n (K,) i32 on device) per
        chunk — and the hot loop issues pure dispatches.  HBM cost:
        chunk count x K x P x 3 x 4 bytes (~0.35 MB/scan for a VLP-16).

        with_imu=True additionally drains the (already-buffered) IMU stream
        into per-chunk device blocks, appended to each tuple as a 4-tuple
        `imu=(dts, accs, gyrs, valid)` for `add_scan_chunk(..., imu=imu)` —
        zero mid-stream transfers.  Requires all IMU up to the last scan to
        be buffered; consumes it and advances self.time.
        """
        n = len(scan_times)
        out = []
        for s in range(0, n - n % chunk, chunk):
            ts = np.asarray(scan_times[s:s + chunk], float)
            xs = jax.device_put(
                np.asarray(xyzs[s:s + chunk], np.float32))
            ns = jax.device_put(
                np.asarray(n_points[s:s + chunk], np.int32))
            if with_imu:
                d, a, g, v = self._imu_chunk_np(ts)
                imu = (jax.device_put(d.astype(self.dtype)),
                       jax.device_put(a.astype(self.dtype)),
                       jax.device_put(g.astype(self.dtype)),
                       jax.device_put(v))
                out.append((ts, xs, ns, imu))
            else:
                out.append((ts, xs, ns))
        jax.block_until_ready([c[1] for c in out])
        return out

    def _pose(self):
        return (np.asarray(self.global_state.rn),
                np.asarray(self.global_state.qbn))

    def _record(self, t):
        # store device arrays without synchronizing; materialize on demand
        self.trajectory.append((t, self.global_state.rn,
                                self.global_state.qbn))

    def trajectory_arrays(self):
        """(times (N,), pos (N,3), quat (N,4)) as host numpy arrays."""
        ts = np.asarray([t for t, _, _ in self.trajectory])
        ps = np.stack([np.asarray(p) for _, p, _ in self.trajectory])
        qs = np.stack([np.asarray(q) for _, _, q in self.trajectory])
        return ts, ps, qs
