"""Multi-sequence batched replay over a device mesh (SURVEY.md §2 P4).

The reference is a single-stream pipeline; the TPU build scales throughput by
vmapping the whole per-scan odometry step over a batch of independent scan
streams and sharding the batch axis across devices with `jax.sharding`.
This is the data-parallel axis of the engine (sequences ↔ batch), used by the
benchmark harness and the multi-chip dry run.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lins_tpu.config import SlamConfig
from lins_tpu.frontend import FeatureCloud, ScanFeatures
from lins_tpu.frontend.pipeline import process_cloud
from lins_tpu.imu import eskf
from lins_tpu.odometry import estimator as est


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


def batched_scan_step(cfg: SlamConfig):
    """vmapped full per-scan step: (states..., raw scans, imu) -> states.

    Returns a function suitable for jit with sharded batch inputs.
    """

    def one(filter_state, global_state, last_surf, last_corner,
            xyz, n_points, dts, accs, gyrs, imu_valid):
        _, _, feats = process_cloud(xyz, n_points, cfg)
        (fs, g, surf, corner, rel_rn, rel_qbn, metrics,
         _outl) = est.running_step_impl(
            filter_state, global_state, feats, last_surf, last_corner,
            dts, accs, gyrs, imu_valid, cfg)
        return fs, g, surf, corner, rel_rn, rel_qbn

    return jax.vmap(one)


def make_sharded_step(cfg: SlamConfig, mesh: Mesh, axis: str = "seq"):
    """jit the batched step with batch-axis sharding over the mesh."""
    step = batched_scan_step(cfg)
    shard = NamedSharding(mesh, P(axis))

    def apply(args):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(*( (axis,) + (None,) * (x.ndim - 1) )))), args)

    return jax.jit(step), apply


def make_sharded_chunk_replay(cfg: SlamConfig, mesh: Mesh, axis: str = "seq"):
    """Chunked multi-sequence replay sharded over the mesh.

    vmap of the K-scan chunked step (`chunk_scan_step_impl`: `lax.scan` over
    the fused per-scan step) over a batch of independent sequences, with the
    batch axis sharded across devices.  With batch == n_devices each device
    runs exactly the single-sequence program — no collectives, so scaling is
    communication-free (the data-parallel replay axis of SURVEY.md §2 P4).

    Returns (step, put) where step(states, xyz_bk, n_bk, dts, accs, gyrs,
    valid) -> (states', poses) and put(tree) shards a batch-leading pytree.
    """
    def one(state, xyz_k, n_k, dts_k, accs_k, gyrs_k, valid_k):
        fs, gs, lsurf, lcorn = state
        carry, outs = est.chunk_scan_step_impl(
            fs, gs, lsurf, lcorn, xyz_k, n_k, dts_k, accs_k, gyrs_k, valid_k,
            cfg)
        return carry, (outs[0], outs[1])   # global (rn, qbn) per scan

    step = jax.jit(jax.vmap(one))

    def put(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(*((axis,) + (None,) * (x.ndim - 1))))), tree)

    return step, put


def make_sharded_slam_replay(cfg: SlamConfig, mesh: Mesh, axis: str = "seq",
                             n_window: int | None = None,
                             submap_cap: int | None = None,
                             cloud_cap: int | None = None,
                             opt_iters: int = 8):
    """FULL-pipeline multi-sequence replay sharded over the mesh — the
    round-4 P4 axis covering the headline system (odometry chunk + mapping
    + loop closure + high-rate fusion; VERDICT r3 #2: the round-3 sweep
    batched only odometry).

    `shard_map` instead of `vmap`: the mapping cadence and loop-closure
    acceptance are data-dependent `lax.cond`s, which vmap would lower to
    both-branch `select`s — every scan would pay the mapping step and every
    loop attempt the pose-graph solve.  Under shard_map each device runs
    the REAL single-sequence program (true conds, dynamic while_loop trip
    counts) on its own shard, bit-identical to the single-device chunked
    replay; a sub-batch larger than the device count is processed
    sequentially per device via lax.scan (the right schedule for
    independent heavy streams — no both-branch waste).

    Restriction: the mapping/loop cadence flags (mf, lf) are REPLICATED
    across sequences — all replayed streams share one scan clock (true for
    batch replay of same-rate sensor streams; per-sequence scan times `ts`
    remain per-lane).

    Returns (step, put):
      step(odo_states, map_states, xyz, n, dts, accs, gyrs, valid, ts, rp,
           mf, lf) -> (odo_states', map_states', (pos, quat) fused per scan)
      with every arg batch-leading except mf/lf ((K,) host-planned bools).
      put(tree) shards a batch-leading pytree over the mesh; mf/lf are
      passed replicated.
    """
    try:
        from jax import shard_map
    except ImportError:        # older jax
        from jax.experimental.shard_map import shard_map

    from lins_tpu.mapping import mapper as mp

    corner_cap, surf_cap, outlier_cap = mp.derive_caps(cfg)
    # match LinsMapper's derived loop-cloud capacities so the sharded
    # replay compiles the same program as the single-sequence mapper
    submap_cap = submap_cap or min(16384, 4 * (corner_cap + surf_cap))
    cloud_cap = cloud_cap or min(8192, 2 * (corner_cap + surf_cap))
    from lins_tpu.mapping import local_map as lmn
    gp = lmn.grid_params(cfg)
    nw = n_window or cfg.surrounding_keyframe_search_num
    map_chunk = partial(
        mp._mapping_chunk_impl, cfg=cfg, corner_cap=corner_cap,
        surf_cap=surf_cap, outlier_cap=outlier_cap, n_window=nw, gp=gp,
        submap_cap=submap_cap, cloud_cap=cloud_cap, opt_iters=opt_iters)

    def one(odo_state, map_state, xyz_k, n_k, dts, accs, gyrs, valid,
            ts_k, rp_k, mf, lf):
        fs, gs, lsurf, lcorn = odo_state
        if cfg.use_pallas:
            # same 3-stage split as LinsOdometry.add_scan_chunk: XLA pre ->
            # Mosaic label kernel (blocked at 64 rows) -> chunked rest.
            # Without this the sharded replay ran the label propagation in
            # XLA only, ~5 ms/scan slower than the headline pipeline
            # (round-5 reconciliation of BENCH_scaling vs bench.py).
            pre_k = est.scan_pre_vmap(xyz_k, n_k, cfg)
            labels_k = est._label_vmapped(
                pre_k["e_right"], pre_k["e_down"], pre_k["eligible"],
                jax.default_backend() == "cpu")
            (fs, gs, lsurf, lcorn), outs = est.chunk_rest_impl(
                labels_k, pre_k, fs, gs, lsurf, lcorn, dts, accs, gyrs,
                valid, cfg)
        else:
            (fs, gs, lsurf, lcorn), outs = est.chunk_scan_step_impl(
                fs, gs, lsurf, lcorn, xyz_k, n_k, dts, accs, gyrs, valid,
                cfg)
        rns, qbns, _, _, _, clouds = outs
        map_state, (pos, quat, _, _, _, _) = map_chunk(
            map_state, rns, qbns, ts_k,
            clouds["cxyz"], clouds["cval"], clouds["sxyz"], clouds["sval"],
            clouds["oxyz"], clouds["oval"], rp_k, mf, lf)
        return (fs, gs, lsurf, lcorn), map_state, (pos, quat)

    def per_shard(odo_states, map_states, xyz, n, dts, accs, gyrs, valid,
                  ts, rp, mf, lf):
        def body(_, args):
            os_, ms_, x, nn_, dt, ac, gy, va, t_, r_ = args
            os2, ms2, poses = one(os_, ms_, x, nn_, dt, ac, gy, va, t_, r_,
                                  mf, lf)
            return _, (os2, ms2, poses)

        _, (os2, ms2, poses) = jax.lax.scan(
            body, None, (odo_states, map_states, xyz, n, dts, accs, gyrs,
                         valid, ts, rp))
        return os2, ms2, poses

    bspec = P(axis)
    rspec = P()
    # check_vma off: the per-device program is fully independent (no
    # collectives), and the VMA tracker rejects its constant-initialized
    # while_loop carries (front-end label propagation) as "unvarying
    # input, varying output"
    step = jax.jit(shard_map(
        per_shard, mesh=mesh,
        in_specs=(bspec, bspec, bspec, bspec, bspec, bspec, bspec, bspec,
                  bspec, bspec, rspec, rspec),
        out_specs=(bspec, bspec, bspec), check_vma=False))

    def put(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(*((axis,) + (None,) * (x.ndim - 1))))), tree)

    return step, put


def batched_mapper_state(cfg: SlamConfig, batch: int,
                         n_window: int | None = None, dtype=jnp.float32):
    """A (batch,)-leading stack of fresh MapperStates for the sharded
    full-SLAM replay."""
    from lins_tpu.mapping import mapper as mp

    st = mp.init_mapper(cfg, *mp.derive_caps(cfg),
                        n_window or cfg.surrounding_keyframe_search_num,
                        dtype=dtype)
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), st)


# ---------------------------------------------------------------------------
# Tiny-state builders for dry runs and benchmarks
# ---------------------------------------------------------------------------

def dummy_feature_ref(cap: int, batch: int | None, dtype=jnp.float32):
    shape = (cap,) if batch is None else (batch, cap)
    return dict(xyz=jnp.zeros(shape + (3,), dtype),
                ring=jnp.zeros(shape, jnp.int32),
                valid=jnp.zeros(shape, bool))


def batched_initial_states(cfg: SlamConfig, batch: int, dtype=jnp.float32):
    def rep(x):
        return jnp.broadcast_to(x, (batch,) + x.shape)

    fs = eskf.initial_state(cfg, acc=[0, 0, cfg.gravity], dtype=dtype)
    gs = est.identity_nominal(cfg, dtype)
    fs_b = jax.tree_util.tree_map(rep, fs)
    gs_b = jax.tree_util.tree_map(rep, gs)
    surf = dummy_feature_ref(cfg.max_less_flat, batch, dtype)
    corner = dummy_feature_ref(cfg.max_less_sharp, batch, dtype)
    return fs_b, gs_b, surf, corner
