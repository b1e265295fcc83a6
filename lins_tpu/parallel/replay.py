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
