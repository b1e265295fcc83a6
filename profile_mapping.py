"""Micro-profile of the mapping-step components on the attached TPU.

Times, per call (median of reps, jit-compiled, donated where the production
path donates): the current-scan voxel downsamples, the scan-to-map GN
refinement against cached grids, the window grid rebuild (push_keyframe),
and one loop-closure attempt.  Prints a JSON breakdown — the evidence base
for where the ~(1/slam_rate - 1/odo_rate) per-scan mapping budget goes.
"""
from __future__ import annotations

import json
import time
from functools import partial

import numpy as np


def timeit(fn, *args, reps=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # D2H readback of one leaf: honest fence on the relay
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from lins_tpu.config import VLP16
    from lins_tpu.geom import so3
    from lins_tpu.mapping import local_map as lmn
    from lins_tpu.mapping import mapper as mp
    from lins_tpu.mapping.scan2map import scan_to_map_grids
    from lins_tpu.ops.voxel import voxel_downsample
    from lins_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = VLP16.replace(max_points=28800)
    rng = np.random.default_rng(0)

    corner_cap, surf_cap, outlier_cap = mp.derive_caps(cfg)
    n_window = cfg.surrounding_keyframe_search_num
    gp = lmn.grid_params(cfg)
    state = mp.init_mapper(cfg, corner_cap, surf_cap, outlier_cap,
                           n_window, gp)

    def cloud(n, lo=-40, hi=40):
        return (jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32),
                jnp.ones((n,), bool))

    c_ds, c_ok = cloud(corner_cap)
    s_ds, s_ok = cloud(surf_cap)
    o_ds, o_ok = cloud(outlier_cap)
    t0p = jnp.zeros(3, jnp.float32)
    q0 = so3.quat_identity(jnp.float32)

    # fill the window so rebuilds see representative density
    push = jax.jit(partial(lmn.push_keyframe, gp=gp),
                   donate_argnums=(0,))
    for i in range(n_window):
        pos = jnp.asarray(rng.uniform(-20, 20, 3), jnp.float32)
        state = state._replace(lmap=push(
            state.lmap, jnp.int32(i), pos, q0, c_ds, c_ok, s_ds, s_ok,
            o_ds, o_ok))
    jax.block_until_ready(state.lmap)

    res = {}

    # 1. current-scan voxel downsamples (4 calls/step)
    craw, craw_ok = cloud(cfg.max_less_sharp)
    sraw, sraw_ok = cloud(cfg.max_less_flat)
    vd = jax.jit(partial(voxel_downsample, leaf=cfg.map_surf_leaf,
                         cap=surf_cap))
    res["voxel_downsample_surf_ms"] = 1e3 * timeit(vd, sraw, sraw_ok)

    # 2. scan-to-map GN against the cached grids
    s2m = jax.jit(partial(scan_to_map_grids, cfg=cfg))
    lm = state.lmap
    res["scan_to_map_ms"] = 1e3 * timeit(
        s2m, t0p, q0, c_ds, c_ok, s_ds, s_ok, lm.corner_grid, lm.surf_grid,
        lm.n_corner, lm.n_surf)

    # 3. window grid rebuild (push_keyframe; paid when a keyframe is added)
    push2 = jax.jit(partial(lmn.push_keyframe, gp=gp))
    res["push_keyframe_rebuild_ms"] = 1e3 * timeit(
        push2, state.lmap, jnp.int32(n_window), t0p, q0, c_ds, c_ok,
        s_ds, s_ok, o_ds, o_ok)

    # 4. one full mapping step (production jit, no keyframe add vs add)
    step = jax.jit(partial(
        mp._mapping_step_impl, cfg=cfg, corner_cap=corner_cap,
        surf_cap=surf_cap, outlier_cap=outlier_cap, n_window=n_window,
        gp=gp))
    craw_f = jnp.asarray(rng.uniform(-40, 40, (cfg.max_less_sharp, 3)),
                         jnp.float32)
    sraw_f = jnp.asarray(rng.uniform(-40, 40, (cfg.max_less_flat, 3)),
                         jnp.float32)
    oraw_f = jnp.asarray(rng.uniform(-40, 40, (cfg.max_outlier, 3)),
                         jnp.float32)
    rp = jnp.asarray([np.nan, np.nan], jnp.float32)
    # seed one keyframe so the timed step takes the refine branch (and the
    # 0.3 m gate then skips the keyframe-add rebuild: this isolates
    # downsample+GN; the rebuild is res[3])
    state = step(state, t0p, q0, jnp.float32(0.5),
                 craw_f, jnp.ones(cfg.max_less_sharp, bool),
                 sraw_f, jnp.ones(cfg.max_less_flat, bool),
                 oraw_f, jnp.ones(cfg.max_outlier, bool), rp)[0]
    res["mapping_step_ms"] = 1e3 * timeit(
        step, state, t0p, q0, jnp.float32(1.0),
        craw_f, jnp.ones(cfg.max_less_sharp, bool),
        sraw_f, jnp.ones(cfg.max_less_flat, bool),
        oraw_f, jnp.ones(cfg.max_outlier, bool), rp)

    # 5. one loop-closure attempt (no accepted loop: detection + gated ICP)
    loop = jax.jit(partial(mp._loop_step_impl, cfg=cfg, submap_cap=16384,
                           cloud_cap=8192, opt_iters=8, n_window=n_window,
                           gp=gp))
    res["loop_attempt_ms"] = 1e3 * timeit(loop, state, jnp.float32(1.0))

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
