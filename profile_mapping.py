"""Micro-profile of the mapping-step components on the attached TPU.

Times, per call (median of reps, jit-compiled): the current-scan voxel
downsamples, the scan-to-map GN refinement against cached grids, the
INCREMENTAL keyframe insert (ops/voxel_map delta scatter — scan-batched K
times inside one jit so the ~25-45 ms remote-relay dispatch overhead is
amortized out of the per-op number), the full compaction rebuild, and one
loop-closure attempt.  Prints a JSON breakdown — the evidence base for
where the ~(1/slam_rate - 1/odo_rate) per-scan mapping budget goes.

Single-dispatch timings (scan_to_map, rebuild, loop) still INCLUDE one
relay round-trip (~25-45 ms when remote-attached); compare them against
`dispatch_floor_ms` (a no-op dispatch) rather than zero.
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

    # fill the window so timed ops see representative density
    push = jax.jit(partial(lmn.push_keyframe, gp=gp),
                   donate_argnums=(0,))
    for i in range(n_window):
        pos = jnp.asarray(rng.uniform(-20, 20, 3), jnp.float32)
        state = state._replace(lmap=push(
            state.lmap, jnp.int32(i), pos, q0, c_ds, c_ok, s_ds, s_ok,
            o_ds, o_ok))
    jax.block_until_ready(state.lmap)

    res = {}

    # 0. relay dispatch floor: one trivial jit round-trip
    noop = jax.jit(lambda x: x + 1.0)
    res["dispatch_floor_ms"] = 1e3 * timeit(noop, jnp.float32(0.0))

    # 1. current-scan voxel downsamples (4 calls/step)
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

    # 3. INCREMENTAL keyframe insert: K pushes in one lax.scan dispatch
    #    (evict-subtract + delta-add each; per-push = total / K)
    K = 32

    def push_k(lm, poss):
        def body(lm, i_pos):
            i, pos = i_pos
            return lmn.push_keyframe(lm, n_window + i, pos, q0, c_ds, c_ok,
                                     s_ds, s_ok, o_ds, o_ok, gp), ()
        lm, _ = jax.lax.scan(body, lm,
                             (jnp.arange(K, dtype=jnp.int32), poss))
        return lm
    poss = jnp.asarray(rng.uniform(-20, 20, (K, 3)), jnp.float32)
    push_kj = jax.jit(push_k)
    res["push_keyframe_incremental_ms"] = 1e3 * timeit(
        push_kj, state.lmap, poss) / K

    # 4. full compaction rebuild (paid every map_rebuild_interval inserts,
    #    on overflow, on loop rewrite, on radius re-selection)
    ids, okm, wslots = lmn.recent_window_ids(state.store, n_window)
    # profile-only: ids from an empty store are masked; force all-on so the
    # rebuild sees the full window density
    okm = jnp.ones_like(okm)
    ids = jnp.arange(n_window, dtype=jnp.int32)
    reb = jax.jit(partial(lmn.rebuild_window, gp=gp))
    res["rebuild_window_ms"] = 1e3 * timeit(
        reb, state.lmap, state.store, ids, okm, wslots)

    # 5. one full mapping step (production jit, refine path isolated: the
    #    profiled cfg raises the keyframe gate so the timed step never
    #    takes the keyframe-add branch)
    cfg_iso = cfg.replace(keyframe_gate_meters=1e9)
    step = jax.jit(partial(
        mp._mapping_step_impl, cfg=cfg_iso, corner_cap=corner_cap,
        surf_cap=surf_cap, outlier_cap=outlier_cap, n_window=n_window,
        gp=gp))
    craw_f = jnp.asarray(rng.uniform(-40, 40, (cfg.max_less_sharp, 3)),
                         jnp.float32)
    sraw_f = jnp.asarray(rng.uniform(-40, 40, (cfg.max_less_flat, 3)),
                         jnp.float32)
    oraw_f = jnp.asarray(rng.uniform(-40, 40, (cfg.max_outlier, 3)),
                         jnp.float32)
    rp = jnp.asarray([np.nan, np.nan], jnp.float32)
    # seed one keyframe so the timed step takes the refine branch
    state = step(state, t0p, q0, jnp.float32(0.5),
                 craw_f, jnp.ones(cfg.max_less_sharp, bool),
                 sraw_f, jnp.ones(cfg.max_less_flat, bool),
                 oraw_f, jnp.ones(cfg.max_outlier, bool), rp)[0]
    st2, _, _, metrics = step(
        state, t0p, q0, jnp.float32(1.0),
        craw_f, jnp.ones(cfg.max_less_sharp, bool),
        sraw_f, jnp.ones(cfg.max_less_flat, bool),
        oraw_f, jnp.ones(cfg.max_outlier, bool), rp)
    assert not bool(metrics["keyframe_added"]), \
        "timed step must stay on the refine-only path"
    res["mapping_step_ms"] = 1e3 * timeit(
        step, state, t0p, q0, jnp.float32(1.0),
        craw_f, jnp.ones(cfg.max_less_sharp, bool),
        sraw_f, jnp.ones(cfg.max_less_flat, bool),
        oraw_f, jnp.ones(cfg.max_outlier, bool), rp)

    # 6. one loop-closure attempt (no accepted loop: detection + gated ICP)
    loop = jax.jit(partial(mp._loop_step_impl, cfg=cfg, submap_cap=16384,
                           cloud_cap=8192, opt_iters=8, n_window=n_window,
                           gp=gp))
    res["loop_attempt_ms"] = 1e3 * timeit(loop, state, jnp.float32(1.0))

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
