"""TPU micro-bench: Mosaic partial-selection kernel (ops/pallas_select.py)
vs the XLA wide-sort prune in gather_candidates, at the round-4 production
query shapes (surf Q=4096 B=1728, corner Q=512 B=5832) and the legacy
Q=6144 for comparison with the round-3 numbers."""
import sys

sys.path.insert(0, "/root/repo")
import json
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from lins_tpu.config import VLP16
from lins_tpu.geom import so3
from lins_tpu.mapping import local_map as lmn
from lins_tpu.mapping import mapper as mp
from lins_tpu.ops import grid_nn as g
from lins_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
cfg = VLP16.replace(max_points=28800)
rng = np.random.default_rng(0)
corner_cap, surf_cap, outlier_cap = mp.derive_caps(cfg)
gp = lmn.grid_params(cfg)
state = mp.init_mapper(cfg, corner_cap, surf_cap, outlier_cap,
                       cfg.surrounding_keyframe_search_num, gp)


def cloud(n, lo=-40, hi=40):
    return (jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32),
            jnp.ones((n,), bool))


c_ds, c_ok = cloud(corner_cap)
s_ds, s_ok = cloud(surf_cap)
o_ds, o_ok = cloud(outlier_cap)
q0 = so3.quat_identity(jnp.float32)
push = jax.jit(partial(lmn.push_keyframe, gp=gp), donate_argnums=(0,))
for i in range(cfg.surrounding_keyframe_search_num):
    pos = jnp.asarray(rng.uniform(-20, 20, 3), jnp.float32)
    state = state._replace(lmap=push(state.lmap, jnp.int32(i), pos, q0,
                                     c_ds, c_ok, s_ds, s_ok, o_ds, o_ok))
jax.block_until_ready(state.lmap)
sgrid = state.lmap.surf_grid
cgrid = state.lmap.corner_grid

K = 16


def timeit_scan(fn):
    def body(c, _):
        out = fn()
        s = sum(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:1])
                for x in jax.tree_util.tree_leaves(out))
        return c + s, ()

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                     length=K)[0])
    out = f()
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(f()).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best / K


res = {}
C = 64
for name, Q, grid in (("surf_q4096", 4096, sgrid),
                      ("surf_q6144", 6144, sgrid),
                      ("corner_q512", 512, cgrid),
                      ("corner_q1024", 1024, cgrid)):
    qs, qv = cloud(Q, -20, 20)
    res[f"{name}_xla_sort_ms"] = timeit_scan(
        lambda qs=qs, qv=qv, grid=grid: g.gather_candidates(qs, qv, grid, C))
    res[f"{name}_mosaic_ms"] = timeit_scan(
        lambda qs=qs, qv=qv, grid=grid: g.gather_candidates(
            qs, qv, grid, C, use_pallas=True))

# parity spot-check ON DEVICE (round-3 lesson: oracles must run on TPU)
qs, qv = cloud(4096, -20, 20)
c0, ok0, _, _ = jax.jit(lambda: g.gather_candidates(qs, qv, sgrid, C))()
c1, ok1, _, _ = jax.jit(lambda: g.gather_candidates(
    qs, qv, sgrid, C, use_pallas=True))()
res["parity_ok_equal"] = bool(jnp.array_equal(ok0, ok1))
res["parity_cand_maxdiff"] = float(jnp.max(jnp.abs(
    jnp.where(ok0[:, :, None], c0 - c1, 0.0))))
print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in res.items()}))
