"""Component breakdown of the scan-to-map GN on TPU, scan-batched (K reps
inside one jit) so the ~28 ms relay dispatch floor drops out.

Times, per call: the pruned candidate gather (gather_candidates, C=64)
split into gather-only vs gather+top_k, the full-block gather
(gather_block), per-iteration re-ranking at both widths, and the whole
scan_to_map_grids loop."""
import sys; sys.path.insert(0, "/root/repo")
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
n_window = cfg.surrounding_keyframe_search_num
gp = lmn.grid_params(cfg)
state = mp.init_mapper(cfg, corner_cap, surf_cap, outlier_cap, n_window, gp)

def cloud(n, lo=-40, hi=40):
    return (jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32),
            jnp.ones((n,), bool))

c_ds, c_ok = cloud(corner_cap)
s_ds, s_ok = cloud(surf_cap)
o_ds, o_ok = cloud(outlier_cap)
q0 = so3.quat_identity(jnp.float32)
push = jax.jit(partial(lmn.push_keyframe, gp=gp), donate_argnums=(0,))
for i in range(n_window):
    pos = jnp.asarray(rng.uniform(-20, 20, 3), jnp.float32)
    state = state._replace(lmap=push(state.lmap, jnp.int32(i), pos, q0,
                                     c_ds, c_ok, s_ds, s_ok, o_ds, o_ok))
jax.block_until_ready(state.lmap)
sgrid = state.lmap.surf_grid
cgrid = state.lmap.corner_grid

K = 16

def timeit_scan(fn, *args):
    """Run fn K times under lax.scan in one dispatch; report ms/call."""
    def body(c, _):
        out = fn(*args)
        # fold a scalar from the output into the carry so nothing is DCE'd
        s = sum(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:1])
                for x in jax.tree_util.tree_leaves(out))
        return c + s, ()
    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0])
    out = f(); jax.block_until_ready(out)
    best = np.inf
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(f()).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best / K

res = {}
qs, qv = cloud(surf_cap + outlier_cap, -20, 20)
qc, qcv = cloud(corner_cap, -20, 20)

# 1. pruned gather WITH top_k (the round-2 production op)
res["surf_gather_topk_ms"] = timeit_scan(
    lambda: g.gather_candidates(qs, qv, sgrid, 64))
res["corner_gather_topk_ms"] = timeit_scan(
    lambda: g.gather_candidates(qc, qcv, cgrid, 64))

# 2. full-block gather (no top_k)
res["surf_gather_block_ms"] = timeit_scan(
    lambda: g.gather_block(qs, qv, sgrid))
res["corner_gather_block_ms"] = timeit_scan(
    lambda: g.gather_block(qc, qcv, cgrid))

# 3. per-iteration re-rank at both widths
cand64, ok64, _, _ = jax.jit(lambda: g.gather_candidates(qs, qv, sgrid, 64))()
candB, okB, _ = jax.jit(lambda: g.gather_block(qs, qv, sgrid))()
jax.block_until_ready((cand64, candB))
res["surf_knn64_ms"] = timeit_scan(
    lambda: g.knn_from_candidates(qs, qv, cand64, ok64))
res["surf_knnblock_ms"] = timeit_scan(
    lambda: g.knn_from_candidates(qs, qv, candB, okB))

print(json.dumps({k: round(v, 3) for k, v in res.items()}))
