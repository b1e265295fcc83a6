"""Variant lab for the scan-to-map NN ops on TPU: time alternatives for
the candidate gather prune and the per-iteration 5-NN re-rank."""
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

K = 16

def timeit_scan(fn, *args):
    def body(c, _):
        out = fn(*args)
        s = sum(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:1])
                for x in jax.tree_util.tree_leaves(out))
        return c + s, ()
    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                     length=K)[0])
    out = f(); jax.block_until_ready(out)
    best = np.inf
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(f()).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best / K

qs, qv = cloud(surf_cap + outlier_cap, -20, 20)
C = 64
res = {}


def block_d2(query, q_valid, grid):
    cap = grid.cap
    nbc, cover = g._neighborhood(query, grid)
    bb = g._bucket_of(nbc, grid.table)
    n_off = bb.shape[1]
    tri = np.tril(np.ones((n_off, n_off), bool), -1)
    dup = jnp.any((bb[:, :, None] == bb[:, None, :]) & tri[None], axis=-1)
    cand = grid.cells[bb]
    n_in = grid.cnt[bb]
    ok = (jnp.arange(cap, dtype=jnp.int32)[None, None, :]
          < n_in[:, :, None]) & ~dup[:, :, None]
    diff = cand - query[:, None, :, None]
    d2 = jnp.sum(diff * diff, axis=2)
    Q = query.shape[0]
    B = n_off * cap
    d2 = jnp.where(ok, d2, jnp.inf).reshape(Q, B)
    d2 = jnp.where(q_valid[:, None], d2, jnp.inf)
    flat_c = cand.transpose(0, 2, 1, 3).reshape(Q, 3, B)
    return d2, flat_c, cover


# v0: top_k + take_along_axis (round-2 production)
def v0(query, q_valid, grid):
    d2, flat_c, cover = block_d2(query, q_valid, grid)
    neg_d, sel = jax.lax.top_k(-d2, C)
    out = jnp.stack([jnp.take_along_axis(flat_c[:, i, :], sel, axis=1)
                     for i in range(3)], axis=-1)
    return out, -neg_d, cover

# v1: ONE variadic sort carrying coordinates, slice C (no gathers)
def v1(query, q_valid, grid):
    d2, flat_c, cover = block_d2(query, q_valid, grid)
    d2s, xs, ys, zs = jax.lax.sort(
        (d2, flat_c[:, 0], flat_c[:, 1], flat_c[:, 2]), dimension=1,
        num_keys=1)
    out = jnp.stack([xs[:, :C], ys[:, :C], zs[:, :C]], axis=-1)
    return out, d2s[:, :C], cover

# v2: top_k of d2 only (how much of v0 is the takes?)
def v2(query, q_valid, grid):
    d2, flat_c, cover = block_d2(query, q_valid, grid)
    neg_d, sel = jax.lax.top_k(-d2, C)
    return -neg_d, cover

# v3: block gather only (lower bound)
def v3(query, q_valid, grid):
    d2, flat_c, cover = block_d2(query, q_valid, grid)
    return d2, cover

res["v0_topk_takes_ms"] = timeit_scan(lambda: v0(qs, qv, sgrid))
res["v1_sort_carry_ms"] = timeit_scan(lambda: v1(qs, qv, sgrid))
res["v2_topk_only_ms"] = timeit_scan(lambda: v2(qs, qv, sgrid))
res["v3_block_only_ms"] = timeit_scan(lambda: v3(qs, qv, sgrid))

# knn re-rank variants at (Q, 64)
cand64, ok64, _, _ = jax.jit(
    lambda: g.gather_candidates(qs, qv, sgrid, C))()
jax.block_until_ready(cand64)

def knn_onehot():
    return g.knn_from_candidates(qs, qv, cand64, ok64)

def knn_sortcarry():
    d2 = jnp.sum((cand64 - qs[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(ok64 & qv[:, None], d2, jnp.inf)
    d2s, xs, ys, zs = jax.lax.sort(
        (d2, cand64[:, :, 0], cand64[:, :, 1], cand64[:, :, 2]),
        dimension=1, num_keys=1)
    nn = jnp.stack([xs[:, :5], ys[:, :5], zs[:, :5]], axis=-1)
    d2k = d2s[:, :5]
    nn = jnp.where(jnp.isfinite(d2k)[:, :, None], nn, qs[:, None, :])
    return nn, d2k

res["knn_onehot_ms"] = timeit_scan(knn_onehot)
res["knn_sortcarry_ms"] = timeit_scan(knn_sortcarry)

print(json.dumps({k: round(v, 3) for k, v in res.items()}))
