"""Round-4 variant lab: XLA-level alternatives for the scan-to-map candidate
selection (the (Q, B) nearest-C sort in grid_nn.gather_candidates — VERDICT
r3 next-step #1) plus re-rank cost scaling in Q and C.

Measures, on the production-shaped surf grid (nb=8, cap=216, B=1728) and
corner grid (nb=27, cap=216, B=5832):
  s0/c0: production wide 4-carry sort -> C=64
  s1/c1: per-cell batched 4-carry sort -> top-k' per cell -> stage-2 merge
         sort (exactness: any true 5-NN member ranks <= 5 in its own cell,
         so k' >= 5 keeps it; the first-dropped-per-cell distance is the
         prune bound)
  s2:    per-cell top-8, no stage 2 (C = nb*8)
  s3:    per-cell top_k on d2 + one-hot MXU recovery + stage-2
  block: the raw gather + d2 floor (selection-free lower bound)
re-rank: knn_from_candidates (min+one-hot) vs 4-carry small sort, at
         (Q, C) in {6144, 3072} x {32, 64, 128}.
"""
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
    def body(c, _):
        out = fn(*args)
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


def block_d2_cells(query, q_valid, grid):
    """(d2 (Q,nb,cap), cand (Q,nb,3,cap), cover) — the gather floor."""
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
    d2 = jnp.where(ok & q_valid[:, None, None], d2, jnp.inf)
    return d2, cand, cover


def wide_sort(query, q_valid, grid, C):
    """Production path (gather_candidates body)."""
    d2, cand, cover = block_d2_cells(query, q_valid, grid)
    Q = query.shape[0]
    n_off, cap = d2.shape[1], d2.shape[2]
    B = n_off * cap
    d2f = d2.reshape(Q, B)
    flat_c = cand.transpose(0, 2, 1, 3).reshape(Q, 3, B)
    d2s, xs, ys, zs = jax.lax.sort(
        (d2f, flat_c[:, 0], flat_c[:, 1], flat_c[:, 2]), dimension=1,
        num_keys=1)
    out = jnp.stack([xs[:, :C], ys[:, :C], zs[:, :C]], axis=-1)
    return out, d2s[:, :C], d2s[:, C - 1], cover


def percell_sort(query, q_valid, grid, kcell, C):
    """Per-cell 4-carry sort -> top-kcell -> optional stage-2 merge to C."""
    d2, cand, cover = block_d2_cells(query, q_valid, grid)
    Q = query.shape[0]
    n_off, cap = d2.shape[1], d2.shape[2]
    d2s, xs, ys, zs = jax.lax.sort(
        (d2, cand[:, :, 0], cand[:, :, 1], cand[:, :, 2]), dimension=2,
        num_keys=1)
    drop = d2s[:, :, kcell]                        # (Q, nb) first dropped
    d2c = d2s[:, :, :kcell].reshape(Q, n_off * kcell)
    xc = xs[:, :, :kcell].reshape(Q, n_off * kcell)
    yc = ys[:, :, :kcell].reshape(Q, n_off * kcell)
    zc = zs[:, :, :kcell].reshape(Q, n_off * kcell)
    d2C_cells = jnp.min(drop, axis=1)
    if n_off * kcell == C:
        out = jnp.stack([xc, yc, zc], axis=-1)
        return out, d2c, d2C_cells, cover
    d2f, xf, yf, zf = jax.lax.sort((d2c, xc, yc, zc), dimension=1,
                                   num_keys=1)
    out = jnp.stack([xf[:, :C], yf[:, :C], zf[:, :C]], axis=-1)
    d2C = jnp.minimum(d2C_cells, d2f[:, C])
    return out, d2f[:, :C], d2C, cover


def percell_topk_onehot(query, q_valid, grid, kcell, C):
    """Per-cell lax.top_k on d2 + one-hot MXU point recovery + stage-2."""
    d2, cand, cover = block_d2_cells(query, q_valid, grid)
    Q = query.shape[0]
    n_off, cap = d2.shape[1], d2.shape[2]
    neg, sel = jax.lax.top_k(-d2, kcell + 1)       # (Q, nb, kcell+1)
    d2s = -neg
    drop = d2s[:, :, kcell]
    onehot = (sel[:, :, :kcell, None]
              == jnp.arange(cap, dtype=jnp.int32)[None, None, None, :]
              ).astype(cand.dtype)                 # (Q, nb, kcell, cap)
    pts = jnp.einsum("qnkc,qnic->qnki", onehot, cand,
                     precision=jax.lax.Precision.HIGHEST)
    d2c = d2s[:, :, :kcell].reshape(Q, n_off * kcell)
    ptsf = pts.reshape(Q, n_off * kcell, 3)
    d2C_cells = jnp.min(drop, axis=1)
    d2f, xf, yf, zf = jax.lax.sort(
        (d2c, ptsf[:, :, 0], ptsf[:, :, 1], ptsf[:, :, 2]), dimension=1,
        num_keys=1)
    out = jnp.stack([xf[:, :C], yf[:, :C], zf[:, :C]], axis=-1)
    d2C = jnp.minimum(d2C_cells, d2f[:, C])
    return out, d2f[:, :C], d2C, cover


def rerank_onehot(qs, qv, cand, ok):
    return g.knn_from_candidates(qs, qv, cand, ok)


def rerank_sortcarry(qs, qv, cand, ok):
    d2 = jnp.sum((cand - qs[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(ok & qv[:, None], d2, jnp.inf)
    d2s, xs, ys, zs = jax.lax.sort(
        (d2, cand[:, :, 0], cand[:, :, 1], cand[:, :, 2]),
        dimension=1, num_keys=1)
    nn = jnp.stack([xs[:, :5], ys[:, :5], zs[:, :5]], axis=-1)
    d2k = d2s[:, :5]
    nn = jnp.where(jnp.isfinite(d2k)[:, :, None], nn, qs[:, None, :])
    return nn, d2k


res = {}
qs_full, qv_full = cloud(surf_cap + outlier_cap, -20, 20)
qs_half, qv_half = qs_full[:3072], qv_full[:3072]
qc, qcv = cloud(corner_cap, -20, 20)

# --- surf-channel selection variants ---
res["s_block_floor_ms"] = timeit_scan(
    lambda: block_d2_cells(qs_full, qv_full, sgrid)[0])
res["s0_wide64_ms"] = timeit_scan(
    lambda: wide_sort(qs_full, qv_full, sgrid, 64))
res["s1_cell16_merge64_ms"] = timeit_scan(
    lambda: percell_sort(qs_full, qv_full, sgrid, 16, 64))
res["s2_cell8_c64_ms"] = timeit_scan(
    lambda: percell_sort(qs_full, qv_full, sgrid, 8, 64))
res["s3_topk16_onehot_ms"] = timeit_scan(
    lambda: percell_topk_onehot(qs_full, qv_full, sgrid, 16, 64))
res["s1_q3072_ms"] = timeit_scan(
    lambda: percell_sort(qs_half, qv_half, sgrid, 16, 64))
res["s0_q3072_ms"] = timeit_scan(
    lambda: wide_sort(qs_half, qv_half, sgrid, 64))

# --- corner-channel selection variants ---
res["c0_wide64_ms"] = timeit_scan(lambda: wide_sort(qc, qcv, cgrid, 64))
res["c1_cell8_merge64_ms"] = timeit_scan(
    lambda: percell_sort(qc, qcv, cgrid, 8, 64))
res["c1_topk8_onehot_ms"] = timeit_scan(
    lambda: percell_topk_onehot(qc, qcv, cgrid, 8, 64))

# --- re-rank variants ---
cand64, ok64, _, _ = jax.jit(
    lambda: g.gather_candidates(qs_full, qv_full, sgrid, 64))()
cand128, ok128, _, _ = jax.jit(
    lambda: g.gather_candidates(qs_full, qv_full, sgrid, 128))()
jax.block_until_ready((cand64, cand128))
res["rr_onehot_6144x64_ms"] = timeit_scan(
    lambda: rerank_onehot(qs_full, qv_full, cand64, ok64))
res["rr_sort_6144x64_ms"] = timeit_scan(
    lambda: rerank_sortcarry(qs_full, qv_full, cand64, ok64))
res["rr_onehot_6144x32_ms"] = timeit_scan(
    lambda: rerank_onehot(qs_full, qv_full, cand64[:, :32], ok64[:, :32]))
res["rr_sort_6144x32_ms"] = timeit_scan(
    lambda: rerank_sortcarry(qs_full, qv_full, cand64[:, :32], ok64[:, :32]))
res["rr_onehot_3072x64_ms"] = timeit_scan(
    lambda: rerank_onehot(qs_half, qv_half, cand64[:3072], ok64[:3072]))
res["rr_sort_6144x128_ms"] = timeit_scan(
    lambda: rerank_sortcarry(qs_full, qv_full, cand128, ok128))
res["rr_onehot_1024x64_ms"] = timeit_scan(
    lambda: rerank_onehot(qc, qcv, cand64[:1024], ok64[:1024]))
res["rr_sort_1024x64_ms"] = timeit_scan(
    lambda: rerank_sortcarry(qc, qcv, cand64[:1024], ok64[:1024]))

print(json.dumps({k: round(v, 3) for k, v in res.items()}))
