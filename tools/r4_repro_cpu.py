"""CPU reproduction hunt for the round-4 accuracy regression: compare the
XLA sort path vs the Mosaic select kernel (interpret mode) on grids WITH
TOMBSTONES (evicted keyframes — absent from the r4_select_micro parity
check), then a full scan_to_map_grids A/B."""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
from jax.extend.backend import clear_backends

clear_backends()

import json
from functools import partial

import numpy as np
import jax.numpy as jnp

from lins_tpu.config import VLP16
from lins_tpu.geom import so3
from lins_tpu.mapping import local_map as lmn
from lins_tpu.mapping import mapper as mp
from lins_tpu.mapping.scan2map import scan_to_map_grids
from lins_tpu.ops import grid_nn as g

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
# 65 pushes into a 50-window: 15 evictions -> tombstones in the live maps
for i in range(65):
    pos = jnp.asarray(rng.uniform(-20, 20, 3), jnp.float32)
    state = state._replace(lmap=push(state.lmap, jnp.int32(i), pos, q0,
                                     c_ds, c_ok, s_ds, s_ok, o_ds, o_ok))
jax.block_until_ready(state.lmap)
sgrid = state.lmap.surf_grid
cgrid = state.lmap.corner_grid
res = {"tombstones_surf": int(jnp.sum(
    (state.lmap.surf_vm.vcnt == 0)
    & (jnp.arange(state.lmap.surf_vm.cap)[None, :]
       < state.lmap.surf_vm.hwm[:, None])))}

C = 64
qs, qv = cloud(1024, -20, 20)
c0, ok0, d2C0, cov0 = jax.jit(partial(g.gather_candidates, C=C))(
    qs, qv, sgrid)
c1, ok1, d2C1, cov1 = jax.jit(partial(
    g.gather_candidates, C=C, use_pallas=True, interpret=True))(qs, qv, sgrid)
res["gather_ok_equal"] = bool(jnp.array_equal(ok0, ok1))
res["gather_cand_maxdiff"] = float(jnp.max(jnp.abs(
    jnp.where(ok0[:, :, None], c0 - c1, 0.0))))
res["d2C_min_ratio"] = float(jnp.min(jnp.where(
    jnp.isfinite(d2C0) & jnp.isfinite(d2C1), d2C1 / d2C0, 1.0)))

# full scan_to_map A/B (query sizes = the round-4 production caps)
qc, qcv = cloud(512, -20, 20)
qsur, qsv = cloud(4096, -20, 20)
t0 = jnp.zeros(3, jnp.float32)
qq0 = so3.quat_identity(jnp.float32)
n_c, n_s = state.lmap.n_corner, state.lmap.n_surf


def run(use_sel):
    c = cfg.replace(use_pallas_select=use_sel)
    fn = jax.jit(partial(scan_to_map_grids, cfg=c))
    return fn(t0, qq0, qc, qcv, qsur, qsv, cgrid, sgrid, n_c, n_s)


tA, qA, itA, nA, _ = run(False)
tB, qB, itB, nB, _ = run(True)
res["s2m_t_diff"] = float(jnp.linalg.norm(tA - tB))
res["s2m_q_dot"] = float(jnp.abs(jnp.sum(qA * qB)))
res["s2m_iters"] = [int(itA), int(itB)]
res["s2m_nsel"] = [int(nA), int(nB)]
print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                  for k, v in res.items()}))
