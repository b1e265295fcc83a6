"""Kernel-level A/B: _blocks_pallas (fused Mosaic association) vs
_blocks_xla (masked-argmin MXU path) on one IESKF iteration's inputs at
full VLP-16 feature sizes, jitted standalone on the TPU."""
import sys; sys.path.insert(0, "/root/repo")
import json, time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp

from lins_tpu.config import VLP16
from lins_tpu.geom import so3
from lins_tpu.imu import eskf
from lins_tpu.odometry import ieskf
from lins_tpu.utils.compile_cache import enable_compilation_cache
from lins_tpu.frontend.types import FeatureCloud

enable_compilation_cache()
cfg = VLP16.replace(max_points=28800)
rng = np.random.default_rng(0)
dtype = jnp.float32

def fc(n):
    return FeatureCloud(
        xyz=jnp.asarray(rng.uniform(-30, 30, (n, 3)), dtype),
        rel_time=jnp.asarray(rng.uniform(0, 1, n), dtype),
        ring=jnp.asarray(rng.integers(0, 16, n), jnp.int32),
        valid=jnp.asarray(rng.random(n) > 0.1))

def ref(n):
    return dict(xyz=jnp.asarray(rng.uniform(-30, 30, (n, 3)), dtype),
                ring=jnp.asarray(rng.integers(0, 16, n), jnp.int32),
                valid=jnp.asarray(rng.random(n) > 0.1))

new_flat = fc(cfg.max_less_flat)
new_sharp = fc(cfg.max_less_sharp)
last_surf = ref(cfg.max_less_flat)
last_corner = ref(cfg.max_less_sharp)
lin = eskf.initial_state(cfg, dtype=dtype)
it = jnp.int32(0)

res = {}
for name, fn in (("xla", ieskf._blocks_xla), ("pallas", ieskf._blocks_pallas)):
    f = jax.jit(lambda nf, ns, ls, lc, l: fn(nf, ns, ls, lc, l, it, cfg, dtype))
    out = f(new_flat, new_sharp, last_surf, last_corner, lin)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(12):
        t0 = time.perf_counter()
        out = f(new_flat, new_sharp, last_surf, last_corner, lin)
        np.asarray(out[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    res[name + "_ms"] = round(1e3 * best, 3)
    res[name + "_matches"] = [int(out[3]), int(out[4])]
print(json.dumps(res))
