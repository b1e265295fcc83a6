"""Differential driver: one realistic mapping step (real raycast scan
features, 1-keyframe map) under the code tree named by $LINS_PATH — run it
once with /root/repo and once with /root/repo/.wt_r3 (round-3 code) and
compare the printed metrics to localize the round-4 accuracy regression."""
import os
import sys

sys.path.insert(0, os.environ.get("LINS_PATH", "/root/repo"))
import jax

if os.environ.get("LINS_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()

import json

import numpy as np
import jax.numpy as jnp

from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.frontend import make_frontend
from lins_tpu.geom import so3
from lins_tpu.mapping.mapper import LinsMapper

kw = {}
if "map_query_corner" in VLP16.__dataclass_fields__:
    # neutralize the round-4 query caps so both trees see identical inputs
    kw = dict(map_query_corner=None, map_query_surf=None)
cfg = VLP16.replace(max_points=28800, **kw)
fe = make_frontend(cfg)
data = syn.generate_sequence(cfg, n_scans=6, kind="gentle", speed=1.5)
pose_fn = data["pose_fn"]


def feats_of(k):
    f = fe(jnp.asarray(data["scans_xyz"][k], jnp.float32),
           jnp.asarray(data["scans_n"][k]))[2]
    return (f.less_sharp.xyz.astype(jnp.float32), f.less_sharp.valid,
            f.less_flat.xyz.astype(jnp.float32), f.less_flat.valid,
            f.outlier.xyz.astype(jnp.float32), f.outlier.valid)


mapper = LinsMapper(cfg)
out = {}
for k, t in ((0, 0.1), (4, 0.5), (5, 0.9)):
    p, q = pose_fn(jnp.float32(t))
    c, cv, s, sv, o, ov = feats_of(k)
    # body-frame clouds: raycast scans are world-frame? they are BODY frame
    # (sensor-relative) already — feed with the gt pose as "odometry"
    r = mapper.process(t, jnp.asarray(p, jnp.float32),
                       jnp.asarray(q, jnp.float32), c, cv, s, sv, o, ov)
    m = mapper.metrics[-1]
    out[f"step{k}"] = dict(
        iters=int(m["iters"]), n_matches=int(m["n_matches"]),
        warm=float(m["warm_dist"]),
        t_m=[round(float(x), 5) for x in np.asarray(r[0])])
print(json.dumps(out))
