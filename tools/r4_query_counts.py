"""Round-4 probe: how many VALID mapping-GN queries does a real scan produce?

The scan-to-map query sets are padded to static caps (corner 1024, merged
surf+outlier 6144 at the VLP-16 preset) but the gather/sort/re-rank cost is
paid on the PADDED size.  This measures the actual voxel-downsampled counts
over synthetic full-size VLP-16 scans (gentle + turny + loop) to size a
tighter static query capacity.  CPU-only (front-end + voxel math, no TPU).
"""
import sys

sys.path.insert(0, "/root/repo")
import json

import jax

jax.config.update("jax_platforms", "cpu")
from jax.extend.backend import clear_backends

clear_backends()

import numpy as np
import jax.numpy as jnp

from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.frontend import pipeline as fp
from lins_tpu.frontend import segmentation as Seg
from lins_tpu.mapping import mapper as mp
from lins_tpu.ops.voxel import voxel_downsample

cfg = VLP16.replace(max_points=28800, use_pallas=False)
corner_cap, surf_cap, outlier_cap = mp.derive_caps(cfg)

from functools import partial


@partial(jax.jit, static_argnames=("cfg",))
def counts_one(xyz, n, cfg):
    pre = fp.frontend_pre(xyz, n, cfg)
    labels = Seg.label_components(pre["rng_img"], pre["eligible"], cfg)
    _, feats = fp.frontend_post(labels, pre, cfg)
    # mapping-step downsample (mapper._mapping_step_impl)
    c_ds, c_ok = voxel_downsample(feats.less_sharp.xyz,
                                  feats.less_sharp.valid,
                                  cfg.map_corner_leaf, corner_cap)
    s_ds, s_ok = voxel_downsample(feats.less_flat.xyz, feats.less_flat.valid,
                                  cfg.map_surf_leaf, surf_cap)
    o_ds, o_ok = voxel_downsample(feats.outlier.xyz, feats.outlier.valid,
                                  cfg.map_outlier_leaf, outlier_cap)
    _, st_ok = voxel_downsample(
        jnp.concatenate([s_ds, o_ds]), jnp.concatenate([s_ok, o_ok]),
        cfg.map_surf_leaf, surf_cap + outlier_cap)
    return (jnp.sum(feats.less_sharp.valid), jnp.sum(feats.less_flat.valid),
            jnp.sum(feats.outlier.valid), jnp.sum(c_ok), jnp.sum(st_ok))


res = {}
for kind in ("gentle", "turny", "loop"):
    n_sc = 10
    kw = dict(n_scans=150) if kind == "loop" else dict(n_scans=24)
    data = syn.generate_sequence(cfg, kind=kind, speed=1.5, **kw)
    idx = np.linspace(2, len(data["scans_xyz"]) - 1, n_sc).astype(int)
    rows = []
    for k in idx:
        out = counts_one(jnp.asarray(data["scans_xyz"][k], jnp.float32),
                         jnp.asarray(data["scans_n"][k]), cfg)
        rows.append([int(x) for x in out])
    rows = np.asarray(rows)
    res[kind] = {
        "less_sharp": [int(rows[:, 0].min()), int(rows[:, 0].max())],
        "less_flat": [int(rows[:, 1].min()), int(rows[:, 1].max())],
        "outlier": [int(rows[:, 2].min()), int(rows[:, 2].max())],
        "corner_q": [int(rows[:, 3].min()), int(rows[:, 3].max())],
        "surf_q": [int(rows[:, 4].min()), int(rows[:, 4].max())],
    }
print(json.dumps({"caps": {"corner": corner_cap,
                           "surf_merged": surf_cap + outlier_cap}, **res}))
