"""Round-5 probe: VALID mapping-GN query counts per scan for ANY preset
(generalizes tools/r4_query_counts.py, which sized the VLP-16 caps) — the
evidence base for measured-occupancy `map_query_*` caps on the 64-beam
presets (VERDICT r4 #5: HDL-64 paid full-cap gather/sort/re-rank cost).

Usage: python tools/r5_query_counts.py [--preset hdl64] [--scans 8]
Runs the front-end + mapping downsample math only; works on CPU or TPU.
"""
import json
import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lins_tpu.config import PRESETS
    from lins_tpu.datasets import synthetic as syn
    from lins_tpu.frontend import pipeline as fp
    from lins_tpu.frontend import segmentation as Seg
    from lins_tpu.mapping import mapper as mp

    from lins_tpu.ops.voxel import voxel_downsample

    preset = "hdl64"
    if "--preset" in sys.argv:
        preset = sys.argv[sys.argv.index("--preset") + 1]
    n_sc = 8
    if "--scans" in sys.argv:
        n_sc = int(sys.argv[sys.argv.index("--scans") + 1])

    cfg = PRESETS[preset].replace(use_pallas=False)
    cfg = cfg.replace(max_points=min(cfg.max_points, cfg.grid_size))
    corner_cap, surf_cap, outlier_cap = mp.derive_caps(cfg)

    @partial(jax.jit, static_argnames=("cfg",))
    def counts_one(xyz, n, cfg):
        pre = fp.frontend_pre(xyz, n, cfg)
        labels = Seg.label_components(pre["rng_img"], pre["eligible"], cfg)
        _, feats = fp.frontend_post(labels, pre, cfg)
        c_ds, c_ok = voxel_downsample(feats.less_sharp.xyz,
                                      feats.less_sharp.valid,
                                      cfg.map_corner_leaf, corner_cap)
        s_ds, s_ok = voxel_downsample(feats.less_flat.xyz,
                                      feats.less_flat.valid,
                                      cfg.map_surf_leaf, surf_cap)
        o_ds, o_ok = voxel_downsample(feats.outlier.xyz, feats.outlier.valid,
                                      cfg.map_outlier_leaf, outlier_cap)
        _, st_ok = voxel_downsample(
            jnp.concatenate([s_ds, o_ds]), jnp.concatenate([s_ok, o_ok]),
            cfg.map_surf_leaf, surf_cap + outlier_cap)
        return (jnp.sum(feats.less_sharp.valid),
                jnp.sum(feats.less_flat.valid),
                jnp.sum(feats.outlier.valid), jnp.sum(c_ok), jnp.sum(st_ok))

    res = {"preset": preset,
           "caps": {"corner": corner_cap,
                    "surf_merged": surf_cap + outlier_cap}}
    for kind in ("gentle", "turny"):
        data = syn.generate_sequence(cfg, kind=kind, speed=1.5,
                                     n_scans=max(n_sc + 2, 10))
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
    print(json.dumps(res))


if __name__ == "__main__":
    main()
