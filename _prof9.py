import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.frontend.pipeline import frontend_pre
from lins_tpu.ops.pallas_label import label_components_pallas
from lins_tpu.frontend import segmentation as Seg
from lins_tpu.frontend import features as F
from lins_tpu.frontend.types import FeatureCloud

cfg = VLP16.replace(max_points=28800)
data = syn.generate_sequence(cfg, n_scans=2, kind="gentle", speed=1.5)
xyz = jax.device_put(np.asarray(data["scans_xyz"][1], np.float32))
nn = jnp.int32(data["scans_n"][1])
p = jax.jit(partial(frontend_pre, cfg=cfg))(xyz, nn)
lab = label_components_pallas(p["e_right"], p["e_down"], p["eligible"])
label, seg_valid, outlier = jax.jit(partial(Seg.segment_from_labels, cfg=cfg))(lab, p["eligible"], p["ground"])
seg = jax.jit(partial(F.compact_rings, cfg=cfg))(p["xyz_img"], p["rng_img"], seg_valid, p["ground"], p["start"], p["diff"])
lab2, lfm = jax.jit(partial(F.extract_features_fast, cfg=cfg))(seg)
lfk = jax.jit(lambda x, m: F.voxel_mask_hash(x, m, cfg.surf_leaf_size))(seg.xyz, lfm)

def compact_scatter(xyz, rel, mask, cap):
    L, S = mask.shape
    rings = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, S)).reshape(-1)
    fm = mask.reshape(-1)
    pos = jnp.cumsum(fm.astype(jnp.int32)) - 1
    tgt = jnp.where(fm & (pos < cap), pos, cap)
    out_xyz = jnp.zeros((cap+1, 3), xyz.dtype).at[tgt].set(xyz.reshape(-1,3), mode="drop")[:cap]
    out_rel = jnp.zeros((cap+1,), rel.dtype).at[tgt].set(rel.reshape(-1), mode="drop")[:cap]
    out_ring = jnp.zeros((cap+1,), jnp.int32).at[tgt].set(rings, mode="drop")[:cap]
    n = jnp.minimum(pos[-1]+1, cap)
    return FeatureCloud(xyz=out_xyz, rel_time=out_rel, ring=out_ring, valid=jnp.arange(cap)<n)

cpA = jax.jit(lambda x, r, m: F._compact(x, r, m, cfg.max_less_flat))
cpB = jax.jit(lambda x, r, m: compact_scatter(x, r, m, cfg.max_less_flat))
a = cpA(seg.xyz, seg.rel_time, lfk); b = cpB(seg.xyz, seg.rel_time, lfk)
print("match:", bool(jnp.all(jnp.where(b.valid[:,None], a.xyz==b.xyz, True))), bool(jnp.all(a.valid==b.valid)), bool(jnp.all(jnp.where(b.valid, a.ring==b.ring, True))))

def timeit(f, n=30):
    o = f(); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(n): o = f()
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n*1e3
print("searchsorted compact: %.2f ms" % timeit(lambda: cpA(seg.xyz, seg.rel_time, lfk)))
print("scatter compact:      %.2f ms" % timeit(lambda: cpB(seg.xyz, seg.rel_time, lfk)))

# all five compacts fused in one jit, both ways
def all5_A():
    s = F._compact(seg.xyz, seg.rel_time, lab2 == 2, cfg.max_sharp)
    ls = F._compact(seg.xyz, seg.rel_time, lab2 >= 1, cfg.max_less_sharp)
    f = F._compact(seg.xyz, seg.rel_time, lab2 == -1, cfg.max_flat)
    lf = F._compact(seg.xyz, seg.rel_time, lfk, cfg.max_less_flat)
    return s, ls, f, lf
def all5_B():
    s = compact_scatter(seg.xyz, seg.rel_time, lab2 == 2, cfg.max_sharp)
    ls = compact_scatter(seg.xyz, seg.rel_time, lab2 >= 1, cfg.max_less_sharp)
    f = compact_scatter(seg.xyz, seg.rel_time, lab2 == -1, cfg.max_flat)
    lf = compact_scatter(seg.xyz, seg.rel_time, lfk, cfg.max_less_flat)
    return s, ls, f, lf
jA = jax.jit(all5_A); jB = jax.jit(all5_B)
print("4 compacts searchsorted: %.2f ms" % timeit(lambda: jA()))
print("4 compacts scatter:      %.2f ms" % timeit(lambda: jB()))
