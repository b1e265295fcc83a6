import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.frontend.pipeline import frontend_pre
from lins_tpu.ops.pallas_label import label_components_pallas
from lins_tpu.frontend import segmentation as Seg
from lins_tpu.frontend import features as F

cfg = VLP16.replace(max_points=28800)
data = syn.generate_sequence(cfg, n_scans=2, kind="gentle", speed=1.5)
xyz = jax.device_put(np.asarray(data["scans_xyz"][1], np.float32))
nn = jnp.int32(data["scans_n"][1])
p = jax.jit(partial(frontend_pre, cfg=cfg))(xyz, nn)
lab = label_components_pallas(p["e_right"], p["e_down"], p["eligible"])
label, seg_valid, outlier = jax.jit(partial(Seg.segment_from_labels, cfg=cfg))(lab, p["eligible"], p["ground"])
seg = jax.jit(partial(F.compact_rings, cfg=cfg))(p["xyz_img"], p["rng_img"], seg_valid, p["ground"], p["start"], p["diff"])

eff = jax.jit(partial(F.extract_features_fast, cfg=cfg))
vmh = jax.jit(lambda x, m: F.voxel_mask_hash(x, m, cfg.surf_leaf_size))
lab2, lfm = eff(seg)
lfk = vmh(seg.xyz, lfm)
cp = jax.jit(lambda xyz, rel, mask: F._compact(xyz, rel, mask, cfg.max_less_flat))
def timeit(f, n=20):
    o = f(); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(n): o = f()
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n*1e3
base = timeit(lambda: jnp.sin(seg.rng))  # dispatch floor probe
print("dispatch floor (sin 16x1800): %.2f ms" % base)
print("extract_features_fast: %.2f ms" % timeit(lambda: eff(seg)))
print("voxel_mask_hash: %.2f ms" % timeit(lambda: vmh(seg.xyz, lfm)))
print("one _compact(max_less_flat): %.2f ms" % timeit(lambda: cp(seg.xyz, seg.rel_time, lfk)))
# curvature+occlusion alone
co = jax.jit(lambda rng, col, cnt: (jax.vmap(F.curvature_ring)(rng, cnt), jax.vmap(F.occlusion_ring)(rng, col, cnt)))
print("curvature+occlusion: %.2f ms" % timeit(lambda: co(seg.rng, seg.col, seg.count)))
print("caps:", cfg.max_sharp, cfg.max_less_sharp, cfg.max_flat, cfg.max_less_flat, cfg.max_outlier)
