import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.odometry import LinsOdometry
from lins_tpu.odometry import estimator as est

cfg = VLP16.replace(max_points=28800, use_pallas=True)
K = 16
n_scans = 6 + K
data = syn.generate_sequence(cfg, n_scans=n_scans, kind="gentle", speed=1.5)
odo = LinsOdometry(cfg)
imu_i = 0
for k in range(6):
    t_scan = data["scan_times"][k] + cfg.scan_period
    while imu_i < len(data["imu_times"]) and data["imu_times"][imu_i] <= t_scan + 1e-9:
        odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i], data["imu_gyr"][imu_i]); imu_i += 1
    odo.add_scan(t_scan, data["scans_xyz"][k], data["scans_n"][k])
while imu_i < len(data["imu_times"]):
    odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i], data["imu_gyr"][imu_i]); imu_i += 1
ks = list(range(6, 6+K))
ts = [data["scan_times"][k] + cfg.scan_period for k in ks]
dts = np.zeros((K, cfg.max_imu_per_scan)); accs = np.zeros((K, cfg.max_imu_per_scan,3))
gyrs = np.zeros((K, cfg.max_imu_per_scan,3)); val = np.zeros((K, cfg.max_imu_per_scan), bool)
for i,k in enumerate(ks):
    d,a,g,v = odo._imu_batch_np(float(ts[i])); dts[i],accs[i],gyrs[i],val[i]=d,a,g,v
    odo.time = float(ts[i])
xyz_k = jax.device_put(np.stack([data["scans_xyz"][k] for k in ks]).astype(np.float32))
n_k = jax.device_put(np.asarray([data["scans_n"][k] for k in ks], np.int32))
dts_k = jax.device_put(dts.astype(np.float32)); accs_k = jax.device_put(accs.astype(np.float32))
gyrs_k = jax.device_put(gyrs.astype(np.float32)); val_k = jax.device_put(val)
def timeit(f, n=10):
    o = f(); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(n): o = f()
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n*1e3
pre_k = est.scan_pre_vmap(xyz_k, n_k, cfg)
t1 = timeit(lambda: est.scan_pre_vmap(xyz_k, n_k, cfg))
lab_k = est._label_vmapped(pre_k["e_right"], pre_k["e_down"], pre_k["eligible"], False)
t2 = timeit(lambda: est._label_vmapped(pre_k["e_right"], pre_k["e_down"], pre_k["eligible"], False))
state = (odo.filter_state, odo.global_state, odo.last_surf, odo.last_corner)
t3 = timeit(lambda: est.chunk_rest(lab_k, pre_k, *state, dts_k, accs_k, gyrs_k, val_k, cfg))
print("pre %.2f | label %.2f | rest %.2f -> %.2f ms/scan total" % (t1, t2, t3, (t1+t2+t3)/K))

# inside rest: post vs running via custom chunk without frontend_post
from lins_tpu.frontend.pipeline import frontend_post
def rest_post_only(lab_k, pre_k):
    def body(carry, inp):
        labels, pre = inp
        seg, feats = frontend_post(labels, pre, cfg)
        return carry, feats.sharp.xyz[0]
    return jax.lax.scan(body, 0, (lab_k, pre_k))
rp = jax.jit(rest_post_only)
t4 = timeit(lambda: rp(lab_k, pre_k))
print("post-only scan: %.2f ms (%.2f/scan)" % (t4, t4/K))
