import time, numpy as np, jax
from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.odometry import LinsOdometry

cfg = VLP16.replace(max_points=28800, use_pallas=True)
K = 16; n_chunks = 4
n_scans = 6 + (n_chunks+1)*K
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
ks = list(range(6, n_scans))
def chunk(idx):
    t0 = time.perf_counter()
    ts = np.asarray([data["scan_times"][k] + cfg.scan_period for k in idx])
    xs = np.stack([data["scans_xyz"][k] for k in idx])
    ns = np.asarray([data["scans_n"][k] for k in idx])
    t1 = time.perf_counter()
    out = odo.add_scan_chunk(ts, xs, ns)
    t2 = time.perf_counter()
    return out, (t1-t0)*1e3, (t2-t1)*1e3
out,_,_ = chunk(ks[:K]); jax.block_until_ready(out)
t0 = time.perf_counter()
tot_prep = tot_call = 0.0
for c in range(1, n_chunks+1):
    out, prep, call = chunk(ks[c*K:(c+1)*K])
    tot_prep += prep; tot_call += call
jax.block_until_ready(out)
wall = (time.perf_counter()-t0)*1e3
print("wall/chunk %.1f ms; np-prep %.1f; add_scan_chunk host %.1f; implied wait %.1f" %
      (wall/n_chunks, tot_prep/n_chunks, tot_call/n_chunks, (wall-tot_prep-tot_call)/n_chunks))
print("-> %.1f scans/s" % (n_chunks*K/wall*1e3))
