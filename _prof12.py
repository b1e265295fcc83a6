import time, numpy as np, jax, jax.numpy as jnp
from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.odometry import LinsOdometry

cfg = VLP16.replace(max_points=28800, use_pallas=True)
K = 16; n_chunks = 4
n_scans = 6 + (n_chunks+1)*K
data = syn.generate_sequence(cfg, n_scans=n_scans, kind="gentle", speed=1.5)

def one_pass():
    odo = LinsOdometry(cfg)
    imu_i = 0
    for k in range(6):
        t_scan = data["scan_times"][k] + cfg.scan_period
        while imu_i < len(data["imu_times"]) and data["imu_times"][imu_i] <= t_scan + 1e-9:
            odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i], data["imu_gyr"][imu_i]); imu_i += 1
        odo.add_scan(t_scan, data["scans_xyz"][k], data["scans_n"][k])
    while imu_i < len(data["imu_times"]):
        odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i], data["imu_gyr"][imu_i]); imu_i += 1
    # prefetch: ts stay host; xyz/n to device
    chunks = []
    for c in range(n_chunks+1):
        idx = list(range(6 + c*K, 6 + (c+1)*K))
        ts = np.asarray([data["scan_times"][k] + cfg.scan_period for k in idx])
        xs = jax.device_put(np.stack([data["scans_xyz"][k] for k in idx]).astype(np.float32))
        ns = jax.device_put(np.asarray([data["scans_n"][k] for k in idx], np.int32))
        chunks.append((ts, xs, ns))
    jax.block_until_ready([c[1] for c in chunks])
    out = odo.add_scan_chunk(*chunks[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for c in range(1, n_chunks+1):
        out = odo.add_scan_chunk(*chunks[c])
    jax.block_until_ready(out)
    return n_chunks*K/(time.perf_counter()-t0)
print("prefetched chunks: %.1f scans/s" % max(one_pass(), one_pass()))
