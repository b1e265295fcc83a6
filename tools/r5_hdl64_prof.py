"""Round-5 HDL-64 throughput profile (VERDICT r4 #5: the first 64x1800
end-to-end ran at 4.5 scans/s with no breakdown of where the 10x vs VLP-16
went).

Times the four dispatches of the chunked replay pipeline per scan, at both
presets, on the attached TPU:
  pre    = scan_pre_vmap        (projection/ground/segment-prep, K scans)
  label  = _label_vmapped       (Mosaic kernel at 16 rows, XLA union-find
                                 fallback at 64 rows)
  rest   = chunk_rest           (features + IESKF odometry, K scans)
  map    = mapper chunk step    (voxel downsamples + scan-to-map GN +
                                 keyframe/window updates at the 0.3 s
                                 cadence + 1 Hz loop attempts)

Usage: python tools/r5_hdl64_prof.py [--preset hdl64|vlp16] [--chunk 16]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(x):
    import jax
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(fn, *args, reps=6):
    out = fn(*args)
    fence(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    from lins_tpu.config import PRESETS
    from lins_tpu.datasets import synthetic as syn
    from lins_tpu.mapping.mapper import imu_roll_pitch
    from lins_tpu.odometry import estimator as est
    from lins_tpu.odometry.estimator import STATUS_RUNNING
    from lins_tpu.slam import LinsSlam
    from lins_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    preset = "hdl64"
    if "--preset" in sys.argv:
        preset = sys.argv[sys.argv.index("--preset") + 1]
    K = 16
    if "--chunk" in sys.argv:
        K = int(sys.argv[sys.argv.index("--chunk") + 1])

    on_tpu = jax.default_backend() != "cpu"
    cfg = PRESETS[preset].replace(use_pallas=on_tpu,
                                  use_pallas_select=on_tpu)
    cfg = cfg.replace(max_points=min(cfg.max_points, cfg.grid_size))
    warmup = 6
    n_scans = warmup + 2 * K
    t_gen = time.perf_counter()
    data = syn.generate_sequence(cfg, n_scans=n_scans, kind="gentle",
                                 speed=1.5)
    gen_s = time.perf_counter() - t_gen

    slam = LinsSlam(cfg)
    t_c = time.perf_counter()
    slam.warmup(chunk=K)
    compile_s = time.perf_counter() - t_c
    odo = slam.odometry

    imu_i, k = 0, 0
    while k < warmup or odo.status != STATUS_RUNNING:
        t_scan = data["scan_times"][k] + cfg.scan_period
        while (imu_i < len(data["imu_times"])
               and data["imu_times"][imu_i] <= t_scan + 1e-9):
            odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i],
                        data["imu_gyr"][imu_i])
            imu_i += 1
        slam.add_scan(t_scan, data["scans_xyz"][k], data["scans_n"][k])
        k += 1
    while imu_i < len(data["imu_times"]):
        odo.add_imu(data["imu_times"][imu_i], data["imu_acc"][imu_i],
                    data["imu_gyr"][imu_i])
        imu_i += 1

    ks = list(range(k, k + K))
    scan_ts = [data["scan_times"][j] + cfg.scan_period for j in ks]
    chunks = odo.prefetch_chunks(
        scan_ts, [data["scans_xyz"][j] for j in ks],
        [data["scans_n"][j] for j in ks], chunk=K, with_imu=True)
    ts, xs, ns, imu = chunks[0]
    dts_k, accs_k, gyrs_k, valid_k = imu

    res = {"preset": preset, "chunk": K, "gen_s": round(gen_s, 1),
           "compile_s": round(compile_s, 1)}

    # stage 1: frontend pre
    t, pre_k = timeit(lambda: est.scan_pre_vmap(xs, ns, cfg))
    res["pre_ms_per_scan"] = round(t / K * 1e3, 2)

    # stage 2: label
    interp = not on_tpu
    t, labels_k = timeit(lambda: est._label_vmapped(
        pre_k["e_right"], pre_k["e_down"], pre_k["eligible"], interp))
    res["label_ms_per_scan"] = round(t / K * 1e3, 2)

    # stage 3: features + odometry
    st0 = (odo.filter_state, odo.global_state, odo.last_surf,
           odo.last_corner)
    t, rest_out = timeit(lambda: est.chunk_rest(
        labels_k, pre_k, *st0, dts_k, accs_k, gyrs_k, valid_k, cfg))
    res["rest_ms_per_scan"] = round(t / K * 1e3, 2)

    # stage 4: mapping chunk at the real cadence
    _, (rns, qbns, rel_rn, rel_qbn, metrics, clouds) = rest_out
    mapper = slam.mapper
    imu_t = np.asarray(odo._imu_t, float)
    imu_a = np.stack(odo._imu_a)
    rp_all = np.full((K, 2), np.nan)
    for i, tt in enumerate(scan_ts):
        j = np.searchsorted(imu_t, tt + 1e-9) - 1
        if j >= 0:
            rp_all[i] = imu_roll_pitch(imu_a[j], cfg.gravity)
    mf, lf = mapper.plan_chunk(np.asarray(scan_ts))
    ts_dev = jax.device_put(np.asarray(scan_ts, np.float32))
    fdev = (jax.device_put(mf), jax.device_put(lf))
    rp_dev = jax.device_put(np.asarray(rp_all, odo.dtype))
    state0 = mapper.state

    def run_map():
        mapper.state = state0
        return mapper._chunk_step(mapper.state, rns, qbns, ts_dev,
                                  clouds["cxyz"], clouds["cval"],
                                  clouds["sxyz"], clouds["sval"],
                                  clouds["oxyz"], clouds["oval"],
                                  rp_dev, fdev[0], fdev[1])

    t, _ = timeit(run_map)
    res["map_ms_per_scan"] = round(t / K * 1e3, 2)
    res["map_steps_in_chunk"] = int(mf.sum())
    res["loop_attempts_in_chunk"] = int(lf.sum())

    total = (res["pre_ms_per_scan"] + res["label_ms_per_scan"]
             + res["rest_ms_per_scan"] + res["map_ms_per_scan"])
    res["total_ms_per_scan"] = round(total, 2)
    res["implied_scans_per_sec"] = round(1e3 / total, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
