"""Round-5 decision probe for ops/pallas_assoc.py (VERDICT r4 #7).

The fused Mosaic scan-to-scan association kernels have never compiled for
TPU execution in practical time on this relay toolchain (50-min bench
timeout r2, 40-min standalone micro timeout r3) while the smaller label and
select kernels compile in ~1 s.  The round-4 select-kernel canary proved
the compile pathology is KERNEL-CLASS-specific, so this probe applies the
exact method that un-blocked pallas_select — compile at a tiny shape first,
then scale — to the surf association kernel, each attempt in a subprocess
under a hard timeout.

A tiny-shape timeout => the pathology is the kernel class itself (the
argmin/ring-window op mix), not size, and the kernels get sunset.
Tiny success + production timeout => size-dependent scheduling; record the
largest shape that compiles.

Usage: python tools/r5_assoc_canary.py            # run the probe ladder
       python tools/r5_assoc_canary.py one Q R    # single compile probe
"""
import json
import subprocess
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def one(Q, R):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lins_tpu.ops import pallas_assoc as pa

    rng = np.random.default_rng(0)
    q_xyz = jnp.asarray(rng.uniform(-10, 10, (Q, 3)), jnp.float32)
    q_rel = jnp.asarray(rng.uniform(0, 1, (Q,)), jnp.float32)
    q_valid = jnp.ones((Q,), bool)
    r_xyz = jnp.asarray(rng.uniform(-10, 10, (R, 3)), jnp.float32)
    r_ring = jnp.asarray(rng.integers(0, 16, (R,)), jnp.float32)
    r_valid = jnp.ones((R,), bool)
    rn = jnp.zeros(3, jnp.float32)
    qbn = jnp.asarray([1.0, 0, 0, 0], jnp.float32)

    t0 = time.time()
    fn = jax.jit(lambda *a: pa.surf_normal_equations(
        *a, jnp.int32(1), tile_q=min(128, Q)))
    fn.lower(q_xyz, q_rel, q_valid, r_xyz, r_ring, r_valid,
             rn, qbn).compile()
    print("COMPILE_OK", Q, R, round(time.time() - t0, 1))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        one(int(sys.argv[2]), int(sys.argv[3]))
        return

    # ladder: tiny -> production surf shape (Q=6144 queries, R=6144 refs)
    ladder = [(128, 256), (512, 1024), (2048, 2048), (6144, 6144)]
    results = []
    for Q, R in ladder:
        try:
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, __file__, "one", str(Q), str(R)],
                timeout=420, capture_output=True, text=True)
            ok = "COMPILE_OK" in r.stdout
            results.append(dict(Q=Q, R=R, ok=ok,
                                secs=round(time.time() - t0, 1),
                                tail=(r.stdout + r.stderr).strip()
                                .splitlines()[-1:] if not ok else []))
        except subprocess.TimeoutExpired:
            results.append(dict(Q=Q, R=R, ok=False, secs=420.0,
                                tail=["compile timeout 420s"]))
        print(json.dumps(results[-1]))
        if not results[-1]["ok"]:
            break
    print(json.dumps({"probe": "assoc_compile_ladder", "results": results}))


if __name__ == "__main__":
    main()
