"""Mosaic compile canary (VERDICT r3 next-step #1d): is the Mosaic compile
pathology that blocks ops/pallas_assoc.py SIZE-dependent?

Compiles a minimal partial-selection kernel (the designed gather-prune
replacement: per-row C smallest of a (Q, B) distance block, iterative
min+mask — the same op mix as the association kernels' argmin loops) at a
TINY shape and at the production surf shape, each in a subprocess under a
hard timeout, and records wall-clock compile seconds.  The label kernel
(ops/pallas_label.py) compiles fine, so a tiny-shape success + big-shape
timeout localizes the pathology to shape-dependent Mosaic scheduling, not
the kernel op mix.

Usage: python tools/r4_mosaic_canary.py            # run all probes
       python tools/r4_mosaic_canary.py one Q B C  # single compile probe
"""
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def kernel_probe(Q, B, C):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    BIG = 2 ** 30

    def topk_kernel(d2_ref, out_ref):
        d2 = d2_ref[...]
        blk = d2.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (blk, C), 1)

        def body(i, carry):
            d2c, acc = carry
            m = jnp.min(d2c, axis=1)
            hit = d2c <= m[:, None]
            idx = jax.lax.broadcasted_iota(jnp.int32, d2c.shape, 1)
            fi = jnp.min(jnp.where(hit, idx, BIG), axis=1)
            first = idx == fi[:, None]
            # accumulate into registers (dynamic lane-indexed vector stores
            # need 128-multiple offsets in Mosaic); one store at the end
            acc = acc + jnp.where(col == i, m[:, None], 0.0)
            return jnp.where(first, jnp.inf, d2c), acc

        _, acc = jax.lax.fori_loop(
            0, C, body, (d2, jnp.zeros((blk, C), jnp.float32)))
        out_ref[...] = acc

    blk = min(Q, 128)
    fn = pl.pallas_call(
        topk_kernel,
        grid=(Q // blk,),
        in_specs=[pl.BlockSpec((blk, B), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((blk, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, C), jnp.float32),
    )
    x = jax.ShapeDtypeStruct((Q, B), jnp.float32)
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(x).compile()
    dt = time.perf_counter() - t0
    # run once to prove execution, not just compile
    import numpy as np
    rng = np.random.default_rng(0)
    d2 = jnp.asarray(rng.uniform(0, 100, (Q, B)), jnp.float32)
    out = np.asarray(compiled(d2))
    ref = np.sort(np.asarray(d2), axis=1)[:, :C]
    ok = bool(np.allclose(out, ref, atol=1e-5))
    print(json.dumps({"Q": Q, "B": B, "C": C,
                      "compile_s": round(dt, 1), "correct": ok}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        kernel_probe(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        sys.exit(0)
    probes = [(128, 256, 8, 300), (1024, 1728, 64, 600), (6144, 1728, 64, 900)]
    results = []
    for Q, B, C, tmo in probes:
        p = subprocess.run(
            ["timeout", str(tmo), sys.executable, __file__, "one",
             str(Q), str(B), str(C)],
            capture_output=True, text=True)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if line:
            results.append(json.loads(line[-1]))
        else:
            results.append({"Q": Q, "B": B, "C": C,
                            "compile_s": None, "timeout_s": tmo,
                            "rc": p.returncode,
                            "err": p.stderr.strip().splitlines()[-1:]})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"canary": results}))
