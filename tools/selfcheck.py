"""On-device accuracy canary (VERDICT r4 #6): catch the context-sensitive
TPU miscompile class WITHOUT human initiative.

Round 3 and round 4 each lost multi-day accuracy regressions to lowerings
that are exact standalone but wrong inside the fused mapping program on this
toolchain (hash-identity voxel merging + bf16 distance matmuls in r3; a
sort-carry re-rank and a precision=HIGHEST einsum in r4 — banned with
forensics in ops/grid_nn.py:334-373).  The tests are CPU-based and stay
green through all of those.  This canary runs the SAME single-mapping-step
program (real raycast features, 1-keyframe map, production entry config) on
the TPU and on CPU-XLA and compares the refined poses + match counts; any
future toolchain flip of a lowering in this class shows up as a pose
mismatch here.

Also compiles the production-shape Mosaic select kernel under a timeout
(the round-4 compile-pathology canary, tools/r4_mosaic_canary.py) so a
kernel-class compile regression is caught before a 50-minute bench hang.

Exit 0 = all green (one JSON line).  Exit 1 = mismatch (details printed).
Run by the standard round queue; also `python bench.py --selfcheck`.

Usage:
  python tools/selfcheck.py          # orchestrate both halves + compare
  python tools/selfcheck.py half cpu|dev   # one half (internal)
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Gate calibration (round-5 probes, committed in out/r5_selfcheck*.log and
# the jitter experiment below): the BENIGN cross-backend floor on IDENTICAL
# inputs at one GN iteration is ~1.5 cm pose / 4% match drift -- f32
# reduction reassociation in the map build (~1e-4 effective centroid
# perturbation) feeding tie-sensitive 5-NN selection on regular raycast
# geometry (a deliberate 1e-5 input jitter on ONE backend moves matches by
# ~0.6% and the pose by 1.5 mm; the measured cross-backend delta is ~10x
# that: pose 1.0-1.5 cm, matches 0.4-3.7%).  The miscompile class this
# canary guards sits an order of magnitude above these gates: the round-4
# banned lowerings collapsed matches 2216 -> 1375 (38%) and the round-3
# bf16 distance bug put 0.05-0.1 m errors inside acceptance gates.
POS_TOL_M = 0.05
ROT_TOL = 5e-3
N_MATCH_TOL = 0.10    # fraction of matches allowed to differ


def run_half(which, feats_path):
    import jax

    if which == "cpu":
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends
        clear_backends()

    import numpy as np
    import jax.numpy as jnp

    from lins_tpu.config import VLP16
    from lins_tpu.mapping.mapper import LinsMapper
    from lins_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    # the production TPU entry config (bench.py) on BOTH halves — the
    # select kernel runs in interpret mode on CPU (exact-parity-tested),
    # so the two halves execute the SAME mapping program.
    # scan2map_iters=1: a single GN iteration keeps the comparison
    # deterministic-modulo-arithmetic (the full iterated solve is chaotic
    # and drowns the miscompile signal).  BOTH halves load the SAME
    # precomputed feature arrays (built once by the cpu half): computing
    # the frontend per-half injects 1-4% query-set drift from f32
    # tie-breaking in curvature/top-k that has nothing to do with the
    # mapping-program lowerings this canary guards.
    cfg = VLP16.replace(max_points=28800, use_pallas=True,
                        use_pallas_select="nosel" not in sys.argv,
                        scan2map_iters=1)

    if which == "cpu" and not os.path.exists(feats_path):
        from lins_tpu.datasets import synthetic as syn
        from lins_tpu.frontend import make_frontend

        fe = make_frontend(cfg)
        data = syn.generate_sequence(cfg, n_scans=6, kind="gentle",
                                     speed=1.5)
        pose_fn = data["pose_fn"]
        save = {}
        for k, t in ((0, 0.1), (4, 0.5), (5, 0.9)):
            f = fe(jnp.asarray(data["scans_xyz"][k], jnp.float32),
                   jnp.asarray(data["scans_n"][k]))[2]
            p, q = pose_fn(jnp.float32(t))
            save[f"{k}_c"] = np.asarray(f.less_sharp.xyz, np.float32)
            save[f"{k}_cv"] = np.asarray(f.less_sharp.valid)
            save[f"{k}_s"] = np.asarray(f.less_flat.xyz, np.float32)
            save[f"{k}_sv"] = np.asarray(f.less_flat.valid)
            save[f"{k}_o"] = np.asarray(f.outlier.xyz, np.float32)
            save[f"{k}_ov"] = np.asarray(f.outlier.valid)
            save[f"{k}_p"] = np.asarray(p, np.float32)
            save[f"{k}_q"] = np.asarray(q, np.float32)
        np.savez(feats_path, **save)

    z = np.load(feats_path)
    mapper = LinsMapper(cfg)
    out = {}
    for k, t in ((0, 0.1), (4, 0.5), (5, 0.9)):
        r = mapper.process(
            t, jnp.asarray(z[f"{k}_p"]), jnp.asarray(z[f"{k}_q"]),
            jnp.asarray(z[f"{k}_c"]), jnp.asarray(z[f"{k}_cv"]),
            jnp.asarray(z[f"{k}_s"]), jnp.asarray(z[f"{k}_sv"]),
            jnp.asarray(z[f"{k}_o"]), jnp.asarray(z[f"{k}_ov"]))
        m = mapper.metrics[-1]
        out[f"step{k}"] = dict(
            iters=int(m["iters"]), n_matches=int(m["n_matches"]),
            t_m=[float(x) for x in np.asarray(r[0])],
            q_m=[float(x) for x in np.asarray(r[1])])
    print("HALF " + json.dumps(out))
    return 0


def select_compile_probe(timeout_s=120):
    """Production-shape Mosaic select-kernel compile under a hard timeout
    (subprocess; the pathology mode is a compile that never returns)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax, jax.numpy as jnp, numpy as np, time\n"
        "from lins_tpu.ops.pallas_select import select_candidates\n"
        "Q, B, C = 4096, 1728, 64\n"
        "rng = np.random.default_rng(0)\n"
        "q = jnp.asarray(rng.uniform(-3, 3, (Q, 3)), jnp.float32)\n"
        "qv = jnp.ones((Q,), bool)\n"
        "cs = [jnp.asarray(rng.uniform(-3, 3, (Q, B)), jnp.float32)"
        " for _ in range(3)]\n"
        "ok = jnp.ones((Q, B), bool)\n"
        "t0 = time.time()\n"
        "f = jax.jit(lambda *a: select_candidates(*a, C=C)).lower("
        "q, qv, *cs, ok).compile()\n"
        "print('COMPILE_OK', round(time.time() - t0, 1))\n" % REPO)
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        ok = "COMPILE_OK" in r.stdout
        line = [l for l in r.stdout.splitlines() if "COMPILE_OK" in l]
        return ok, (line if ok
                    else (r.stdout + r.stderr).strip().splitlines()[-1:])
    except subprocess.TimeoutExpired:
        return False, [f"select-kernel compile exceeded {timeout_s}s"]


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "half":
        sys.exit(run_half(sys.argv[2], sys.argv[3]))

    import tempfile

    feats_path = os.path.join(tempfile.mkdtemp(prefix="selfcheck_"),
                              "feats.npz")
    halves = {}
    for which in ("cpu", "dev"):     # cpu first: it builds the features
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "half", which,
             feats_path],
            capture_output=True, text=True, timeout=1800)
        line = [l for l in r.stdout.splitlines() if l.startswith("HALF ")]
        if r.returncode != 0 or not line:
            print(json.dumps({"selfcheck": "fail",
                              "half": which, "rc": r.returncode,
                              "tail": (r.stdout + r.stderr)[-800:]}))
            sys.exit(1)
        halves[which] = json.loads(line[-1][5:])

    import numpy as np

    worst_pos, worst_rot, mism = 0.0, 0.0, []
    for step, dv in halves["dev"].items():
        cv = halves["cpu"][step]
        dp = float(np.max(np.abs(np.asarray(dv["t_m"])
                                 - np.asarray(cv["t_m"]))))
        dq = float(np.min([np.max(np.abs(np.asarray(dv["q_m"])
                                         - s * np.asarray(cv["q_m"])))
                           for s in (1.0, -1.0)]))
        worst_pos, worst_rot = max(worst_pos, dp), max(worst_rot, dq)
        if (dp > POS_TOL_M or dq > ROT_TOL
                or abs(dv["n_matches"] - cv["n_matches"])
                > N_MATCH_TOL * max(cv["n_matches"], 1)):
            mism.append(dict(step=step, dpos=dp, dquat=dq,
                             n_dev=dv["n_matches"], n_cpu=cv["n_matches"]))

    sel_ok, sel_msg = select_compile_probe()
    ok = not mism and sel_ok
    print(json.dumps({
        "selfcheck": "ok" if ok else "FAIL",
        "worst_pos_diff_m": round(worst_pos, 6),
        "worst_quat_diff": round(worst_rot, 6),
        "pos_tol_m": POS_TOL_M,
        "select_compile": sel_msg,
        "mismatches": mism,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
