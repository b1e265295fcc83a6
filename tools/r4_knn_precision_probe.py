"""On-TPU oracle for the round-4 re-rank distance bug: compare
knn_from_candidates' reported d2 on TPU against exact float64 NumPy on the
same inputs, at map-scale coordinates.  Run before/after the
einsum-HIGHEST fix to confirm the mechanism (XLA rewriting the
reduce-of-squares into a bf16-default dot)."""
import sys

sys.path.insert(0, "/root/repo")
import json

import numpy as np
import jax
import jax.numpy as jnp

from lins_tpu.ops.grid_nn import knn_from_candidates

rng = np.random.default_rng(0)
Q, C = 4096, 64
# map-scale coordinates (the bigger |p|, the bigger the bf16 error)
center = np.asarray([30.0, -20.0, 5.0])
cand = (center + rng.uniform(-2, 2, (Q, C, 3))).astype(np.float32)
p = (center + rng.uniform(-2, 2, (Q, 3))).astype(np.float32)
ok = np.ones((Q, C), bool)
qv = np.ones((Q,), bool)

nn, d2 = jax.jit(knn_from_candidates)(
    jnp.asarray(p), jnp.asarray(qv), jnp.asarray(cand), jnp.asarray(ok))
nn, d2 = np.asarray(nn), np.asarray(d2)

d2_exact = np.sum((cand.astype(np.float64)
                   - p[:, None].astype(np.float64)) ** 2, axis=-1)
d2_sorted = np.sort(d2_exact, axis=1)[:, :5]
err = np.abs(d2 - d2_sorted)
# and: is the returned nn actually the true 1-NN?
true_nn1 = cand[np.arange(Q), np.argmin(d2_exact, axis=1)]
nn1_wrong = np.mean(np.linalg.norm(nn[:, 0] - true_nn1, axis=1) > 1e-4)
print(json.dumps({
    "backend": jax.default_backend(),
    "d2_err_max": float(err.max()),
    "d2_err_mean": float(err.mean()),
    "frac_wrong_1nn": float(nn1_wrong),
}))
