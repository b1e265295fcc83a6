"""On-DEVICE oracle: gather_candidates + knn_from_candidates vs brute-force
top_k_nn, executed on the TPU backend (round-3 lesson: the round-2
top_k+take path passed the same oracle on CPU but degraded accuracy on
TPU)."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lins_tpu.ops.grid_nn import build_grid_voxelized, gather_candidates, \
    knn_from_candidates
from lins_tpu.ops.voxel import top_k_nn

rng = np.random.default_rng(0)
r = jnp.asarray(rng.uniform(-20, 20, (60000, 3)), jnp.float32)
rv = jnp.ones(60000, bool)
grid, nv = jax.jit(lambda: build_grid_voxelized(r, rv, 0.4, 6, 16384, 216,
                                                nb=8))()
q = jnp.asarray(rng.uniform(-18, 18, (4096, 3)), jnp.float32)
qv = jnp.ones(4096, bool)

@jax.jit
def ours():
    cand, ok, d2C, cov = gather_candidates(q, qv, grid, 64)
    return knn_from_candidates(q, qv, cand, ok)

@jax.jit
def brute():
    # brute force against the voxel CENTROIDS the grid holds
    cells = grid.cells.transpose(0, 2, 1).reshape(-1, 3)
    valid = (jnp.arange(grid.cap)[None, :]
             < grid.cnt[:, None]).reshape(-1)
    return top_k_nn(q, qv, cells, valid, k=5)

nn, d2 = ours()
bi, bd2 = brute()
d2 = np.asarray(d2); bd2 = np.asarray(bd2)
gate = bd2[:, 4] < 1.0
print("queries passing 5NN-in-1m gate:", int(gate.sum()))
err = np.abs(d2[gate] - bd2[gate])
print("max |d2 diff| on gated queries:", float(err.max()))
assert gate.sum() > 500
assert err.max() < 2e-3, err.max()
print("TPU NN oracle OK")
