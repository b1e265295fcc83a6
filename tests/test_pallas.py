"""Mosaic partial-selection kernel vs the XLA sort path (interpret mode on
CPU; compiled on TPU by the bench).

The fused scan-to-scan ASSOCIATION kernels formerly parity-tested here were
sunset 2026-08-21 (attic/pallas_assoc.py): their scoped-VMEM stack is
43.2 MB at even a 128x256 toy shape vs the 16 MB Mosaic limit —
shape-independent, measured by tools/r5_assoc_canary.py — so the kernel
class as written cannot execute on this toolchain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import VLP16

CFG = VLP16


class TestPallasSelect:
    """Mosaic partial-selection kernel (ops/pallas_select.py) vs the XLA
    variadic-sort prune in gather_candidates — identical kept sets."""

    def _case(self, seed=0, n_map=20000):
        from lins_tpu.ops.grid_nn import build_grid_voxelized

        rng = np.random.default_rng(seed)
        pts = jnp.asarray(rng.uniform(-20, 20, (n_map, 3)), jnp.float32)
        ok = jnp.asarray(rng.random(n_map) > 0.05)
        grid, _ = build_grid_voxelized(pts, ok, leaf=0.4, m=6, table=4096,
                                       cap=216, nb=8)
        q = jnp.asarray(rng.uniform(-18, 18, (256, 3)), jnp.float32)
        qv = jnp.asarray(rng.random(256) > 0.1)
        return grid, q, qv

    def test_matches_sort_path(self):
        from lins_tpu.ops.grid_nn import gather_candidates

        grid, q, qv = self._case()
        C = 32
        c0, ok0, d2C0, cov0 = gather_candidates(q, qv, grid, C)
        c1, ok1, d2C1, cov1 = gather_candidates(q, qv, grid, C,
                                                use_pallas=True,
                                                interpret=True)
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok0))
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(cov1), np.asarray(cov0))
        # the kernel's d2C is the FIRST-DROPPED distance — a tighter,
        # still-sound prune bound than the sort path's C-th-kept distance
        d2C0, d2C1 = np.asarray(d2C0), np.asarray(d2C1)
        both = np.isfinite(d2C0) & np.isfinite(d2C1)
        assert np.all(d2C1[both] >= d2C0[both] - 1e-6)

    def test_invalid_and_far_rows(self):
        """Invalid queries get no candidates (nn parked on the query); far
        queries may gather hash-colliding far points (same as the XLA sort
        path — the downstream d2<1 acceptance gate rejects them) but both
        paths must agree exactly."""
        from lins_tpu.ops.grid_nn import gather_candidates

        grid, _, _ = self._case()
        q = jnp.asarray([[500.0, 500.0, 500.0], [0.0, 0.0, 0.0]],
                        jnp.float32)
        qv = jnp.asarray([True, False])
        c0, ok0, _, _ = gather_candidates(q, qv, grid, 16)
        c1, ok1, _, _ = gather_candidates(q, qv, grid, 16,
                                          use_pallas=True,
                                          interpret=True)
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok0))
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   atol=1e-6)
        # the qv=False row has no candidates and parks on the query
        assert not bool(np.asarray(ok1)[1].any())
        np.testing.assert_allclose(np.asarray(c1)[1],
                                   np.broadcast_to(np.zeros(3), (16, 3)))
