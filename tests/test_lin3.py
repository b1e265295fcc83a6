"""Closed-form 3x3 eigh/solve vs jnp.linalg oracles.

The mapping GN kernel (lins_tpu/mapping/scan2map.py) replaces
jnp.linalg.eigh / jnp.linalg.solve with the analytic forms in
lins_tpu/ops/lin3.py (reference uses cv::eigen / cv::solve,
lidar_mapping_node.cpp:1394-1399, 1477-1484); these tests pin the
closed forms to the library routines on well-conditioned batches and
check the documented degenerate-input behavior (finite, caller-masked).
"""
import jax.numpy as jnp
import numpy as np

from lins_tpu.ops.lin3 import eigh_sym3x3, solve_sym3x3


def _rand_sym(rng, n, scale=1.0):
    M = rng.standard_normal((n, 3, 3)) * scale
    return jnp.asarray((M + np.swapaxes(M, -1, -2)) / 2.0)


class TestEighSym3x3:
    def test_eigenvalues_match_lapack(self):
        rng = np.random.default_rng(0)
        A = _rand_sym(rng, 512)
        w, _ = eigh_sym3x3(A)
        w_ref = jnp.linalg.eigh(A)[0]
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   rtol=1e-8, atol=1e-9)

    def test_eigenvectors_satisfy_Av_lv(self):
        rng = np.random.default_rng(1)
        A = _rand_sym(rng, 512, scale=3.0)
        w, V = eigh_sym3x3(A)
        Av = jnp.einsum("nij,njk->nik", A, V)
        lv = w[:, None, :] * V
        np.testing.assert_allclose(np.asarray(Av), np.asarray(lv),
                                   rtol=0, atol=1e-7)

    def test_orthonormal(self):
        rng = np.random.default_rng(2)
        A = _rand_sym(rng, 256)
        _, V = eigh_sym3x3(A)
        G = jnp.einsum("nij,nik->njk", V, V)
        np.testing.assert_allclose(np.asarray(G),
                                   np.broadcast_to(np.eye(3), (256, 3, 3)),
                                   atol=1e-8)

    def test_anisotropic_covariance_principal_axis(self):
        # PCA use case in corner_residuals: 5 nearly collinear points.
        rng = np.random.default_rng(3)
        d = np.array([1.0, 2.0, -0.5])
        d /= np.linalg.norm(d)
        t = rng.standard_normal((64, 5, 1))
        pts = t * d + 0.01 * rng.standard_normal((64, 5, 3))
        c = pts.mean(axis=1, keepdims=True)
        dc = pts - c
        A = jnp.asarray(np.einsum("nki,nkj->nij", dc, dc) / 5.0)
        w, V = eigh_sym3x3(A)
        # largest eigenvector aligned with d (up to sign)
        dots = np.abs(np.asarray(V[:, :, 2]) @ d)
        assert dots.min() > 0.999
        assert np.all(np.asarray(w[:, 2]) > 3.0 * np.asarray(w[:, 1]))

    def test_isotropic_finite(self):
        A = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
        w, V = eigh_sym3x3(A)
        assert bool(jnp.all(jnp.isfinite(w))) and bool(jnp.all(jnp.isfinite(V)))
        np.testing.assert_allclose(np.asarray(w), 2.5, atol=1e-9)

    def test_repeated_eigenvalue_finite(self):
        # diag(1, 1, 5) and permutations: two-fold degeneracy
        A = jnp.stack([jnp.diag(jnp.array(d, dtype=jnp.float64))
                       for d in [(1., 1., 5.), (5., 1., 1.), (1., 5., 1.)]])
        w, V = eigh_sym3x3(A)
        assert bool(jnp.all(jnp.isfinite(w))) and bool(jnp.all(jnp.isfinite(V)))
        np.testing.assert_allclose(np.sort(np.asarray(w), axis=-1),
                                   [[1, 1, 5]] * 3, atol=1e-9)


class TestSolveSym3x3:
    def test_matches_solve(self):
        rng = np.random.default_rng(4)
        A = _rand_sym(rng, 512)
        A = A + 4.0 * jnp.eye(3)  # well-conditioned SPD-ish
        b = jnp.asarray(rng.standard_normal((512, 3)))
        x = solve_sym3x3(A, b)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=1e-9, atol=1e-10)

    def test_singular_is_finite(self):
        A = jnp.zeros((2, 3, 3))
        b = jnp.ones((2, 3))
        x = solve_sym3x3(A, b)
        assert bool(jnp.all(jnp.isfinite(x)))
