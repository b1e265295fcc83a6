"""Closed-form batched 3x3 linear algebra.

`jnp.linalg.eigh` / `jnp.linalg.solve` lower to general Jacobi/LU routines
that cost ~2 ms per call for (10^3, 3, 3) batches on TPU — 100x the useful
FLOPs.  The mapping GN kernel (scan2map.py) calls both every iteration
(cornerOptimization's 3x3 PCA and surfOptimization's plane fit,
lidar_mapping_node.cpp:1394-1399, 1477-1484 — the reference uses
cv::eigen / cv::solve QR), so these analytic versions keep the whole
iteration elementwise on the VPU.

Degenerate inputs (repeated eigenvalues, singular systems) return finite
garbage instead of NaN; every call site masks those cases out by its own
validity test (linearity ratio / plane-fit tightness), matching the
reference's behavior.
"""
from __future__ import annotations

import jax.numpy as jnp


def eigh_sym3x3(A: jnp.ndarray):
    """Eigenvalues (ascending) + eigenvectors of symmetric (..., 3, 3).

    Trigonometric closed form (Smith 1961) for the eigenvalues; the
    eigenvector of eigenvalue λ_i comes from Cayley-Hamilton:
    (A - λ_j I)(A - λ_k I) has columns spanning the λ_i eigenspace.
    Returns (w (..., 3), V (..., 3, 3)) with V[..., :, i] the unit
    eigenvector for w[..., i] — same layout as jnp.linalg.eigh.
    """
    dtype = A.dtype
    eps = jnp.asarray(1e-20, dtype)

    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=dtype)
    Aq = A - q[..., None, None] * I
    p2 = jnp.sum(Aq * Aq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, eps))
    B = Aq / p[..., None, None]
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_pi_3 = jnp.asarray(2.0 * jnp.pi / 3.0, dtype)
    w2 = q + 2.0 * p * jnp.cos(phi)              # largest
    w0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)   # smallest
    w1 = 3.0 * q - w2 - w0
    # isotropic case (p2 ~ 0): all eigenvalues = q
    iso = p2 < eps
    w0 = jnp.where(iso, q, w0)
    w1 = jnp.where(iso, q, w1)
    w2 = jnp.where(iso, q, w2)
    w = jnp.stack([w0, w1, w2], axis=-1)

    def eigvec(li, lj, lk):
        # columns of (A - lj I)(A - lk I) span the li eigenspace
        M = (A - lj[..., None, None] * I) @ (A - lk[..., None, None] * I)
        # pick the largest column (soft: weight columns by norm^2 and sum
        # would cancel signs; instead select via argmax one-hot)
        n2 = jnp.sum(M * M, axis=-2)             # (..., 3) column norms
        sel = jnp.argmax(n2, axis=-1)
        v = jnp.take_along_axis(M, sel[..., None, None], axis=-1)[..., 0]
        nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        safe = jnp.maximum(nrm, jnp.asarray(1e-12, dtype))
        v = v / safe
        # fully degenerate: fall back to e_x (callers mask these)
        return jnp.where(nrm > 1e-12, v, I[:, 0])

    v0 = eigvec(w0, w1, w2)
    v2 = eigvec(w2, w0, w1)
    v1 = jnp.cross(v2, v0)
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v1 = jnp.where(n1 > 1e-12, v1 / jnp.maximum(n1, 1e-12), v0)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w, V


def solve_sym3x3(A: jnp.ndarray, b: jnp.ndarray):
    """Solve (..., 3, 3) @ x = (..., 3) for SYMMETRIC A by the adjugate
    (Cramer): x_i = (c_j x c_k) . b / det with c_i the columns of A.
    Symmetry makes adj(A) symmetric, so the contraction below (adj(A)^T b)
    equals adj(A) b.

    Singular systems return large-but-finite results (det clamped away
    from 0); callers mask by their own fit-validity checks.
    """
    dtype = A.dtype
    c0 = A[..., :, 0]
    c1 = A[..., :, 1]
    c2 = A[..., :, 2]
    x12 = jnp.cross(c1, c2)
    x20 = jnp.cross(c2, c0)
    x01 = jnp.cross(c0, c1)
    det = jnp.sum(c0 * x12, axis=-1)
    det_safe = jnp.where(jnp.abs(det) > 1e-20, det,
                         jnp.asarray(1e-20, dtype))
    x = (x12 * b[..., 0, None] + x20 * b[..., 1, None]
         + x01 * b[..., 2, None]) / det_safe[..., None]
    return x
