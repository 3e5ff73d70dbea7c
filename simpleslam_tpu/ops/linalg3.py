"""Closed-form batched 3x3 linear algebra (VPU-friendly, no LAPACK pipelines).

Small fixed-size decompositions appear per-point in the registration kernels
(plane fits, covariance conditioning); batched closed forms keep them pure
elementwise math on the VPU instead of serialized LAPACK-style loops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def solve3x3(A: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched Cramer's-rule solve. Returns (x, ok) — ok flags usable det.

    Only appropriate for well-scaled matrices (f32 determinant); prefer
    symeig3x3-based paths for near-singular systems.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    scale = jnp.max(jnp.abs(A), axis=(-1, -2))
    ok = jnp.abs(det) > 1e-7 * jnp.maximum(scale, 1e-12) ** 3
    det_safe = jnp.where(ok, det, 1.0)
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    x0 = (c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2]) / det_safe
    x1 = (c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2]) / det_safe
    x2 = (c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]) / det_safe
    return jnp.stack([x0, x1, x2], axis=-1), ok


def symeig3x3_values(M: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (..., 3, 3), ascending — trigonometric form."""
    m00, m11, m22 = M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]
    m01, m02, m12 = M[..., 0, 1], M[..., 0, 2], M[..., 1, 2]
    p1 = m01 * m01 + m02 * m02 + m12 * m12
    q = (m00 + m11 + m22) / 3.0
    p2 = (m00 - q) ** 2 + (m11 - q) ** 2 + (m22 - q) ** 2 + 2.0 * p1
    diag_case = p2 <= 1e-24
    p = jnp.sqrt(jnp.where(diag_case, 1.0, p2) / 6.0)
    # B = (M - qI)/p; r = det(B)/2
    b00, b11, b22 = (m00 - q) / p, (m11 - q) / p, (m22 - q) / p
    b01, b02, b12 = m01 / p, m02 / p, m12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    lam = jnp.stack([e_lo, e_mid, e_hi], axis=-1)
    return jnp.where(diag_case[..., None], q[..., None] * jnp.ones(3, M.dtype), lam)


def _eigvec_for(M: jax.Array, lam_a: jax.Array, lam_b: jax.Array) -> jax.Array:
    """Unit eigenvector of the remaining eigenvalue via column space of
    (M - lam_a I)(M - lam_b I) (Eberly's method); batched."""
    eye = jnp.eye(3, dtype=M.dtype)
    P = (M - lam_a[..., None, None] * eye) @ (M - lam_b[..., None, None] * eye)
    norms = jnp.linalg.norm(P, axis=-2)  # column norms (..., 3)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(P, best[..., None, None], axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-20)


def symeig3x3_smallest(M: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(eigenvalues ascending (..., 3), unit eigenvector of the smallest).

    The eigenvector is reliable when lam0 is separated from lam1 — exactly
    the regime the registration gates require anyway.
    """
    lam = symeig3x3_values(M)
    v = _eigvec_for(M, lam[..., 1], lam[..., 2])
    return lam, v


def symeig3x3(M: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Full symmetric eigendecomposition: (eigenvalues ascending, eigenvectors
    (..., 3, 3) with columns matching). Assumes reasonably separated spectra;
    repeated eigenvalues get orthogonalized via cross products."""
    lam = symeig3x3_values(M)
    v0 = _eigvec_for(M, lam[..., 1], lam[..., 2])
    v2 = _eigvec_for(M, lam[..., 0], lam[..., 1])
    # make v2 orthogonal to v0, then complete the triad
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    # fallback if degenerate: any vector orthogonal to v0
    alt = jnp.cross(v0, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], M.dtype), v0.shape))
    alt2 = jnp.cross(v0, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], M.dtype), v0.shape))
    alt = jnp.where(
        jnp.linalg.norm(alt, axis=-1, keepdims=True) > 0.1, alt, alt2
    )
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-20)
    v2 = jnp.where(n2 > 1e-6, v2 / jnp.maximum(n2, 1e-20), alt)
    v1 = jnp.cross(v2, v0)
    return lam, jnp.stack([v0, v1, v2], axis=-1)
