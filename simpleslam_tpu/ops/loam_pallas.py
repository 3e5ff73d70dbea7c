"""Pallas TPU kernel: the fused LOAM GN linearization.

STATUS (round 4): off the production hot path. The gn_loop redesign
(loam.fit_planes — the 5-NN selection + plane fit is pose-independent, so
it runs once per gather instead of once per iteration) removed the
per-iteration (Q, C) passes this kernel fused; what remains per iteration
is ~0.05 ms of (Q, 6) work XLA handles well. On the axon remote-compile
access path the kernel is additionally unusable: the Mosaic compile takes
375 s per process and MISSES the persistent compilation cache (measured
round 4 — a warm-cache fresh process still exceeded a 300 s timeout), so
the bench could never run it. It is kept as the reference one-pass
linearization for direct-attach deployments (where Mosaic caches normally)
with CPU interpret-mode parity tests (tests/test_loam_pallas.py).

One GN iteration of the PRE-redesign ``ops/loam.py`` spent ~1.2 ms spread
over ~10 XLA fusions (5 argmin-round passes over the (8192, 192) distance
matrix, the plane-fit einsums, the normal-equation reductions), every one
re-reading the (Q, C) tile set from HBM. This kernel fuses the ENTIRE
post-gather linearization — 5-NN selection, centered-scatter plane fit
(closed-form 3x3 eigensolve), validity gates, and the J^T J / J^T e
reduction — into ONE pass: candidates are read once and never round-trip
to HBM again.

Layout: queries ride the LANE axis (128/block), candidates the SUBLANE axis
(C rows), so per-query scalars are natural (1, 128) rows, candidate
reductions are sublane reductions, and the final normal-equation contraction
is a (6, 128) x (128, 6) MXU dot per block, accumulated across a sequential
grid into a single (6, 6) output.

Semantics are EXACTLY ``loam.normal_equations_from_candidates`` (parity is
tested in tests/test_loam_pallas.py via pallas interpret mode on CPU); the
reference behaviour both implement is the point-to-plane row assembly of
/root/reference/PCR/src/LoamRegister.cpp:122-176.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pointcloud import PointCloud

# candidates whose gather slot is invalid get this squared distance; kept
# big-finite (not inf) so equality-based argmin rounds never compare inf==inf
BIG = 1e30

Q_BLOCK = 128


def _acos(x: jax.Array) -> jax.Array:
    """arccos for x in [-1, 1] — acos has no Pallas TPU lowering, so use the
    Abramowitz & Stegun 4.4.45 polynomial (|err| < 2e-8, below f32 eps):
    acos(x) = sqrt(1-x) * P(x) for x >= 0, pi - acos(-x) for x < 0.
    """
    a = jnp.abs(x)
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * a + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(1.0 - a, 0.0)) * p
    return jnp.where(x < 0.0, jnp.float32(jnp.pi) - r, r)


def _kernel(cand_ref, ok_ref, pm_ref, aux_ref, jtj_ref, jte_ref, nv_ref, *,
            n_cand: int, plane_pts: int, max_search_sq: float,
            plane_valid: float, point_valid: float, min_planar_ev: float,
            max_thickness_ev: float):
    j = pl.program_id(0)

    x = cand_ref[0]          # (C, 128) candidate coordinates
    y = cand_ref[1]
    z = cand_ref[2]
    okf = ok_ref[...]        # (C, 128) 0/1 candidate-slot validity
    px = pm_ref[0:1, :]      # (1, 128) query points (map frame)
    py = pm_ref[1:2, :]
    pz = pm_ref[2:3, :]
    qmask = aux_ref[0:1, :]       # (1, 128) source-point validity
    inv_sqrt_r = aux_ref[1:2, :]  # (1, 128) 1/sqrt(max(|p_src|, 1e-6))

    dx = x - px
    dy = y - py
    dz = z - pz
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(okf > 0.5, d2, BIG)

    # 5-NN membership by argmin rounds with first-occurrence tie-break
    # (loam.normal_equations_from_candidates's cumsum==1, expressed as
    # min-index-of-hit so it stays a pure sublane reduction)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    w5 = jnp.zeros_like(d2)
    dd = d2
    d_k = jnp.zeros((1, d2.shape[1]), jnp.float32)
    for _ in range(plane_pts):
        d_k = jnp.min(dd, axis=0, keepdims=True)
        hit = (dd == d_k) & (d_k < 0.5 * BIG)
        first = jnp.min(jnp.where(hit, iota_c, n_cand), axis=0,
                        keepdims=True)
        hit = hit & (iota_c == first)
        w5 = w5 + hit.astype(jnp.float32)
        dd = jnp.where(hit, BIG, dd)
    n_sel = jnp.sum(w5, axis=0, keepdims=True)
    gate = (qmask > 0.5) & (d_k < max_search_sq) & (n_sel >= plane_pts)

    inv_k = 1.0 / plane_pts
    cx = jnp.sum(w5 * x, axis=0, keepdims=True) * inv_k
    cy = jnp.sum(w5 * y, axis=0, keepdims=True) * inv_k
    cz = jnp.sum(w5 * z, axis=0, keepdims=True) * inv_k
    bx = x - cx
    by = y - cy
    bz = z - cz
    m00 = jnp.sum(w5 * bx * bx, axis=0, keepdims=True)
    m01 = jnp.sum(w5 * bx * by, axis=0, keepdims=True)
    m02 = jnp.sum(w5 * bx * bz, axis=0, keepdims=True)
    m11 = jnp.sum(w5 * by * by, axis=0, keepdims=True)
    m12 = jnp.sum(w5 * by * bz, axis=0, keepdims=True)
    m22 = jnp.sum(w5 * bz * bz, axis=0, keepdims=True)

    # eigenvalues of the symmetric scatter, trigonometric closed form
    # (component expansion of linalg3.symeig3x3_values)
    p1 = m01 * m01 + m02 * m02 + m12 * m12
    q = (m00 + m11 + m22) / 3.0
    p2 = (m00 - q) ** 2 + (m11 - q) ** 2 + (m22 - q) ** 2 + 2.0 * p1
    diag_case = p2 <= 1e-24
    p = jnp.sqrt(jnp.where(diag_case, 1.0, p2) / 6.0)
    b00 = (m00 - q) / p
    b11 = (m11 - q) / p
    b22 = (m22 - q) / p
    b01 = m01 / p
    b02 = m02 / p
    b12 = m12 / p
    det_b = (b00 * (b11 * b22 - b12 * b12)
             - b01 * (b01 * b22 - b12 * b02)
             + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = _acos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    lam0 = jnp.where(diag_case, q, e_lo)
    lam1 = jnp.where(diag_case, q, e_mid)
    lam2 = jnp.where(diag_case, q, e_hi)

    # unit eigenvector of lam0 via the column space of
    # (M - lam1 I)(M - lam2 I) (linalg3._eigvec_for, component form;
    # A and B are symmetric so p_ik = sum_j a_ij b_jk over 6 uniques each)
    a00, a11, a22 = m00 - lam1, m11 - lam1, m22 - lam1
    c00, c11, c22 = m00 - lam2, m11 - lam2, m22 - lam2
    p00 = a00 * c00 + m01 * m01 + m02 * m02
    p10 = m01 * c00 + a11 * m01 + m12 * m02
    p20 = m02 * c00 + m12 * m01 + a22 * m02
    p01 = a00 * m01 + m01 * c11 + m02 * m12
    p11 = m01 * m01 + a11 * c11 + m12 * m12
    p21 = m02 * m01 + m12 * c11 + a22 * m12
    p02 = a00 * m02 + m01 * m12 + m02 * c22
    p12 = m01 * m02 + a11 * m12 + m12 * c22
    p22 = m02 * m02 + m12 * m12 + a22 * c22
    n0 = jnp.sqrt(p00 * p00 + p10 * p10 + p20 * p20)
    n1 = jnp.sqrt(p01 * p01 + p11 * p11 + p21 * p21)
    n2 = jnp.sqrt(p02 * p02 + p12 * p12 + p22 * p22)
    best0 = (n0 >= n1) & (n0 >= n2)   # argmax first-occurrence semantics
    best1 = (~best0) & (n1 >= n2)
    vx = jnp.where(best0, p00, jnp.where(best1, p01, p02))
    vy = jnp.where(best0, p10, jnp.where(best1, p11, p12))
    vz = jnp.where(best0, p20, jnp.where(best1, p21, p22))
    vn = jnp.maximum(jnp.sqrt(vx * vx + vy * vy + vz * vz), 1e-20)
    nx = vx / vn
    ny = vy / vn
    nz = vz / vn

    fit_ok = (lam1 > min_planar_ev) & (lam0 < max_thickness_ev)
    resid = w5 * (bx * nx + by * ny + bz * nz)
    plane_ok = jnp.max(jnp.abs(resid), axis=0, keepdims=True) <= plane_valid

    d = (px - cx) * nx + (py - cy) * ny + (pz - cz) * nz
    s = 1.0 - 0.9 * jnp.abs(d) * inv_sqrt_r
    valid = gate & fit_ok & plane_ok & (s > point_valid)
    w = valid.astype(jnp.float32)

    # J row = s * [n | p x n] (n^T [I | -skew(p)], geometry.j_se3 convention)
    j0 = s * nx
    j1 = s * ny
    j2 = s * nz
    j3 = s * (py * nz - pz * ny)
    j4 = s * (pz * nx - px * nz)
    j5 = s * (px * ny - py * nx)
    J = jnp.concatenate([j0, j1, j2, j3, j4, j5], axis=0)   # (6, 128)
    Jw = J * w
    jtj = jax.lax.dot_general(Jw, J, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (6, 6)
    e = s * d
    jte = jnp.sum(Jw * e, axis=1, keepdims=True)             # (6, 1)
    nv = jnp.sum(w, axis=1, keepdims=True)                   # (1, 1)

    @pl.when(j == 0)
    def _init():
        jtj_ref[...] = jnp.zeros_like(jtj_ref)
        jte_ref[...] = jnp.zeros_like(jte_ref)
        nv_ref[...] = jnp.zeros_like(nv_ref)

    jtj_ref[...] += jtj
    jte_ref[...] += jte
    nv_ref[...] += nv


@functools.partial(jax.jit, static_argnames=("interpret",))
def normal_equations_t(src: PointCloud, cand_t: jax.Array, ok_t: jax.Array,
                       pose: jax.Array, interpret: bool = False):
    """Fused GN linearization on transposed candidates.

    ``cand_t`` is (3, C, Q), ``ok_t`` (C, Q) float 0/1 — i.e.
    ``loam.gather_candidates`` output transposed to the kernel's lane-major
    layout (queries on lanes): ``cand.transpose(2, 1, 0)`` / ``ok.T``.
    Returns (JtJ (6,6), JtE (6,), n_valid ()) matching
    ``loam.normal_equations_from_candidates`` within f32 tolerance (the
    kernel uses a polynomial acos and a different reduction order, so
    bit-identity cannot hold; converged poses matched in testing).
    ``interpret=True`` runs the kernel in pallas interpret mode (CPU tests).
    """
    from . import geometry as geo
    from . import loam as loam_ops

    three, n_cand, n_q = cand_t.shape
    assert three == 3 and n_q % Q_BLOCK == 0, (cand_t.shape,)
    p_map = geo.transform_points(pose, src.xyz)          # (Q, 3)
    pm_t = p_map.T                                        # (3, Q)
    src_range = jnp.linalg.norm(src.xyz, axis=-1)
    aux = jnp.stack([src.mask.astype(jnp.float32),
                     1.0 / jnp.sqrt(jnp.maximum(src_range, 1e-6))])  # (2, Q)

    grid = n_q // Q_BLOCK
    kern = functools.partial(
        _kernel, n_cand=n_cand, plane_pts=loam_ops.PLANE_PTS,
        max_search_sq=loam_ops.MAX_SEARCH_SQ,
        plane_valid=loam_ops.PLANE_VALID_THRESH,
        point_valid=loam_ops.POINT_VALID_THRESH,
        min_planar_ev=loam_ops.MIN_PLANAR_EV,
        max_thickness_ev=loam_ops.MAX_THICKNESS_EV)
    jtj, jte, nv = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, n_cand, Q_BLOCK), lambda j: (0, 0, j)),
            pl.BlockSpec((n_cand, Q_BLOCK), lambda j: (0, j)),
            pl.BlockSpec((3, Q_BLOCK), lambda j: (0, j)),
            pl.BlockSpec((2, Q_BLOCK), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((6, 6), lambda j: (0, 0)),
            pl.BlockSpec((6, 1), lambda j: (0, 0)),
            pl.BlockSpec((1, 1), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, 6), jnp.float32),
            jax.ShapeDtypeStruct((6, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(cand_t, ok_t, pm_t, aux)
    return jtj, jte[:, 0], nv[0, 0].astype(jnp.int32)
