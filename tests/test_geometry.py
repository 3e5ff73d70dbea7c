"""Parity tests for SE(3)/SO(3) ops vs closed-form references.

Mirrors the reference's geometry conventions checked by test/eigen.cpp:
static-axis ZYX ypr, quaternion round trips, exp-map forms of
common/geometry/manifolds.hpp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleslam_tpu.ops import geometry as geo


def random_rotvec(rng, n=32, scale=np.pi * 0.9):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mags = rng.uniform(1e-8, scale, size=(n, 1))
    return (v * mags).astype(np.float32)


def test_so3_exp_matches_scipy_form(rng):
    w = random_rotvec(rng)
    R = np.asarray(geo.so3_exp(jnp.asarray(w)))
    # closed-form check: R @ w = w (axis invariant), det = 1, orthogonal
    np.testing.assert_allclose(np.einsum("nij,nj->ni", R, w), w, atol=1e-4)
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(w), 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_exp_small_angle_is_identity():
    R = np.asarray(geo.so3_exp(jnp.array([1e-8, 0.0, 0.0])))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_so3_log_roundtrip(rng):
    w = random_rotvec(rng)
    R = geo.so3_exp(jnp.asarray(w))
    w2 = np.asarray(geo.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=2e-3)


def test_so3_log_near_pi(rng):
    v = rng.normal(size=(8, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    w = (v * (np.pi - 1e-4)).astype(np.float32)
    R = geo.so3_exp(jnp.asarray(w))
    w2 = np.asarray(geo.so3_log(R))
    R2 = np.asarray(geo.so3_exp(jnp.asarray(w2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_se3_exp_log_roundtrip(rng):
    k = np.concatenate([rng.normal(size=(16, 3)), random_rotvec(rng, 16, 2.0)], axis=1).astype(np.float32)
    T = geo.se3_exp(jnp.asarray(k))
    k2 = np.asarray(geo.se3_log(T))
    np.testing.assert_allclose(k2, k, atol=5e-3)


def test_se3_exp_pure_translation():
    T = np.asarray(geo.se3_exp(jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])))
    expected = np.eye(4)
    expected[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(T, expected, atol=1e-6)


def test_j_se3_matches_autodiff(rng):
    p = rng.normal(size=(3,)).astype(np.float32)

    def moved(x):
        return (geo.se3_exp(x) @ jnp.append(jnp.asarray(p), 1.0))[:3]

    J_auto = jax.jacobian(moved)(jnp.zeros(6))
    J_ours = geo.j_se3(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_ours), atol=1e-5)


def test_ypr_conventions(rng):
    # R = Rz(y) Ry(p) Rx(r), recovered by rot_to_ypr
    ypr = np.array([0.5, -0.3, 0.8], dtype=np.float32)
    R = geo.ypr_to_rot(jnp.asarray(ypr))
    back = np.asarray(geo.rot_to_ypr(R))
    np.testing.assert_allclose(back, ypr, atol=1e-5)


def test_quat_roundtrip(rng):
    w = random_rotvec(rng)
    R = geo.so3_exp(jnp.asarray(w))
    q = geo.rot_to_quat(R)
    R2 = geo.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-5)


def test_reorthonormalize():
    R = np.asarray(geo.so3_exp(jnp.array([0.3, 0.2, 0.1])))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R + 0.01 * np.random.default_rng(1).normal(size=(3, 3))
    T2 = np.asarray(geo.reorthonormalize(jnp.asarray(T)))
    RtR = T2[:3, :3].T @ T2[:3, :3]
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)


def test_six_dof_to_mobile_yaw_kept():
    # yaw-dominant rotation is kept as pure yaw; z is zeroed
    T = np.asarray(geo.make_pose(geo.ypr_to_rot(jnp.array([0.7, 0.02, -0.03])), jnp.array([1.0, 2.0, 3.0])))
    M = np.asarray(geo.six_dof_to_mobile(jnp.asarray(T)))
    assert M[2, 3] == 0.0
    ypr = np.asarray(geo.rot_to_ypr(jnp.asarray(M[:3, :3])))
    assert abs(ypr[1]) < 1e-6 and abs(ypr[2]) < 1e-6
    np.testing.assert_allclose(ypr[0], 0.7, atol=0.05)


def test_six_dof_to_mobile_non_z_axis_drops_rotation():
    # rotation about X (axis not near Z) -> identity rotation (trans.hpp:80-84)
    T = np.asarray(geo.make_pose(geo.so3_exp(jnp.array([0.8, 0.0, 0.0])), jnp.array([1.0, 2.0, 3.0])))
    M = np.asarray(geo.six_dof_to_mobile(jnp.asarray(T)))
    np.testing.assert_allclose(M[:3, :3], np.eye(3), atol=1e-5)


def test_correct_angles():
    a = np.asarray(geo.correct_angles(jnp.array(3.0 + 2 * np.pi), jnp.array(3.0)))
    np.testing.assert_allclose(a, 3.0, atol=1e-6)
    a = np.asarray(geo.correct_angles(jnp.array(-3.0), jnp.array(3.0)))
    assert abs(a - 3.0) <= np.pi + 1e-6


def test_pose_helpers(rng):
    k = np.concatenate([rng.normal(size=3), random_rotvec(rng, 1)[0]]).astype(np.float32)
    T = geo.se3_exp(jnp.asarray(k))
    Tinv = geo.pose_inverse(T)
    np.testing.assert_allclose(np.asarray(geo.pose_compose(T, Tinv)), np.eye(4), atol=1e-5)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(geo.transform_points(T, jnp.asarray(pts)))
    expected = (np.asarray(T)[:3, :3] @ pts.T).T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)
