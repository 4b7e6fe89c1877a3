"""Lie-group axioms vs closed-form/numpy oracles (Sophus-style test suite:
exp/log roundtrip, inverse, adjoint, Jacobian consistency)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsp

from tc2li_slam_tpu.geom import lie


def random_so3(rng, n):
    w = rng.normal(size=(n, 3)).astype(np.float32)
    return w


def test_so3_exp_log_roundtrip(rng):
    w = rng.uniform(-2.0, 2.0, size=(64, 3)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_so3_exp_matches_scipy(rng):
    w = rng.uniform(-2.0, 2.0, size=(32, 3)).astype(np.float64)
    R = np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float32)))
    R_ref = Rsp.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_small_angle():
    w = jnp.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)
    assert not np.any(np.isnan(np.asarray(lie.so3_log(R))))


def test_so3_log_near_pi():
    axis = np.array([0.3, -0.5, 0.81], dtype=np.float64)
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-4, np.pi]:
        w = (axis * theta).astype(np.float32)
        R = lie.so3_exp(jnp.asarray(w[None]))
        w_back = np.asarray(lie.so3_log(R))[0]
        R_back = Rsp.from_rotvec(w_back).as_matrix()
        np.testing.assert_allclose(np.asarray(R)[0], R_back, atol=5e-4)


def test_so3_jacobian_definition(rng):
    # exp(w + dw) ≈ exp(w) exp(Jr(w) dw)
    w = rng.uniform(-1.5, 1.5, size=(16, 3)).astype(np.float32)
    dw = (rng.normal(size=(16, 3)) * 1e-4).astype(np.float32)
    lhs = lie.so3_exp(jnp.asarray(w + dw))
    Jr = lie.so3_right_jacobian(jnp.asarray(w))
    rhs = lie.so3_exp(jnp.asarray(w)) @ lie.so3_exp((Jr @ jnp.asarray(dw)[..., None])[..., 0])
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_so3_jacobian_inverse(rng):
    w = rng.uniform(-1.5, 1.5, size=(16, 3)).astype(np.float32)
    J = lie.so3_left_jacobian(jnp.asarray(w))
    Jinv = lie.so3_left_jacobian_inv(jnp.asarray(w))
    prod = np.asarray(J @ Jinv)
    np.testing.assert_allclose(prod, np.eye(3)[None].repeat(16, 0), atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.uniform(-1.5, 1.5, size=(64, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_se3_inverse_compose(rng):
    xi = rng.uniform(-1.0, 1.0, size=(8, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    eye = np.asarray(T @ lie.se3_inverse(T))
    np.testing.assert_allclose(eye, np.eye(4)[None].repeat(8, 0), atol=1e-5)


def test_se3_apply(rng):
    xi = rng.uniform(-1.0, 1.0, size=(6,)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    p = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(lie.se3_apply(T, jnp.asarray(p)))
    Tn = np.asarray(T)
    ref = (Tn[:3, :3] @ p.T).T + Tn[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_se3_adjoint(rng):
    # Adj(T) xi == log(T exp(xi) T^-1)
    xiT = rng.uniform(-1.0, 1.0, size=(6,)).astype(np.float32)
    xi = (rng.normal(size=(6,)) * 1e-3).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xiT))
    lhs = (lie.se3_adjoint(T) @ jnp.asarray(xi)[:, None])[:, 0]
    rhs = lie.se3_log(T @ lie.se3_exp(jnp.asarray(xi)) @ lie.se3_inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_se3_interpolate_endpoints(rng):
    xi0 = rng.uniform(-1, 1, size=(6,)).astype(np.float32)
    xi1 = rng.uniform(-1, 1, size=(6,)).astype(np.float32)
    T0, T1 = lie.se3_exp(jnp.asarray(xi0)), lie.se3_exp(jnp.asarray(xi1))
    np.testing.assert_allclose(
        np.asarray(lie.se3_interpolate(T0, T1, 0.0)), np.asarray(T0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lie.se3_interpolate(T0, T1, 1.0)), np.asarray(T1), atol=1e-4
    )


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.uniform(-0.8, 0.8, size=(32, 7)).astype(np.float32)
    S = lie.sim3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.sim3_log(S))
    np.testing.assert_allclose(xi, xi2, atol=2e-4)


def test_sim3_reduces_to_se3(rng):
    xi6 = rng.uniform(-1, 1, size=(8, 6)).astype(np.float32)
    xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], axis=-1)
    S = lie.sim3_exp(jnp.asarray(xi7))
    T = lie.se3_exp(jnp.asarray(xi6))
    np.testing.assert_allclose(np.asarray(S), np.asarray(T), atol=1e-5)


def test_sim3_inverse(rng):
    xi = rng.uniform(-0.8, 0.8, size=(8, 7)).astype(np.float32)
    S = lie.sim3_exp(jnp.asarray(xi))
    eye = np.asarray(S @ lie.sim3_inverse(S))
    np.testing.assert_allclose(eye, np.eye(4)[None].repeat(8, 0), atol=1e-5)


def test_sim3_scale_action(rng):
    xi = np.zeros((7,), np.float32)
    xi[6] = np.log(2.0)
    S = lie.sim3_exp(jnp.asarray(xi))
    p = jnp.asarray([[1.0, 2.0, 3.0]], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lie.sim3_apply(S, p)), 2.0 * np.asarray(p), atol=1e-5)


def test_quat_roundtrip(rng):
    w = rng.uniform(-2, 2, size=(32, 3)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    q = lie.mat_to_quat(R)
    R2 = lie.quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_orthogonalize(rng):
    w = rng.uniform(-2, 2, size=(8, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w))) + rng.normal(size=(8, 3, 3)) * 1e-3
    Ro = np.asarray(lie.orthogonalize(jnp.asarray(R, dtype=jnp.float32)))
    np.testing.assert_allclose(
        Ro @ Ro.transpose(0, 2, 1), np.eye(3)[None].repeat(8, 0), atol=1e-5
    )
    assert np.all(np.linalg.det(Ro) > 0.9)
