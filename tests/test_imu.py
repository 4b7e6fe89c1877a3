"""IMU preintegration vs analytic/finite-difference oracles
(ImuTypes.cc semantics)."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.estimation import imu
from tc2li_slam_tpu.geom import lie

CAL = imu.ImuCalib.create(1.7e-4, 2e-3, 1.9e-5, 3e-3)


def integrate_simple(gyro, acc, dts, bg=None, ba=None):
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg, jnp.float32)
    ba = jnp.zeros(3) if ba is None else jnp.asarray(ba, jnp.float32)
    return imu.integrate(
        CAL, jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
        jnp.asarray(dts, jnp.float32), bg, ba,
    )


def test_constant_rotation():
    w = np.array([0.1, -0.2, 0.3])
    N, dt = 100, 0.01
    p = integrate_simple(np.tile(w, (N, 1)), np.zeros((N, 3)), np.full(N, dt))
    R_ref = np.asarray(lie.so3_exp(jnp.asarray(w * N * dt, jnp.float32)))
    np.testing.assert_allclose(np.asarray(p.dR), R_ref, atol=1e-4)
    np.testing.assert_allclose(float(p.dt), 1.0, atol=1e-6)


def test_constant_accel_no_rotation():
    a = np.array([1.0, -0.5, 0.2])
    N, dt = 100, 0.01
    p = integrate_simple(np.zeros((N, 3)), np.tile(a, (N, 1)), np.full(N, dt))
    T = N * dt
    np.testing.assert_allclose(np.asarray(p.dV), a * T, rtol=1e-5)
    # dP = sum over steps of the discrete update; analytic continuous limit
    # 0.5 a T^2 with O(dt) discretization agreement
    np.testing.assert_allclose(np.asarray(p.dP), 0.5 * a * T * T, rtol=2e-2)


def test_padding_ignored():
    w = np.array([0.1, 0.0, 0.0])
    g = np.tile(w, (50, 1))
    a = np.tile([0.0, 0.0, 9.81], (50, 1))
    dts = np.full(50, 0.01)
    p1 = integrate_simple(g, a, dts)
    g_pad = np.concatenate([g, np.random.randn(14, 3)])
    a_pad = np.concatenate([a, np.random.randn(14, 3)])
    dts_pad = np.concatenate([dts, np.zeros(14)])
    p2 = integrate_simple(g_pad, a_pad, dts_pad)
    np.testing.assert_allclose(np.asarray(p1.dR), np.asarray(p2.dR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1.dP), np.asarray(p2.dP), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1.C), np.asarray(p2.C), atol=1e-9)


def test_bias_jacobians_first_order(rng):
    N, dt = 50, 0.01
    gyro = rng.normal(0, 0.3, (N, 3))
    acc = rng.normal(0, 1.0, (N, 3)) + [0, 0, 9.81]
    dts = np.full(N, dt)
    p0 = integrate_simple(gyro, acc, dts)

    db_g = np.array([0.002, -0.001, 0.0015])
    db_a = np.array([0.01, 0.02, -0.015])
    # reintegrate at shifted bias = oracle
    p1 = integrate_simple(gyro, acc, dts, bg=db_g, ba=db_a)

    dR_corr = imu.delta_rotation(p0, jnp.asarray(db_g, jnp.float32))
    dV_corr = imu.delta_velocity(p0, jnp.asarray(db_g, jnp.float32), jnp.asarray(db_a, jnp.float32))
    dP_corr = imu.delta_position(p0, jnp.asarray(db_g, jnp.float32), jnp.asarray(db_a, jnp.float32))

    np.testing.assert_allclose(np.asarray(dR_corr), np.asarray(p1.dR), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dV_corr), np.asarray(p1.dV), atol=5e-3)
    np.testing.assert_allclose(np.asarray(dP_corr), np.asarray(p1.dP), atol=5e-3)


def test_covariance_psd_and_growth(rng):
    N = 100
    gyro = rng.normal(0, 0.2, (N, 3))
    acc = rng.normal(0, 0.5, (N, 3)) + [0, 0, 9.81]
    p = integrate_simple(gyro, acc, np.full(N, 0.01))
    C = np.asarray(p.C, np.float64)
    np.testing.assert_allclose(C, C.T, atol=1e-10)
    ev = np.linalg.eigvalsh(C)
    assert ev.min() > -1e-10
    assert C[:3, :3].trace() > 0 and C[9:, 9:].trace() > 0


def test_predict_state_gravity_freefall():
    # No IMU rotation, accelerometer measures exactly -g: stationary hover.
    N, dt = 100, 0.01
    acc = np.tile([0.0, 0.0, 9.81], (N, 1))
    p = integrate_simple(np.zeros((N, 3)), acc, np.full(N, dt))
    R0 = jnp.eye(3)
    pw = jnp.zeros(3)
    vw = jnp.zeros(3)
    R2, p2, v2 = imu.predict_state(p, R0, pw, vw, jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(v2), np.zeros(3), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p2), np.zeros(3), atol=1e-3)
