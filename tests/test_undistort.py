"""Scan de-skew: points sampled along a moving trajectory must collapse to
their true positions in the scan-end frame (IMU_Processing.cpp:160-277
semantics)."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.estimation import undistort
from tc2li_slam_tpu.geom import lie


def test_undistort_linear_motion(rng):
    # Sensor translates +x at 2 m/s over a 0.1 s scan; world points static.
    N = 11
    t_samples = np.linspace(0.0, 0.1, N).astype(np.float32)
    p_traj = np.stack([2.0 * t_samples, np.zeros(N), np.zeros(N)], -1).astype(np.float32)
    R_traj = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))

    world = rng.uniform(-10, 10, size=(64, 3)).astype(np.float32)
    t_pts = rng.uniform(0.0, 0.1, size=64).astype(np.float32)
    # Raw measurement: point in sensor frame at its sample time.
    raw = world - np.stack([2.0 * t_pts, np.zeros(64), np.zeros(64)], -1)

    out = undistort.undistort(
        jnp.asarray(raw), jnp.asarray(t_pts), jnp.asarray(t_samples),
        jnp.asarray(R_traj), jnp.asarray(p_traj),
        jnp.eye(3), jnp.zeros(3),
    )
    # Expected: point in sensor frame at scan end (pos = [0.2, 0, 0]).
    expected = world - np.array([0.2, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def test_undistort_rotation(rng):
    # Sensor yaws at 1 rad/s; fixed world point.
    N = 11
    t_samples = np.linspace(0.0, 0.1, N).astype(np.float32)
    R_traj = np.stack(
        [np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, t]))) for t in t_samples]
    ).astype(np.float32)
    p_traj = np.zeros((N, 3), np.float32)

    world = rng.uniform(-5, 5, size=(32, 3)).astype(np.float32)
    t_pts = rng.uniform(0.0, 0.1, size=32).astype(np.float32)
    raw = np.stack([R_traj[0] for _ in range(32)])  # placeholder
    raw = np.einsum(
        "nij,nj->ni",
        np.stack([np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, t]))).T for t in t_pts]),
        world,
    ).astype(np.float32)

    out = undistort.undistort(
        jnp.asarray(raw), jnp.asarray(t_pts), jnp.asarray(t_samples),
        jnp.asarray(R_traj), jnp.asarray(p_traj),
        jnp.eye(3), jnp.zeros(3),
    )
    expected = (R_traj[-1].T @ world.T).T
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3)


def test_undistort_with_extrinsic(rng):
    # Static sensor: undistortion must be exactly identity regardless of T_LI.
    N = 5
    t_samples = np.linspace(0.0, 0.1, N).astype(np.float32)
    R_traj = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
    p_traj = np.zeros((N, 3), np.float32)
    R_LI = np.asarray(lie.so3_exp(jnp.asarray([0.1, -0.2, 0.3])))
    t_LI = np.array([0.5, -0.1, 0.2], np.float32)
    pts = rng.uniform(-5, 5, size=(16, 3)).astype(np.float32)
    out = undistort.undistort(
        jnp.asarray(pts), jnp.full(16, 0.05, jnp.float32), jnp.asarray(t_samples),
        jnp.asarray(R_traj), jnp.asarray(p_traj),
        jnp.asarray(R_LI, jnp.float32), jnp.asarray(t_LI),
    )
    np.testing.assert_allclose(np.asarray(out), pts, atol=1e-4)
