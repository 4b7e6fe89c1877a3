"""Visual-inertial initialization (InitializeIMU parity): gravity direction,
shared biases and per-KF velocities recovered from preintegrated factors on
fixed keyframe poses."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.estimation import imu as imu_mod
from tc2li_slam_tpu.geom import lie
from tc2li_slam_tpu.solver import inertial_init

G = 9.81


def simulate(rng, n_kf=8, rate=100.0, kf_dt=0.5,
             bg_true=(0.004, -0.002, 0.003), ba_true=(0.05, -0.03, 0.08),
             g_dir=(0.05, -0.02, -1.0)):
    """Constant-velocity body with a slow yaw; gravity slightly off -z."""
    g_w = np.asarray(g_dir, np.float64)
    g_w = G * g_w / np.linalg.norm(g_w)
    bg_true = np.asarray(bg_true)
    ba_true = np.asarray(ba_true)
    w_body = np.array([0.0, 0.0, 0.12])        # yaw rate
    v0 = np.array([1.2, 0.3, 0.05])
    dt = 1.0 / rate
    n_per = int(kf_dt * rate)

    R = np.eye(3)
    p = np.zeros(3)
    v = v0.copy()
    T_wb = [np.eye(4)]
    vels = [v.copy()]
    gyr_chunks, acc_chunks = [], []
    for k in range(n_kf - 1):
        gs, accs = [], []
        for _ in range(n_per):
            # true kinematics: a_w chosen so v changes slowly (circle-ish)
            a_w = np.cross(R @ w_body, v)
            acc_body = R.T @ (a_w - g_w)       # specific force
            gs.append(w_body + bg_true)
            accs.append(acc_body + ba_true)
            # integrate ground truth
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_body * dt)))
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = p
        T_wb.append(T)
        vels.append(v.copy())
        gyr_chunks.append(np.stack(gs))
        acc_chunks.append(np.stack(accs))
    return (np.stack(T_wb), np.stack(vels), gyr_chunks, acc_chunks,
            g_w, bg_true, ba_true, kf_dt)


def test_inertial_optimization_recovers_gravity_and_bias(rng):
    T_wb, vels, gyr, acc, g_w, bg_true, ba_true, kf_dt = simulate(rng)
    calib = imu_mod.ImuCalib.create(1e-4, 1e-3, 1e-6, 1e-5)
    pres = [
        imu_mod.integrate(calib, jnp.asarray(g, jnp.float32),
                          jnp.asarray(a, jnp.float32),
                          jnp.full(len(g), 0.01, jnp.float32),
                          jnp.zeros(3), jnp.zeros(3))
        for g, a in zip(gyr, acc)
    ]
    K = T_wb.shape[0]
    stack = lambda f: jnp.stack([f(p) for p in pres])
    R_wb = jnp.asarray(T_wb[:, :3, :3], jnp.float32)
    R_wg0 = inertial_init.estimate_gravity_direction(
        R_wb, stack(lambda p: p.dV), jnp.ones(K - 1, bool)
    )
    # bootstrap must already be within ~12 degrees
    g0 = np.asarray(R_wg0 @ jnp.asarray([0.0, 0.0, -G]))
    ang0 = np.degrees(np.arccos(np.clip(
        g0 @ g_w / (np.linalg.norm(g0) * np.linalg.norm(g_w)), -1, 1)))
    assert ang0 < 12.0, f"gravity bootstrap off by {ang0:.1f} deg"

    C_inv = jnp.stack([
        jnp.linalg.inv(p.C[:9, :9] + 1e-8 * jnp.eye(9)) for p in pres
    ])
    res = inertial_init.inertial_optimization(
        jnp.asarray(T_wb, jnp.float32),
        stack(lambda p: p.dR), stack(lambda p: p.dV), stack(lambda p: p.dP),
        stack(lambda p: p.JRg), stack(lambda p: p.JVg),
        stack(lambda p: p.JVa), stack(lambda p: p.JPg),
        stack(lambda p: p.JPa),
        jnp.full(K - 1, kf_dt, jnp.float32), C_inv,
        jnp.zeros((K - 1, 3)), jnp.zeros((K - 1, 3)),
        jnp.ones(K - 1, bool), R_wg0,
        jnp.asarray(vels, jnp.float32) + 0.3,  # perturbed seed
        prior_g=1e2, prior_a=1e4, fix_scale=True,
    )
    g_est = np.asarray(res.R_wg @ jnp.asarray([0.0, 0.0, -G]))
    ang = np.degrees(np.arccos(np.clip(
        g_est @ g_w / (np.linalg.norm(g_est) * np.linalg.norm(g_w)), -1, 1)))
    assert ang < 1.0, f"gravity off by {ang:.2f} deg after optimization"
    assert np.linalg.norm(np.asarray(res.bg) - bg_true) < 5e-4, res.bg
    assert np.linalg.norm(np.asarray(res.ba) - ba_true) < 2e-2, res.ba
    v_err = np.linalg.norm(np.asarray(res.vel) - vels, axis=-1)
    assert v_err.max() < 0.05, f"velocity errors {v_err}"


def test_apply_scaled_rotation_preserves_reprojection(rng):
    """Rotating + rescaling world leaves camera-frame points scaled
    uniformly (reprojection-invariant), Map::ApplyScaledRotation."""
    K, L = 4, 50
    T_cw = []
    for k in range(K):
        xi = 0.2 * rng.standard_normal(6).astype(np.float32)
        T = np.array(lie.se3_exp(jnp.asarray(xi)))  # writable copy
        T[:3, 3] += [0.5 * k, 0, 4.0]
        T_cw.append(T)
    T_cw = jnp.asarray(np.stack(T_cw))
    X = jnp.asarray(rng.uniform(-3, 3, (L, 3)), jnp.float32)
    vel = jnp.asarray(rng.standard_normal((K, 3)), jnp.float32)
    R_yw = lie.so3_exp(jnp.asarray([0.1, -0.2, 0.3]))
    s = 1.7
    T2, X2, v2 = inertial_init.apply_scaled_rotation(T_cw, X, vel, R_yw, s)
    pc1 = jnp.einsum("kij,lj->kli", T_cw[:, :3, :3], X) + T_cw[:, None, :3, 3]
    pc2 = jnp.einsum("kij,lj->kli", T2[:, :3, :3], X2) + T2[:, None, :3, 3]
    np.testing.assert_allclose(np.asarray(pc2), s * np.asarray(pc1),
                               rtol=1e-4, atol=1e-4)
