"""Visual-inertial(-LiDAR) local BA: window convergence on synthetic data
(LocalInertialBA / LocalLVIBA semantics)."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.geom import camera, lie
from tc2li_slam_tpu.estimation import imu
from tc2li_slam_tpu.solver import balm, inertial_ba, lm
from tests.test_solver import make_balm_window

CAM = camera.Pinhole.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0)
GRAV = jnp.asarray([0.0, 0.0, -9.81])
CAL = imu.ImuCalib.create(1.7e-3, 2e-2, 1.9e-5, 3e-4)


def simulate_window(rng, P=5, L=100, dt_kf=0.5):
    """Body moves +x at 2 m/s, slight yaw; camera = body (T_cb = I)."""
    w_b = np.array([0.0, 0.0, 0.06])
    v_w = np.array([2.0, 0.0, 0.0])
    T_gt, vels = [], []
    for i in range(P):
        t = i * dt_kf
        R = np.asarray(lie.so3_exp(jnp.asarray(w_b * t, jnp.float32)))
        p = v_w * t
        T_gt.append(np.asarray(lie.se3(jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32))))
        vels.append(v_w)
    T_gt = np.stack(T_gt).astype(np.float32)

    # IMU preintegration between consecutive KFs (exact measurements)
    n_sub = 50
    facs = []
    for i in range(P - 1):
        ts = np.linspace(i * dt_kf, (i + 1) * dt_kf, n_sub + 1)[1:]
        gyro = np.tile(w_b, (n_sub, 1)).astype(np.float32)
        accs = []
        for t in ts:
            R = np.asarray(lie.so3_exp(jnp.asarray(w_b * t, jnp.float32)))
            accs.append(R.T @ np.array([0, 0, 9.81]))
        accs = np.asarray(accs, np.float32)
        dts = np.full(n_sub, dt_kf / n_sub, np.float32)
        p = imu.integrate(CAL, jnp.asarray(gyro), jnp.asarray(accs), jnp.asarray(dts),
                          jnp.zeros(3), jnp.zeros(3))
        facs.append(p)

    fac = inertial_ba.ImuWindowFactors(
        dR=jnp.stack([f.dR for f in facs]),
        dV=jnp.stack([f.dV for f in facs]),
        dP=jnp.stack([f.dP for f in facs]),
        JRg=jnp.stack([f.JRg for f in facs]),
        JVg=jnp.stack([f.JVg for f in facs]),
        JVa=jnp.stack([f.JVa for f in facs]),
        JPg=jnp.stack([f.JPg for f in facs]),
        JPa=jnp.stack([f.JPa for f in facs]),
        dt=jnp.stack([f.dt for f in facs]),
        C_inv=jnp.stack([
            jnp.linalg.inv(f.C[:9, :9] + 1e-8 * jnp.eye(9)) for f in facs
        ]),
        bg_lin=jnp.zeros((P - 1, 3)),
        ba_lin=jnp.zeros((P - 1, 3)),
        info_bg=jnp.full((P - 1,), 1e4),
        info_ba=jnp.full((P - 1,), 1e3),
        valid=jnp.ones(P - 1, bool),
    )

    # Landmarks + observations (body pose = camera pose here)
    X = np.stack([
        rng.uniform(2, 25, L), rng.uniform(-10, 10, L), rng.uniform(-3, 3, L)
    ], -1).astype(np.float32)
    # camera looks along +z? Our pinhole projects along +z; rotate landmarks
    # into view: put them in front (+z in camera frame = +x world via T_cb)
    # Simpler: keep T_cb = I and sample landmarks with large +z instead.
    X = np.stack([
        rng.uniform(-8, 12, L), rng.uniform(-6, 6, L), rng.uniform(8, 30, L)
    ], -1).astype(np.float32)
    K = P
    pose_idx = np.tile(np.arange(P), (L, 1)).astype(np.int32)
    uv = np.zeros((L, K, 3), np.float32)
    valid = np.ones((L, K), bool)
    for l in range(L):
        for k in range(P):
            T_bw = np.linalg.inv(T_gt[k])
            Xb = T_bw[:3, :3] @ X[l] + T_bw[:3, 3]
            if Xb[2] < 1:
                valid[l, k] = False
                continue
            uv[l, k] = np.asarray(camera.project_stereo(CAM, jnp.asarray(Xb)))
    obs = lm.BAObservations(
        pose_idx=jnp.asarray(pose_idx), uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones((L, K)), stereo=jnp.ones((L, K), bool),
        valid=jnp.asarray(valid),
    )
    return T_gt, np.stack(vels).astype(np.float32), fac, X, obs


def test_lvi_ba_visual_inertial_converges(rng):
    T_gt, vels, fac, X, obs = simulate_window(rng)
    P = len(T_gt)
    T0 = T_gt.copy()
    v0 = vels.copy()
    for i in range(1, P):
        T0[i] = T0[i] @ np.asarray(lie.se3_exp(jnp.asarray(
            rng.normal(0, 0.02, 6).astype(np.float32))))
        v0[i] += rng.normal(0, 0.1, 3).astype(np.float32)
    state0 = inertial_ba.InertialState(
        T_wb=jnp.asarray(T0), vel=jnp.asarray(v0),
        bg=jnp.zeros((P, 3)), ba=jnp.zeros((P, 3)),
    )
    X0 = X + rng.normal(0, 0.05, X.shape).astype(np.float32)
    fixed = jnp.zeros(P, bool).at[0].set(True)
    res = inertial_ba.lvi_ba(
        CAM, jnp.eye(4), state0, jnp.asarray(X0), obs, fac, fixed,
        jnp.ones(len(X), bool), GRAV, iters=10,
    )
    T_fin = np.asarray(res.state.T_wb)
    for i in range(1, P):
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(T_gt[i]) @ T_fin[i], dtype=jnp.float32)))
        assert np.abs(err).max() < 2e-3, f"KF {i} err {np.abs(err).max():.4f}"
    v_err = np.abs(np.asarray(res.state.vel) - vels).max()
    assert v_err < 0.05, f"vel err {v_err:.3f}"
    # biases should stay ~0 (unbiased measurements)
    assert np.abs(np.asarray(res.state.bg)).max() < 5e-3
    assert np.abs(np.asarray(res.state.ba)).max() < 5e-2


def test_lvi_ba_with_balm_edge(rng):
    T_gt, vels, fac, X, obs = simulate_window(rng)
    P = len(T_gt)
    # LiDAR planes observed from the first 4 body poses (T_bl = I)
    pts, pvalid, _ = make_balm_window(rng, W=4, noise=0.005, poses=T_gt[:4])
    c = balm.build_clusters(pts, pvalid, jnp.asarray(T_gt[:4]), max_voxels=256)
    assert int(c.valid.sum()) > 5

    T0 = T_gt.copy()
    v0 = vels.copy()
    for i in range(1, P):
        T0[i] = T0[i] @ np.asarray(lie.se3_exp(jnp.asarray(
            rng.normal(0, 0.015, 6).astype(np.float32))))
        v0[i] += rng.normal(0, 0.05, 3).astype(np.float32)
    state0 = inertial_ba.InertialState(
        T_wb=jnp.asarray(T0), vel=jnp.asarray(v0),
        bg=jnp.zeros((P, 3)), ba=jnp.zeros((P, 3)),
    )
    fixed = jnp.zeros(P, bool).at[0].set(True)
    res = inertial_ba.lvi_ba(
        CAM, jnp.eye(4), state0, jnp.asarray(X), obs, fac, fixed,
        jnp.ones(len(X), bool), GRAV,
        balm_clusters=c, T_bl=jnp.eye(4), w_lidar=0.01,
        iters=10, use_balm=True, n_lidar=4,
    )
    T_fin = np.asarray(res.state.T_wb)
    assert np.isfinite(T_fin).all()
    for i in range(1, P):
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(T_gt[i]) @ T_fin[i], dtype=jnp.float32)))
        assert np.abs(err).max() < 5e-3, f"KF {i} err {np.abs(err).max():.4f}"
