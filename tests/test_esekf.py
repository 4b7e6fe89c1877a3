"""ESEKF manifold ops, propagation, and the full synthetic LIO loop."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.estimation import esekf
from tc2li_slam_tpu.ops import voxel_map, pointcloud
from tc2li_slam_tpu.slam import lio
from tests import synthetic as syn


def test_s2_basis_orthonormal(rng):
    for _ in range(10):
        g = rng.normal(size=3).astype(np.float32) * 9.81
        B = np.asarray(esekf.s2_basis(jnp.asarray(g)))
        np.testing.assert_allclose(B.T @ B, np.eye(2), atol=1e-5)
        np.testing.assert_allclose(B.T @ (g / np.linalg.norm(g)), 0, atol=1e-5)


def test_s2_boxplus_boxminus_roundtrip(rng):
    g = jnp.asarray([0.2, -0.3, -9.79], jnp.float32)
    d = jnp.asarray([0.05, -0.08], jnp.float32)
    g2 = esekf.s2_boxplus(g, d)
    assert abs(float(jnp.linalg.norm(g2)) - float(jnp.linalg.norm(g))) < 1e-4
    d2 = esekf.s2_boxminus(g2, g)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-4)


def test_state_boxplus_boxminus(rng):
    x = esekf.init_state()
    dx = (rng.normal(size=23) * 0.1).astype(np.float32)
    x2 = esekf.boxplus(x, jnp.asarray(dx))
    back = np.asarray(esekf.boxminus(x2, x))
    np.testing.assert_allclose(back, dx, atol=1e-4)


def test_predict_stationary():
    f = esekf.init_filter()
    N = 20
    gyro = jnp.zeros((N, 3))
    acc = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (N, 1))
    dts = jnp.full((N,), 0.01)
    noise = esekf.NoiseCfg.create()
    f2, R_traj, p_traj = esekf.predict(f, gyro, acc, dts, noise)
    np.testing.assert_allclose(np.asarray(f2.x.pos), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f2.x.vel), 0, atol=1e-3)
    # covariance grows
    assert float(jnp.trace(f2.P)) > float(jnp.trace(f.P))


def test_predict_constant_velocity():
    f = esekf.init_filter()
    f = f._replace(x=f.x._replace(vel=jnp.asarray([2.0, 0.0, 0.0])))
    N = 50
    gyro = jnp.zeros((N, 3))
    acc = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (N, 1))
    dts = jnp.full((N,), 0.01)
    f2, _, _ = esekf.predict(f, gyro, acc, dts, esekf.NoiseCfg.create())
    np.testing.assert_allclose(np.asarray(f2.x.pos), [1.0, 0, 0], atol=1e-3)


def test_static_init(rng):
    f = esekf.init_filter()
    N = 50
    # gravity tilted: accelerometer reads -R^T g with R = I tilted world
    acc = np.tile([0.5, 0.0, 9.79], (N, 1)) + rng.normal(0, 0.01, (N, 3))
    gyro = np.tile([0.01, -0.02, 0.005], (N, 1)) + rng.normal(0, 0.001, (N, 3))
    f2 = esekf.static_init(
        f, jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
        jnp.ones(N, bool),
    )
    g = np.asarray(f2.x.grav)
    np.testing.assert_allclose(np.linalg.norm(g), 9.81, atol=1e-3)
    np.testing.assert_allclose(
        g / np.linalg.norm(g), -np.array([0.5, 0.0, 9.79]) / np.linalg.norm([0.5, 0.0, 9.79]),
        atol=2e-3,
    )
    np.testing.assert_allclose(np.asarray(f2.x.bg), gyro.mean(0), atol=1e-4)


def _run_lio(n_scans=12, noise=0.01, drop_extrinsic=True):
    rng = np.random.default_rng(3)
    world = syn.make_world(rng, n_ground=12000, n_wall=4000, extent=50.0)
    traj = syn.Trajectory(w_body=(0.0, 0.0, 0.08), v_world=(2.0, 0.3, 0.0))
    cfg = lio.LioConfig(blind=0.5, scan_voxel=0.4, map_voxel=0.4)
    noise_cfg = esekf.NoiseCfg.create(gyr=1e-3, acc=1e-2, bg_rw=1e-5, ba_rw=1e-4)

    f = esekf.init_filter()
    R0, p0 = traj.pose(0.0)
    f = f._replace(x=f.x._replace(
        R=jnp.asarray(R0, jnp.float32),
        pos=jnp.asarray(p0, jnp.float32),
        vel=jnp.asarray(traj.v, jnp.float32),
    ))
    m = voxel_map.create(1 << 17, cfg.map_voxel)

    # bootstrap map with scan 0 at ground-truth pose
    scan, valid = syn.make_scan(rng, world, R0, p0, noise=noise)
    pw = scan @ np.asarray(R0, np.float32).T + p0.astype(np.float32)
    ds, dsv = pointcloud.voxel_downsample(jnp.asarray(pw), jnp.asarray(valid), cfg.map_voxel)
    m = voxel_map.insert(m, ds, dsv)

    dt_scan = 0.1
    errs = []
    for k in range(1, n_scans + 1):
        t0, t1 = (k - 1) * dt_scan, k * dt_scan
        R_gt, p_gt = traj.pose(t1)
        scan, valid = syn.make_scan(rng, world, R_gt, p_gt, noise=noise)
        gyro, acc, dts, trel = syn.imu_window(traj, t0, t1, n_max=16)
        res = lio.lio_scan_step(
            f, m, jnp.asarray(scan),
            jnp.full(scan.shape[0], dt_scan, jnp.float32), jnp.asarray(valid),
            jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts), jnp.asarray(trel),
            noise_cfg, cfg,
        )
        f, m = res.filt, res.map
        errs.append(np.linalg.norm(np.asarray(f.x.pos) - p_gt))
    return np.array(errs)


def test_lio_synthetic_tracks_trajectory():
    errs = _run_lio()
    # Perfect IMU + planar world: drift should stay near the map noise level.
    assert errs[-1] < 0.15, f"final position error {errs[-1]:.3f} m"
    assert np.median(errs) < 0.12, f"median error {np.median(errs):.3f} m"
