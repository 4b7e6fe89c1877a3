"""Distributed BA on the virtual 8-device CPU mesh: convergence from
perturbed poses+landmarks, agreement with the single-device solver, and
mesh-size invariance (1 vs 8 shards)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tc2li_slam_tpu.geom import camera as cam_mod, lie
from tc2li_slam_tpu.parallel import dist_ba
from tc2li_slam_tpu.solver import lm as lm_mod
from tc2li_slam_tpu.solver.lm import BAObservations

CAM = cam_mod.Pinhole.create(500.0, 500.0, 320.0, 240.0, bf=250.0)


def make_problem(rng, Pn=6, L=512, K=4, pose_noise=0.03, lm_noise=0.10):
    """Ground-truth window + perturbed initialization."""
    X = np.stack([
        rng.uniform(-15, 15, L), rng.uniform(-8, 8, L), rng.uniform(10, 50, L)
    ], -1).astype(np.float32)
    T_gt = []
    for p in range(Pn):
        xi = np.concatenate([[0.6 * p, 0.02 * p, 0.0],
                             rng.uniform(-0.02, 0.02, 3)]).astype(np.float32)
        T_gt.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    T_gt = np.stack(T_gt)
    pose_idx = np.stack([rng.choice(Pn, K, replace=False) for _ in range(L)]
                        ).astype(np.int32)
    uv = np.zeros((L, K, 3), np.float32)
    for l in range(L):
        for k in range(K):
            T = T_gt[pose_idx[l, k]]
            Xc = T[:3, :3] @ X[l] + T[:3, 3]
            uv[l, k] = np.asarray(cam_mod.project_stereo(CAM, jnp.asarray(Xc)))
    uv[..., :2] += rng.normal(0, 0.3, uv[..., :2].shape)
    obs = BAObservations(
        pose_idx=jnp.asarray(pose_idx), uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones((L, K)), stereo=jnp.ones((L, K), bool),
        valid=jnp.ones((L, K), bool),
    )
    # meaningful perturbation: first pose is the gauge anchor, rest off by
    # ~cm/deg; landmarks off by ~10 cm
    T0 = [T_gt[0]]
    for p in range(1, Pn):
        xi = pose_noise * rng.standard_normal(6).astype(np.float32)
        T0.append(np.asarray(jnp.asarray(T_gt[p]) @ lie.se3_exp(jnp.asarray(xi))))
    T0 = jnp.asarray(np.stack(T0))
    X0 = jnp.asarray(X + lm_noise * rng.standard_normal(X.shape).astype(np.float32))
    fixed = jnp.zeros(Pn, bool).at[0].set(True)
    return T_gt, X, T0, X0, obs, fixed


def pose_err(T, T_gt):
    return np.asarray([
        np.linalg.norm(np.asarray(T[i])[:3, 3] - T_gt[i][:3, 3])
        for i in range(len(T_gt))
    ])


def test_dist_ba_converges_from_perturbation(rng):
    T_gt, X, T0, X0, obs, fixed = make_problem(rng)
    mesh = dist_ba.make_mesh(jax.devices()[:8])
    Xs, obs_s, vs = dist_ba.shard_problem(mesh, X0, obs, jnp.ones(X0.shape[0], bool))
    T1, X1, cost = dist_ba.optimize(mesh, CAM, T0, Xs, obs_s, vs, fixed, iters=12)
    e0 = pose_err(T0, T_gt)
    e1 = pose_err(T1, T_gt)
    assert e0[1:].mean() > 0.02  # the perturbation was real
    assert e1[1:].mean() < 0.15 * e0[1:].mean(), (e0, e1)
    assert np.isfinite(float(cost))


def test_dist_ba_matches_single_device_local_ba(rng):
    """The mesh solver and lm.local_ba must land on the same optimum."""
    T_gt, X, T0, X0, obs, fixed = make_problem(rng)
    L = X0.shape[0]
    mesh = dist_ba.make_mesh(jax.devices()[:8])
    Xs, obs_s, vs = dist_ba.shard_problem(mesh, X0, obs, jnp.ones(L, bool))
    T_d, X_d, _ = dist_ba.optimize(mesh, CAM, T0, Xs, obs_s, vs, fixed, iters=15)
    res = lm_mod.local_ba(CAM, T0, X0, obs, fixed, jnp.ones(L, bool), iters=15)
    # same optimum within solver-schedule tolerance
    dT = np.abs(np.asarray(T_d) - np.asarray(res.T_cw)).max()
    assert dT < 5e-3, f"pose disagreement {dT}"
    e_d = pose_err(T_d, T_gt)[1:].mean()
    e_s = pose_err(res.T_cw, T_gt)[1:].mean()
    assert e_d < 1.3 * e_s + 1e-3


def test_dist_ba_mesh_size_invariance(rng):
    """1-device and 8-device meshes compute the same reduced system (psum
    over shards == single-shard sum)."""
    T_gt, X, T0, X0, obs, fixed = make_problem(rng, L=256)
    out = {}
    for n in (1, 8):
        mesh = dist_ba.make_mesh(jax.devices()[:n])
        Xs, obs_s, vs = dist_ba.shard_problem(mesh, X0, obs, jnp.ones(256, bool))
        T1, X1, cost = dist_ba.optimize(mesh, CAM, T0, Xs, obs_s, vs, fixed, iters=5)
        out[n] = (np.asarray(T1), float(cost))
    np.testing.assert_allclose(out[1][0], out[8][0], rtol=1e-4, atol=2e-5)
    assert abs(out[1][1] - out[8][1]) < 1e-2 * max(out[1][1], 1.0)


def test_dist_ba_with_balm_extra(rng):
    """The replicated dense pose extra enters the sharded solve (the
    distributed constructQuadraticForm path): a strong quadratic prior
    pinning pose 1 at ground truth must dominate the solution there."""
    T_gt, X, T0, X0, obs, fixed = make_problem(rng)
    Pn = len(T_gt)
    D = 6 * Pn
    T_gt_j = jnp.asarray(T_gt)

    def extra_fn(T_cw):
        # quadratic pulling pose 1 toward GT: r = log(T1 T1_gt^-1)
        xi = lie.se3_log(T_cw[1] @ lie.se3_inverse(T_gt_j[1]))
        w = 1e6
        H = jnp.zeros((D, D)).at[6:12, 6:12].add(w * jnp.eye(6))
        # gradient of 0.5 w |xi|^2 wrt LEFT tangent of T1 ~ w * xi
        g = jnp.zeros(D).at[6:12].set(w * xi)
        return H, g, w * jnp.sum(xi * xi)

    mesh = dist_ba.make_mesh(jax.devices()[:8])
    Xs, obs_s, vs = dist_ba.shard_problem(mesh, X0, obs, jnp.ones(X0.shape[0], bool))
    T1, _, _ = dist_ba.optimize(mesh, CAM, T0, Xs, obs_s, vs, fixed, iters=12,
                                extra_fn=extra_fn)
    err1 = np.linalg.norm(np.asarray(T1[1])[:3, 3] - T_gt[1][:3, 3])
    assert err1 < 2e-3, f"prior-pinned pose off by {err1}"


@pytest.mark.slow
def test_system_ba_through_mesh(rng):
    """System(mesh=...) routes local BA through the distributed solver; the
    e2e trajectory stays equivalent to the single-device run."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "tests"))
    from tests.test_e2e import small_cfg, run_sequence
    from tc2li_slam_tpu.io import synthetic as syn
    from tc2li_slam_tpu.slam import system as sys_mod

    frames, world, traj = syn.generate_sequence(
        n_frames=14, cam=syn.SMALL, seed=0, n_scan=2048,
    )
    T_bc = syn.body_from_cam()

    def run(mesh):
        slam = sys_mod.System(small_cfg(True), mesh=mesh)
        gt = []
        for fr in frames:
            slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
            gt.append(fr.T_wb_gt @ T_bc)
        est = slam.trajectory_world_from_cam()
        return syn.ate_rmse(est, np.stack(gt))

    mesh = dist_ba.make_mesh(jax.devices()[:8])
    ate_mesh = run(mesh)
    ate_single = run(None)
    assert ate_mesh < 0.2, ate_mesh
    assert ate_mesh < ate_single * 1.5 + 0.02, (ate_mesh, ate_single)
