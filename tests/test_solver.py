"""Solver tests: pose-only LM, local BA w/ Schur, BALM eigen-factor
(finite-difference J/H verification + window convergence)."""

import numpy as np
import jax
import jax.numpy as jnp

from tc2li_slam_tpu.geom import camera, lie
from tc2li_slam_tpu.solver import lm, balm

CAM = camera.Pinhole.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0)


def make_scene(rng, n=200, pose_noise=0.05):
    X = np.stack([
        rng.uniform(-10, 10, n), rng.uniform(-6, 6, n), rng.uniform(8, 40, n)
    ], -1).astype(np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(
        rng.uniform(-0.1, 0.1, 6).astype(np.float32))))
    Xc = (T_gt[:3, :3] @ X.T).T + T_gt[:3, 3]
    uvr = np.asarray(camera.project_stereo(CAM, jnp.asarray(Xc)))
    xi_noise = rng.normal(0, pose_noise, 6).astype(np.float32)
    T0 = np.asarray(lie.se3_exp(jnp.asarray(xi_noise))) @ T_gt
    return X, T_gt, T0, uvr


def test_pose_only_converges(rng):
    X, T_gt, T0, uvr = make_scene(rng)
    n = len(X)
    res = lm.pose_only_optimize(
        CAM, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(uvr),
        jnp.ones(n), jnp.ones(n, bool), jnp.ones(n, bool),
    )
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_gt)) @ res.T_cw))
    assert np.abs(err).max() < 1e-3, f"pose error {err}"
    assert int(res.n_inliers) == n


def test_pose_only_rejects_outliers(rng):
    X, T_gt, T0, uvr = make_scene(rng, n=300)
    uvr = uvr.copy()
    uvr[:60] += rng.uniform(20, 80, (60, 3)).astype(np.float32)  # outliers
    n = len(X)
    res = lm.pose_only_optimize(
        CAM, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(uvr),
        jnp.ones(n), jnp.ones(n, bool), jnp.ones(n, bool),
    )
    inl = np.asarray(res.inliers)
    assert inl[:60].mean() < 0.1          # outliers rejected
    assert inl[60:].mean() > 0.95         # inliers kept
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_gt)) @ res.T_cw))
    assert np.abs(err).max() < 2e-3


def make_ba_problem(rng, P=5, L=120, K=5, noise_px=0.5, pose_noise=0.02, lm_noise=0.1):
    X = np.stack([
        rng.uniform(-15, 15, L), rng.uniform(-8, 8, L), rng.uniform(10, 50, L)
    ], -1).astype(np.float32)
    T_gt = np.stack([
        np.asarray(lie.se3_exp(jnp.asarray(
            np.concatenate([[0.8 * p, 0, 0], rng.uniform(-0.05, 0.05, 3)]).astype(np.float32))))
        for p in range(P)
    ])
    pose_idx = np.tile(np.arange(P), (L, 1))[:, :K].astype(np.int32)
    uv = np.zeros((L, K, 3), np.float32)
    valid = np.ones((L, K), bool)
    for l in range(L):
        for k in range(K):
            T = T_gt[pose_idx[l, k]]
            Xc = T[:3, :3] @ X[l] + T[:3, 3]
            if Xc[2] < 1:
                valid[l, k] = False
                continue
            uv[l, k] = np.asarray(camera.project_stereo(CAM, jnp.asarray(Xc)))
            uv[l, k, :2] += rng.normal(0, noise_px, 2)
    obs = lm.BAObservations(
        pose_idx=jnp.asarray(pose_idx),
        uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones((L, K)),
        stereo=jnp.ones((L, K), bool),
        valid=jnp.asarray(valid),
    )
    T0 = T_gt.copy()
    X0 = X + rng.normal(0, lm_noise, X.shape).astype(np.float32)
    for p in range(1, P):
        T0[p] = np.asarray(lie.se3_exp(jnp.asarray(
            rng.normal(0, pose_noise, 6).astype(np.float32)))) @ T_gt[p]
    return X, T_gt, np.asarray(T0, np.float32), X0, obs


def test_local_ba_converges(rng):
    X, T_gt, T0, X0, obs = make_ba_problem(rng, noise_px=0.0)
    P = len(T_gt)
    fixed = jnp.zeros(P, bool).at[0].set(True)
    res = lm.local_ba(
        CAM, jnp.asarray(T0), jnp.asarray(X0), obs, fixed,
        jnp.ones(len(X), bool), iters=15,
    )
    T_fin = np.asarray(res.T_cw)
    for p in range(P):
        err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_gt[p])) @ T_fin[p]))
        assert np.abs(err).max() < 5e-3, f"pose {p} err {err}"
    lm_err = np.linalg.norm(np.asarray(res.X_w) - X, axis=-1)
    assert np.median(lm_err) < 0.05, f"median lm err {np.median(lm_err):.3f}"


def test_local_ba_respects_fixed_poses(rng):
    X, T_gt, T0, X0, obs = make_ba_problem(rng)
    P = len(T_gt)
    fixed = jnp.ones(P, bool)  # all fixed: poses must not move
    res = lm.local_ba(
        CAM, jnp.asarray(T0), jnp.asarray(X0), obs, fixed,
        jnp.ones(len(X), bool), iters=5,
    )
    np.testing.assert_allclose(np.asarray(res.T_cw), T0, atol=1e-6)


# ---------------------------------------------------------------------------
# BALM
# ---------------------------------------------------------------------------

def make_balm_window(rng, W=4, n_planes=6, pts_per=120, noise=0.01, poses=None):
    """W lidar poses observing n_planes random planes.

    ``poses`` [W, 4, 4] overrides the default generated trajectory, so callers
    can build plane observations consistent with their own keyframe poses.
    """
    normals = rng.normal(size=(n_planes, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    ds = rng.uniform(2, 12, n_planes)
    if poses is not None:
        T_gt = np.asarray(poses, np.float32)
    else:
        T_gt = np.stack([
            np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([
                [0.5 * w, 0.05 * w, 0.0], rng.uniform(-0.1, 0.1, 3)
            ]).astype(np.float32)))) for w in range(W)
        ])

    M = n_planes * pts_per
    pts = np.zeros((W, M, 3), np.float32)
    for w in range(W):
        chunks = []
        for i in range(n_planes):
            # sample points on plane i within a 4m disc
            b = np.linalg.svd(normals[i : i + 1])[2][1:]  # 2 tangents
            uv2 = rng.uniform(-2, 2, (pts_per, 2))
            p = -ds[i] * normals[i] + uv2 @ b + rng.normal(0, noise, (pts_per, 3))
            chunks.append(p)
        p_world = np.concatenate(chunks).astype(np.float32)
        Tinv = np.linalg.inv(T_gt[w])
        pts[w] = (Tinv[:3, :3] @ p_world.T).T + Tinv[:3, 3]
    valid = np.ones((W, M), bool)
    return jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(T_gt)


def test_balm_cost_zero_at_truth(rng):
    pts, valid, T_gt = make_balm_window(rng, noise=0.0)
    c = balm.build_clusters(pts, valid, T_gt, max_voxels=256)
    assert int(c.valid.sum()) > 10
    cost = float(balm.eigen_cost(c, T_gt))
    n_pts = float(jnp.sum(c.N * c.valid[:, None]))
    assert cost / max(n_pts, 1) < 1e-4, f"per-point eigencost {cost/n_pts:.2e}"


def test_balm_gradient_matches_finite_diff(rng):
    pts, valid, T_gt = make_balm_window(rng, W=3, noise=0.005)
    c = balm.build_clusters(pts, valid, T_gt, max_voxels=256)
    # perturb poses so gradient is nonzero
    T0 = np.asarray(T_gt).copy()
    for w in range(1, 3):
        T0[w] = T0[w] @ np.asarray(lie.se3_exp(jnp.asarray(
            rng.normal(0, 0.01, 6).astype(np.float32))))
    T0 = jnp.asarray(T0)
    cost0, g = balm.gradient(c, T0)
    g = np.asarray(g, np.float64)

    eps = 1e-3
    for j in [3, 7, 10, 14]:  # spot-check tangent dims (skip pose-0 anchor dims)
        xi = np.zeros(18, np.float32)
        xi[j] = eps
        cp = float(balm._cost_of_tangent(jnp.asarray(xi), c, T0))
        xi[j] = -eps
        cm = float(balm._cost_of_tangent(jnp.asarray(xi), c, T0))
        fd = (cp - cm) / (2 * eps)
        assert abs(fd - g[j]) < 0.05 * max(abs(fd), abs(g[j]), 1.0), (
            f"dim {j}: fd {fd:.4f} vs grad {g[j]:.4f}"
        )


def test_balm_hessian_symmetric_finite(rng):
    pts, valid, T_gt = make_balm_window(rng, W=3)
    c = balm.build_clusters(pts, valid, T_gt, max_voxels=256)
    q = balm.quadratic(c, T_gt)
    H = np.asarray(q.H)
    assert np.isfinite(H).all()
    np.testing.assert_allclose(H, H.T, atol=1e-2 * max(1.0, np.abs(H).max()))


def test_balm_window_optimization_recovers_poses(rng):
    pts, valid, T_gt = make_balm_window(rng, W=4, noise=0.005)
    c = balm.build_clusters(pts, valid, T_gt, max_voxels=256)
    T0 = np.asarray(T_gt).copy()
    for w in range(1, 4):
        T0[w] = T0[w] @ np.asarray(lie.se3_exp(jnp.asarray(
            rng.normal(0, 0.02, 6).astype(np.float32))))
    T_fin, cost = balm.optimize_window(c, jnp.asarray(T0), iters=12)
    T_fin = np.asarray(T_fin)
    # compare relative poses (gauge: pose 0 fixed)
    for w in range(1, 4):
        rel_gt = np.linalg.inv(np.asarray(T_gt)[0]) @ np.asarray(T_gt)[w]
        rel_fin = np.linalg.inv(T_fin[0]) @ T_fin[w]
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(rel_gt) @ rel_fin, dtype=jnp.float32)))
        before = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(rel_gt) @ np.linalg.inv(T0[0]) @ T0[w], dtype=jnp.float32)))
        assert np.abs(err).max() < 0.5 * np.abs(before).max() + 2e-3, (
            f"pose {w}: err {np.abs(err).max():.4f} vs init {np.abs(before).max():.4f}"
        )


def test_balm_two_level_refinement_harvests_more(rng):
    """A scene with small planar facets inside non-planar 1 m root voxels:
    the layer-2 split (recut, bavoxel.h:568-602) must harvest child planes
    the root-only pass discards."""
    # staircase: many 0.5 m steps — each 1 m voxel contains an L-shaped
    # (non-planar) point set whose 0.5 m children are planar
    W = 3
    pts_all, val_all = [], []
    n_per = 2400
    for w in range(W):
        r = np.random.default_rng(w)
        xs = r.uniform(0, 8, n_per)
        ys = r.uniform(0, 4, n_per)
        step = np.floor(xs * 2.0) * 0.5      # 0.5 m treads
        half = (xs * 2.0 - np.floor(xs * 2.0)) > 0.5
        # tread (horizontal) or riser (vertical) surfaces
        z = np.where(half, step + 0.5 * r.uniform(0, 1, n_per), step)
        x = np.where(half, np.floor(xs * 2.0) * 0.5 + 0.5, xs)
        pts = np.stack([x, ys, z], -1) + 0.003 * r.standard_normal((n_per, 3))
        pts_all.append(pts.astype(np.float32))
        val_all.append(np.ones(n_per, bool))
    pts = jnp.asarray(np.stack(pts_all))
    val = jnp.asarray(np.stack(val_all))
    T = jnp.tile(jnp.eye(4), (W, 1, 1))

    c_root = balm.build_clusters(pts, val, T, voxel_size=1.0, max_voxels=512,
                                 refine=False)
    c_two = balm.build_clusters(pts, val, T, voxel_size=1.0, max_voxels=512,
                                refine=True)
    n_root = int(c_root.valid.sum())
    n_two = int(c_two.valid.sum())
    assert n_two > 1.5 * max(n_root, 1) + 2, (n_root, n_two)


def test_balm_marginalize_exact(rng):
    """Folding old KFs into the fixed prior column is exact at the
    marginalization poses (to_margi, bavoxel.h:604-637)."""
    pts, valid, T_gt = make_balm_window(rng, W=4, noise=0.005)
    c = balm.build_clusters(pts, valid, T_gt, max_voxels=256)
    cost_full = float(balm.eigen_cost(c, T_gt))
    cm = balm.marginalize(c, T_gt, n_marg=2)
    T_m = jnp.concatenate([jnp.eye(4)[None], T_gt[2:]], axis=0)
    cost_marg = float(balm.eigen_cost(cm, T_m))
    assert abs(cost_full - cost_marg) < 1e-3 * max(abs(cost_full), 1.0), (
        cost_full, cost_marg)
    # and the quadratic in the remaining free poses stays finite/symmetric
    q = balm.quadratic(cm, T_m)
    assert np.isfinite(np.asarray(q.H)).all()
