"""Sim3 estimation, pose-graph optimization, loop-correction machinery."""

import numpy as np
import jax
import jax.numpy as jnp

from tc2li_slam_tpu.geom import lie
from tc2li_slam_tpu.solver import sim3 as s3


def test_umeyama_exact(rng):
    src = rng.normal(0, 5, (30, 3)).astype(np.float32)
    xi = rng.uniform(-0.5, 0.5, 7).astype(np.float32)
    xi[6] = 0.3  # scale log
    S_gt = lie.sim3_exp(jnp.asarray(xi))
    dst = np.asarray(lie.sim3_apply(S_gt, jnp.asarray(src)))
    S = s3.umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.ones(30))
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_gt), atol=1e-3)


def test_umeyama_no_scale(rng):
    src = rng.normal(0, 5, (30, 3)).astype(np.float32)
    xi = np.zeros(7, np.float32)
    xi[:6] = rng.uniform(-0.5, 0.5, 6)
    S_gt = lie.sim3_exp(jnp.asarray(xi))
    dst = np.asarray(lie.sim3_apply(S_gt, jnp.asarray(src)))
    S = s3.umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.ones(30), with_scale=False)
    assert abs(float(lie.sim3_scale(S)) - 1.0) < 1e-5
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_gt), atol=1e-3)


def test_sim3_ransac_outliers(rng):
    N = 100
    src = rng.normal(0, 5, (N, 3)).astype(np.float32)
    xi = rng.uniform(-0.4, 0.4, 7).astype(np.float32)
    xi[6] = 0.2
    S_gt = lie.sim3_exp(jnp.asarray(xi))
    dst = np.array(lie.sim3_apply(S_gt, jnp.asarray(src)))
    dst += rng.normal(0, 0.02, dst.shape)
    dst[:25] += rng.uniform(3, 10, (25, 3))  # outliers
    res = s3.sim3_ransac(
        jnp.asarray(src), jnp.asarray(dst, jnp.float32), jnp.ones(N, bool),
        jax.random.PRNGKey(0), with_scale=True,
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[:25].mean() < 0.2 and inl[25:].mean() > 0.9
    np.testing.assert_allclose(np.asarray(res.S), np.asarray(S_gt), atol=0.05)


def test_pose_graph_corrects_drift(rng):
    """Chain of 12 poses with accumulated drift; a loop edge back to pose 0
    pulls the chain into consistency (essential-graph behavior)."""
    K = 12
    # ground truth: poses on a circle-ish path returning near the start
    T_gt = [np.eye(4, dtype=np.float32)]
    for i in range(K - 1):
        dT = np.asarray(lie.se3_exp(jnp.asarray(
            [1.0, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / K], dtype=jnp.float32)))
        T_gt.append((T_gt[-1] @ np.linalg.inv(dT)).astype(np.float32))
    T_gt = np.stack(T_gt)  # world->kf convention: T_i maps world->cam_i

    # drifted estimate: small error injected into each relative motion
    T_est = [T_gt[0]]
    for i in range(K - 1):
        rel = T_gt[i + 1] @ np.linalg.inv(T_gt[i])
        noise = np.asarray(lie.se3_exp(jnp.asarray(
            rng.normal(0, 0.02, 6).astype(np.float32))))
        T_est.append((noise @ rel @ T_est[-1]).astype(np.float32))
    T_est = np.stack(T_est)

    # edges: odometry chain with the DRIFTED relative measurements (these are
    # what the system believes) + exact loop edge (K-1 -> 0)
    ii, jj, Sij, ww = [], [], [], []
    for i in range(K - 1):
        ii.append(i); jj.append(i + 1)
        Sij.append(T_est[i] @ np.linalg.inv(T_est[i + 1]))
        ww.append(1.0)
    ii.append(K - 1); jj.append(0)
    Sij.append(T_gt[K - 1] @ np.linalg.inv(T_gt[0]))
    ww.append(5.0)
    edges = s3.PoseGraphEdges(
        i=jnp.asarray(ii, jnp.int32), j=jnp.asarray(jj, jnp.int32),
        S_ij=jnp.asarray(np.stack(Sij), jnp.float32),
        weight=jnp.asarray(ww, jnp.float32),
        valid=jnp.ones(len(ii), bool),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    S_opt = s3.pose_graph_optimize(jnp.asarray(T_est), edges, fixed, iters=15)
    S_opt = np.asarray(S_opt)

    # the loop edge must now be satisfied much better than before
    def loop_err(T):
        rel = T[K - 1] @ np.linalg.inv(T[0])
        gt_rel = T_gt[K - 1] @ np.linalg.inv(T_gt[0])
        return np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(gt_rel) @ rel, dtype=jnp.float32))))

    before = loop_err(T_est)
    after = loop_err(S_opt)
    assert after < 0.2 * before + 1e-3, f"loop err before {before:.4f} after {after:.4f}"
    # end pose absolute error should also shrink
    e_before = np.linalg.norm(T_est[K - 1][:3, 3] - T_gt[K - 1][:3, 3])
    e_after = np.linalg.norm(S_opt[K - 1][:3, 3] - T_gt[K - 1][:3, 3])
    assert e_after < e_before
