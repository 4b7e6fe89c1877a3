"""BALM2 plane eigen-factor for LiDAR bundle adjustment.

TPU-native re-design of the reference's BALM machinery (``bavoxel.h``:
``cut_voxel`` world-frame voxelization, ``OCTO_TREE_NODE::recut`` adaptive
plane test, ``VOX_HESS::acc_evaluate2`` analytic per-voxel Jacobian/Hessian;
``LidarRes.cc``: window accumulation + chain rule; ``G2oTypesWithLidar``:
the g2o multi-edge injecting the dense cross-pose Hessian).

Key re-designs:

- **Point clusters, not points, at optimization time.** Following BALM2's
  point-cluster insight, per-(voxel, keyframe) second-moment accumulators
  (N, Σp, Σpp^T) are built ONCE in each keyframe's LiDAR frame; during
  optimization only the 10-number clusters are rigidly transformed and
  summed — the cost per LM iteration is independent of point count.
- **Fixed-depth voxelization.** The reference's octree is capped at
  ``layer_limit=2`` anyway (bavoxel.cc); we voxelize at the configured sizes
  (1 m root; optionally a finer pass), keep the voxels whose total cluster
  passes the plane test (min points, eigenvalue-ratio — ``judge_eigen``,
  bavoxel.h:492), padded to a static voxel capacity.
- **Autodiff J/H instead of 400 lines of hand-derived blocks.** The cost
  ``Σ_v N_v λ_min(cov_v)`` is a closed differentiable function of the window
  pose tangents; ``jax.grad`` + forward-over-reverse ``jax.hessian`` on the
  6W-dim tangent reproduce ``acc_evaluate2``'s analytic Hessian exactly
  (verified against finite differences in tests). W <= ~8 keeps the Hessian
  tiny.
- Numerical anchoring is per voxel: clusters are stored centered (mean +
  scatter) and evaluated in world-minus-voxel-anchor coordinates, a stronger
  f32-safe version of the reference's re-anchoring at the first window pose
  (``LidarRes.cc:52-54``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import lie


class VoxelClusters(NamedTuple):
    """Per-(voxel, window-KF) point clusters in each KF's LiDAR frame.

    Stored in CENTERED form: per-cluster mean + within-cluster scatter
    (Σ (p-m)(p-m)^T). With the first moment identically zero, the rigid
    transform of a cluster has no cross terms and every quantity stays
    O(voxel_size) — f32-exact where raw Σpp^T moments (|p| ~ 10-100 m)
    catastrophically cancel. Equivalent information to BALM2's PointCluster
    (tools.h:163), just in the numerically stable basis.
    """

    N: jax.Array      # [V, W] point counts
    mean: jax.Array   # [V, W, 3] cluster mean, LiDAR frame
    Pc: jax.Array     # [V, W, 3, 3] centered scatter Σ (p-m)(p-m)^T
    center: jax.Array  # [V, 3] build-time world voxel center (f32 anchor)
    valid: jax.Array  # [V] voxel passes the plane test


@partial(jax.jit, static_argnames=("voxel_size", "max_voxels", "min_points",
                                   "plane_ratio"))
def build_clusters(
    points: jax.Array,   # [W, M, 3] surf points per window KF, LiDAR frame
    valid: jax.Array,    # [W, M]
    T_wl: jax.Array,     # [W, 4, 4] initial world-from-lidar poses
    voxel_size: float = 1.0,
    max_voxels: int = 512,
    min_points: int = 15,
    plane_ratio: float = 1.0 / 25.0,
) -> VoxelClusters:
    """cut_voxel + plane test, vectorized.

    Voxel membership is fixed using the *initial* poses (exactly the
    reference's behavior: ``cut_voxel`` hashes world coordinates once per
    window build). The plane test keeps voxels with >= ``min_points`` and
    λ_min/λ_mid < ``plane_ratio`` (judge_eigen with eigen_value_array[0]).
    Returns clusters padded to ``max_voxels``.
    """
    W, M, _ = points.shape
    p_w = jax.vmap(lie.se3_apply)(T_wl, points)           # [W, M, 3]
    pts = p_w.reshape(-1, 3)
    val = valid.reshape(-1)
    kf = jnp.repeat(jnp.arange(W, dtype=jnp.int32), M)

    # Voxel keys on a 1024^3 grid centered at the window centroid.
    center = jnp.sum(jnp.where(val[:, None], pts, 0.0), axis=0) / jnp.maximum(
        jnp.sum(val), 1
    )
    rel = jnp.floor((pts - center) / voxel_size).astype(jnp.int32) + 512
    in_grid = jnp.all((rel >= 0) & (rel < 1024), axis=-1) & val
    key = (rel[:, 0] << 20) | (rel[:, 1] << 10) | rel[:, 2]
    BIG = jnp.iinfo(jnp.int32).max
    key = jnp.where(in_grid, key, BIG)

    # Unique voxels via sort; take the first max_voxels distinct keys.
    order = jnp.argsort(key)
    key_s = key[order]
    head = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]])
    head &= key_s != BIG
    vox_of_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1   # [WM]
    vox_of_sorted = jnp.where(key_s != BIG, vox_of_sorted, max_voxels)
    vox_of_sorted = jnp.clip(vox_of_sorted, 0, max_voxels)

    # Two-pass centered scatter per (voxel, kf), in LiDAR frames for reuse.
    pts_l_s = points.reshape(-1, 3)[order]
    kf_s = kf[order]
    val_s = key_s != BIG
    idx = (vox_of_sorted, kf_s)
    wgt = val_s.astype(points.dtype)
    N = jnp.zeros((max_voxels + 1, W), points.dtype).at[idx].add(wgt)
    S = jnp.zeros((max_voxels + 1, W, 3), points.dtype).at[idx].add(
        pts_l_s * wgt[:, None]
    )
    mean = S / jnp.maximum(N, 1.0)[..., None]
    centered = (pts_l_s - mean[idx]) * wgt[:, None]
    Pc = jnp.zeros((max_voxels + 1, W, 3, 3), points.dtype).at[idx].add(
        jnp.einsum("mi,mj->mij", centered, centered)
    )
    N, mean, Pc = N[:max_voxels], mean[:max_voxels], Pc[:max_voxels]

    # Per-voxel world anchor: mean of the voxel's points at the initial poses.
    Sw_sum = jnp.zeros((max_voxels + 1, 3), points.dtype).at[
        (vox_of_sorted,)
    ].add(pts[order] * wgt[:, None])[:max_voxels]
    n_tot0 = jnp.maximum(jnp.sum(N, axis=1), 1.0)
    centers = Sw_sum / n_tot0[:, None]

    # Plane test on the total world-frame cluster at the initial poses.
    clusters = VoxelClusters(N, mean, Pc, centers, jnp.ones(max_voxels, bool))
    cov, n_tot = _total_cov(clusters, T_wl)
    evals = jnp.linalg.eigvalsh(cov)  # ascending
    lam0, lam1 = evals[:, 0], evals[:, 1]
    planar = (n_tot >= min_points) & (
        lam0 < plane_ratio * jnp.maximum(lam1, 1e-9)
    )
    return clusters._replace(valid=planar)


def _transform_moments(c: "VoxelClusters", T_wl: jax.Array):
    """Transform all (voxel, KF) clusters to voxel-centered world coords.

    With centered storage the cluster in world-minus-anchor coordinates is
    mean' = R m + t - center (O(voxel)) and scatter' = R Pc R^T; the first
    moment of the centered part is exactly zero so there are no cross terms.
    Returns (S_q [V, W, 3], P_q [V, W, 3, 3]) — the Σq and Σqq^T moments.
    """
    R = lie.rotation(T_wl)          # [W, 3, 3]
    t = lie.translation(T_wl)       # [W, 3]
    m_w = jnp.einsum("wij,vwj->vwi", R, c.mean) + (
        t[None, :, :] - c.center[:, None, :]
    )                                                    # [V, W, 3]
    RPR = jnp.einsum("wij,vwjk,wlk->vwil", R, c.Pc, R)   # [V, W, 3, 3]
    S_q = c.N[..., None] * m_w
    P_q = RPR + c.N[..., None, None] * jnp.einsum("vwi,vwj->vwij", m_w, m_w)
    return S_q, P_q


def _total_cov(c: VoxelClusters, T_wl: jax.Array):
    """Total voxel-centered covariance per voxel given window poses [W, 4, 4].

    Numerical anchoring is PER VOXEL (each voxel's build-time centroid is
    subtracted inside the rigid transform) — a stronger version of the
    reference's window re-anchoring at mPose0 (LidarRes.cc:52-54). The
    covariance is exactly invariant to the shift, and every moment stays
    O(voxel_size) so f32 does not cancel.
    """
    Sw, Pw = _transform_moments(c, T_wl)
    N_tot = jnp.sum(c.N, axis=1)                      # [V]
    S_tot = jnp.sum(Sw, axis=1)                       # [V, 3]
    P_tot = jnp.sum(Pw, axis=1)                       # [V, 3, 3]
    n = jnp.maximum(N_tot, 1.0)
    mu = S_tot / n[:, None]
    cov = P_tot / n[:, None, None] - jnp.einsum("vi,vj->vij", mu, mu)
    # Invalid/padded voxels get a fixed well-separated spectrum: exactly
    # repeated eigenvalues NaN the eigh autodiff even under a zero weight
    # (0 * nan = nan), so never let them reach eigvalsh.
    safe = jnp.diag(jnp.asarray([1.0, 2.0, 3.0], cov.dtype))
    cov = jnp.where(c.valid[:, None, None], cov, safe)
    cov = cov + 1e-9 * jnp.eye(3, dtype=cov.dtype)
    return cov, N_tot


def eigen_cost(c: VoxelClusters, T_wl: jax.Array) -> jax.Array:
    """Window cost Σ_v coe_v · λ_min(cov_v), coe = N (evaluate_only_residual,
    bavoxel.h:276; coe accumulation bavoxel.h:66-71)."""
    cov, N_tot = _total_cov(c, T_wl)
    lam_min = jnp.linalg.eigvalsh(cov)[:, 0]
    w = c.valid.astype(cov.dtype) * N_tot
    return jnp.sum(w * lam_min)


def _cost_of_tangent(xi: jax.Array, c: VoxelClusters, T_wl0: jax.Array) -> jax.Array:
    """Cost as a function of stacked right-tangent updates [W*6]."""
    W = T_wl0.shape[0]
    dT = lie.se3_exp(xi.reshape(W, 6))
    return eigen_cost(c, T_wl0 @ dT)


class BalmQuad(NamedTuple):
    H: jax.Array     # [6W, 6W]
    g: jax.Array     # [6W]
    cost: jax.Array


@partial(jax.jit, static_argnames=())
def quadratic(c: VoxelClusters, T_wl: jax.Array) -> BalmQuad:
    """Exact gradient + Hessian of the eigen cost at the current poses
    (right perturbation per pose) — the payload the reference injects via
    ``EdgeLidar::constructQuadraticForm``."""
    W = T_wl.shape[0]
    xi0 = jnp.zeros(W * 6, T_wl.dtype)
    cost, g = jax.value_and_grad(_cost_of_tangent)(xi0, c, T_wl)
    H = jax.hessian(_cost_of_tangent)(xi0, c, T_wl)
    return BalmQuad(H, g, cost)


def gradient(c: VoxelClusters, T_wl: jax.Array):
    W = T_wl.shape[0]
    xi0 = jnp.zeros(W * 6, T_wl.dtype)
    return jax.value_and_grad(_cost_of_tangent)(xi0, c, T_wl)


# ---------------------------------------------------------------------------
# Standalone BALM solve (used for LiDAR-only window refinement + tests)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters",))
def optimize_window(
    c: VoxelClusters,
    T_wl0: jax.Array,   # [W, 4, 4]
    iters: int = 10,
    fix_first: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Damped-Newton minimization of the eigen cost over window poses
    (the inner loop of BALM2's ``damping_iter``). Pose 0 is gauge-fixed."""
    W = T_wl0.shape[0]
    D = 6 * W

    def step(carry, _):
        T, lam, cost_prev = carry
        q = quadratic(c, T)
        free = jnp.ones(D, T.dtype)
        if fix_first:
            free = free.at[:6].set(0.0)
        H = q.H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        H = H + lam * jnp.diag(jnp.abs(jnp.diag(H))) + 1e-7 * jnp.eye(D, dtype=T.dtype)
        delta = -jnp.linalg.solve(H, q.g * free)
        T_new = T @ lie.se3_exp(delta.reshape(W, 6))
        cost_new = eigen_cost(c, T_new)
        accept = cost_new < cost_prev
        T = jnp.where(accept, T_new, T)
        lam = jnp.where(accept, lam * 0.3, lam * 5.0)
        cost = jnp.where(accept, cost_new, cost_prev)
        return (T, lam, cost), cost

    cost0 = eigen_cost(c, T_wl0)
    (T, _, cost), _ = jax.lax.scan(
        step, (T_wl0, jnp.asarray(1e-4, T_wl0.dtype), cost0), None, length=iters
    )
    return T, cost
