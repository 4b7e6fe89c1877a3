"""New-map-point triangulation between covisible keyframe pairs.

Batched re-design of ``LocalMapping::CreateNewMapPoints``
(LocalMapping.cc:402-727): for the freshly inserted keyframe and each of its
best covisible neighbors, epipolar-gated descriptor matching over the still
unmatched features (``ORBmatcher::SearchForTriangulation`` +
``CheckDistEpipolarLine``), parallax test, batched DLT triangulation
(``GeometricTools::Triangulate``), then reprojection / positive-depth /
scale-consistency validation before allocating landmarks observed by BOTH
views. One jitted kernel per pair; the host loops over the (<= few) neighbor
pairs so the whole pass is a handful of fixed-shape kernel calls per KF.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geom import camera as cam_mod, lie, triangulate as tri
from ..ops import matching
from . import mapstate

# chi2 gate for a 2-dof reprojection residual at 95% (LocalMapping.cc:597)
CHI2_MONO = 5.991
# rays closer to parallel than this triangulate badly (LocalMapping.cc:491)
MIN_PARALLAX_COS = 0.9998


def _hat(v):
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ], v.dtype)


def _pair_candidates(
    m: mapstate.MapState,
    kf1: jax.Array,          # new keyframe id
    kf2: jax.Array,          # covisible neighbor id
    pair_ok: jax.Array,      # bool: neighbor is real (NO_KF pad -> False)
    cam: cam_mod.Pinhole,
    sigma2: jax.Array,       # [n_levels]
    scale_factors: jax.Array,  # [n_levels]
):
    """Pure candidate computation for one pair (no map writes): returns
    (want [F], Xw [F, 3], normal [F, 3], dist_rng [F, 2], idx2 [F]) —
    vmappable over the neighbor axis."""
    kf1c = jnp.clip(kf1, 0, m.K - 1)
    kf2c = jnp.clip(kf2, 0, m.K - 1)
    T1 = m.kf_T_cw[kf1c]
    T2 = m.kf_T_cw[kf2c]

    uv1, uv2 = m.kf_xy[kf1c], m.kf_xy[kf2c]
    lvl1, lvl2 = m.kf_level[kf1c], m.kf_level[kf2c]
    d1, d2 = m.kf_desc[kf1c], m.kf_desc[kf2c]
    unm1 = m.kf_feat_valid[kf1c] & (m.kf_feat_lm[kf1c] == mapstate.NO_LM)
    unm2 = m.kf_feat_valid[kf2c] & (m.kf_feat_lm[kf2c] == mapstate.NO_LM)

    # Close stereo-depth features are handled by stereo landmark creation
    # (Tracking.cc:3121-3206); triangulating them again only adds epipolar
    # aliasing noise. Keep only mono / far-stereo features, mirroring the
    # reference triangulating what stereo can't anchor.
    th_close = 12.0 * cam.bf / cam.fx           # ~12 x baseline [m]
    ur1, ur2 = m.kf_uvr[kf1c][:, 2], m.kf_uvr[kf2c][:, 2]
    z1s = cam.bf / jnp.maximum(uv1[:, 0] - ur1, 1e-3)
    z2s = cam.bf / jnp.maximum(uv2[:, 0] - ur2, 1e-3)
    unm1 &= (ur1 < 0) | (z1s > th_close)
    unm2 &= (ur2 < 0) | (z2s > th_close)

    # Fundamental matrix: x2^T F21 x1 = 0 with T21 = T2w inv(T1w)
    # (ComputeF12, LocalMapping.cc dead analog lives in ORBmatcher usage).
    T21 = T2 @ lie.se3_inverse(T1)
    R21 = T21[:3, :3]
    t21 = T21[:3, 3]
    K = jnp.array([
        [cam.fx, 0.0, cam.cx],
        [0.0, cam.fy, cam.cy],
        [0.0, 0.0, 1.0],
    ], T1.dtype)
    Kinv = jnp.linalg.inv(K)
    F21 = Kinv.T @ (_hat(t21) @ R21) @ Kinv

    # Stereo-rig baseline gate (LocalMapping.cc:435-447: for stereo sensors
    # a pair only triangulates when the inter-KF baseline exceeds the rig
    # baseline — below that, stereo depth is strictly better).
    c1w = lie.translation(lie.se3_inverse(T1))
    c2w = lie.translation(lie.se3_inverse(T2))
    baseline_ok = jnp.linalg.norm(c1w - c2w) > (cam.bf / cam.fx)

    s2_kp2 = sigma2[jnp.clip(lvl2, 0, sigma2.shape[0] - 1)]
    epi = matching.epipolar_mask(uv1, uv2, F21, s2_kp2)
    idx2, dist_h, ok = matching.match_descriptors(
        d1, d2, unm1, unm2, mask=epi,
        max_dist=40, ratio=0.8, mutual=True,
    )
    ok = matching.resolve_duplicates(idx2, dist_h, ok, uv2.shape[0])
    ok &= baseline_ok

    # Ray parallax in world frame.
    xn1 = cam_mod.unproject(cam, uv1, jnp.ones(uv1.shape[0], T1.dtype))
    xn2_all = cam_mod.unproject(cam, uv2, jnp.ones(uv2.shape[0], T1.dtype))
    xn2 = xn2_all[idx2]
    r1 = xn1 @ T1[:3, :3]                   # R1^T xn1 (world ray dirs)
    r2 = xn2 @ T2[:3, :3]
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )
    ok &= (cosp > 0.0) & (cosp < MIN_PARALLAX_COS)

    # parallax must beat what the stereo rig itself would give at this depth
    # (cosParallaxStereo comparison, LocalMapping.cc:478-540): rays flatter
    # than 2 x atan2(b/2, z) triangulate worse than the rig.
    z_hint = jnp.where(ur1 > 0, z1s, 1e6)
    cos_stereo = jnp.cos(2.0 * jnp.arctan2(0.5 * cam.bf / cam.fx, z_hint))
    ok &= cosp < cos_stereo

    Xw = tri.triangulate_dlt(xn1[:, :2], xn2[:, :2], T1, T2)

    # Validation in both views (LocalMapping.cc:560-640).
    Xc1 = lie.se3_apply(T1, Xw)
    Xc2 = lie.se3_apply(T2, Xw)
    ok &= (Xc1[:, 2] > 0.05) & (Xc2[:, 2] > 0.05)
    p1 = cam_mod.project(cam, Xc1)
    p2 = cam_mod.project(cam, Xc2)
    e1 = jnp.sum((p1 - uv1) ** 2, axis=-1)
    e2 = jnp.sum((p2 - uv2[idx2]) ** 2, axis=-1)
    s2_1 = sigma2[jnp.clip(lvl1, 0, sigma2.shape[0] - 1)]
    s2_2 = s2_kp2[idx2]
    ok &= (e1 <= CHI2_MONO * s2_1) & (e2 <= CHI2_MONO * s2_2)

    # Scale consistency (ratioDist vs ratioOctave, LocalMapping.cc:643-660).
    c1, c2 = c1w, c2w
    dist1 = jnp.linalg.norm(Xw - c1, axis=-1)
    dist2 = jnp.linalg.norm(Xw - c2, axis=-1)
    ratio_dist = dist2 / jnp.maximum(dist1, 1e-9)
    sf1 = scale_factors[jnp.clip(lvl1, 0, scale_factors.shape[0] - 1)]
    sf2 = scale_factors[jnp.clip(lvl2, 0, scale_factors.shape[0] - 1)][idx2]
    ratio_oct = sf1 / sf2
    factor = 1.5 * scale_factors[1]
    ok &= (ratio_dist * factor > ratio_oct) & (ratio_dist < ratio_oct * factor)
    ok &= (dist1 > 1e-3) & (dist2 > 1e-3)
    want = ok & pair_ok

    # Landmark attributes from the first (new-KF) view.
    dmean = 0.5 * ((Xw - c1) + (Xw - c2))
    normal = dmean / jnp.maximum(jnp.linalg.norm(dmean, axis=-1, keepdims=True), 1e-9)
    lvl1c = jnp.clip(lvl1, 0, scale_factors.shape[0] - 1)
    max_d = dist1 * scale_factors[lvl1c]
    min_d = max_d / scale_factors[-1]
    dist_rng = jnp.stack([min_d, max_d], -1)
    return want, Xw, normal, dist_rng, idx2


@jax.jit
def triangulate_pair(
    m: mapstate.MapState,
    kf1: jax.Array,
    kf2: jax.Array,
    pair_ok: jax.Array,
    cam: cam_mod.Pinhole,
    sigma2: jax.Array,
    scale_factors: jax.Array,
) -> mapstate.MapState:
    """Triangulate new landmarks between ``kf1`` and ``kf2``; returns the
    updated map (single-pair variant, kept for tests/compat)."""
    want, Xw, normal, dist_rng, idx2 = _pair_candidates(
        m, kf1, kf2, pair_ok, cam, sigma2, scale_factors)
    kf1c = jnp.clip(kf1, 0, m.K - 1)
    kf2c = jnp.clip(kf2, 0, m.K - 1)
    m, lm_ids = mapstate.add_landmarks(
        m, kf1c, jnp.arange(m.F, dtype=jnp.int32), Xw,
        m.kf_desc[kf1c], normal, dist_rng, want,
    )
    m = mapstate.link_observations(m, kf2c, idx2, lm_ids, want)
    return m


@partial(jax.jit, static_argnames=("max_pairs",))
def triangulate_batch(
    m: mapstate.MapState,
    kf1: jax.Array,
    neighbors: jax.Array,    # [max_pairs] neighbor ids (NO_KF pad)
    cam: cam_mod.Pinhole,
    sigma2: jax.Array,
    scale_factors: jax.Array,
    max_pairs: int = 3,
) -> mapstate.MapState:
    """All neighbor pairs in ONE program: the candidate compute vmaps over
    the neighbor axis (each pair's F x F epipolar Hamming etc. batches on
    device) and landmark allocation happens once over the union — ~3
    sequential pair kernels + 3 allocator passes collapse into 1 + 1
    (~25 ms/KF event on chip). First pair wins when two pairs triangulate
    the same kf1 feature (the sequential form's unm1-refresh semantics)."""
    kf1c = jnp.clip(kf1, 0, m.K - 1)
    want, Xw, normal, dist_rng, idx2 = jax.vmap(
        lambda nb: _pair_candidates(
            m, kf1, nb, nb != mapstate.NO_KF, cam, sigma2, scale_factors)
    )(neighbors)                                     # each [P, F, ...]
    P, F = want.shape
    # first-pair-wins dedupe per kf1 feature
    prior = jnp.cumsum(want.astype(jnp.int32), axis=0) - want.astype(jnp.int32)
    want = want & (prior == 0)

    feat_idx = jnp.tile(jnp.arange(F, dtype=jnp.int32), P)
    d1 = m.kf_desc[kf1c]
    m, lm_ids = mapstate.add_landmarks(
        m, kf1c, feat_idx, Xw.reshape(-1, 3),
        jnp.tile(d1, (P, 1)), normal.reshape(-1, 3),
        dist_rng.reshape(-1, 2), want.reshape(-1),
    )
    lm_ids = lm_ids.reshape(P, F)
    for p in range(max_pairs):   # small static unroll: second observations
        kf2c = jnp.clip(neighbors[p], 0, m.K - 1)
        m = mapstate.link_observations(m, kf2c, idx2[p], lm_ids[p], want[p])
    return m


def create_new_map_points(
    m: mapstate.MapState,
    kf_id: int,
    neighbor_ids: list[int],
    cam: cam_mod.Pinhole,
    sigma2: jax.Array,
    scale_factors: jax.Array,
    max_pairs: int = 4,
) -> mapstate.MapState:
    """Batched over the covisible pairs (the reference uses the 10 best
    covisible KFs; a handful of pairs recovers most mid/far structure)."""
    nbs = [nb for nb in neighbor_ids[:max_pairs]
           if nb != mapstate.NO_KF and nb != kf_id]
    nbs += [mapstate.NO_KF] * (max_pairs - len(nbs))
    return triangulate_batch(
        m, jnp.int32(kf_id), jnp.asarray(nbs, jnp.int32), cam, sigma2,
        scale_factors, max_pairs=max_pairs,
    )
