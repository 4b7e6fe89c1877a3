"""Per-frame tracking kernels: frame build, guided matching, pose tracking.

The jitted compute underneath the host-side state machine in
``slam/system.py`` — reimplements ``Tracking``'s hot path (Tracking.cc:
``GrabImageStereoLidar`` frame construction, ``TrackWithMotionModel``,
``TrackLocalMap``) as fixed-shape batched steps. The decision logic
(state machine, ``NeedNewKeyFrame``) stays on the host where the reference
has it too.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import camera as cam_mod, lie
from ..ops import matching, orb, stereo
from . import mapstate
from ..solver import lm as lm_mod, pnp as pnp_mod


class Frame(NamedTuple):
    """Processed stereo frame (all device arrays, padded to F features)."""

    xy: jax.Array        # [F, 2]
    uvr: jax.Array       # [F, 3] (u, v, u_r); u_r = -1 for mono
    depth: jax.Array     # [F] stereo depth (0 invalid)
    level: jax.Array     # [F]
    angle: jax.Array     # [F]
    desc: jax.Array      # [F, 8]
    valid: jax.Array     # [F]


@partial(jax.jit, static_argnames=("n_features", "n_levels"))
def build_frame(
    img_l: jax.Array,
    img_r: jax.Array,
    cam: cam_mod.Pinhole,
    scale_factors: jax.Array,
    n_features: int = 1024,
    n_levels: int = 8,
) -> Frame:
    """ORB extract L/R + stereo match + subpixel refine (Frame ctor,
    Frame.cc:111: dual ExtractORB -> ComputeStereoMatches)."""
    kl = orb.extract(img_l, n_features=n_features, n_levels=n_levels)
    kr = orb.extract(img_r, n_features=n_features, n_levels=n_levels)
    idx, disp, ok = stereo.match_stereo(
        kl.xy, kl.level, kl.desc, kl.valid,
        kr.xy, kr.level, kr.desc, kr.valid,
        scale_factors, cam.bf, jnp.asarray(cam.baseline),
    )
    ur0 = kl.xy[:, 0] - disp
    ur_ref, ok2 = stereo.subpixel_refine(
        img_l.astype(jnp.float32), img_r.astype(jnp.float32), kl.xy, ur0, ok
    )
    disparity = kl.xy[:, 0] - ur_ref
    has_depth = ok & ok2 & (disparity > 0.1)
    depth = jnp.where(has_depth, cam.bf / jnp.maximum(disparity, 0.1), 0.0)
    uvr = jnp.concatenate(
        [kl.xy, jnp.where(has_depth, ur_ref, -1.0)[:, None]], axis=-1
    )
    return Frame(
        xy=kl.xy, uvr=uvr, depth=depth, level=kl.level, angle=kl.angle,
        desc=kl.desc, valid=kl.valid,
    )


class TrackResult(NamedTuple):
    T_cw: jax.Array       # [4, 4] optimized pose
    feat_lm: jax.Array    # [F] matched landmark id per feature (NO_LM none)
    n_inliers: jax.Array
    n_matches: jax.Array


@partial(jax.jit, static_argnames=())
def track_frame(
    m: mapstate.MapState,
    frame: Frame,
    T_cw_pred: jax.Array,
    cam: cam_mod.Pinhole,
    scale_factors: jax.Array,
    sigma2: jax.Array,
    radius: jax.Array,          # base search radius in px
) -> TrackResult:
    """TrackWithMotionModel + TrackLocalMap fused: project ALL valid
    landmarks at the predicted pose, guided-match against the frame, then
    pose-only optimize with outlier gating.

    The reference does two projection passes (last-frame match then local
    map); with dense batched matching one pass against the landmark pool
    covers both. Frustum and scale-range gates mirror ``isInFrustum``.
    """
    X = m.lm_pos
    Xc = lie.se3_apply(T_cw_pred, X)
    uv_proj = cam_mod.project(cam, Xc)
    depth_ok = Xc[:, 2] > 0.1
    in_img = cam_mod.in_image(cam, uv_proj)
    # scale-invariance distance gate (isInFrustum)
    dist = jnp.linalg.norm(Xc, axis=-1)
    dist_ok = (dist >= 0.5 * m.lm_dist[:, 0]) & (dist <= 1.5 * jnp.maximum(m.lm_dist[:, 1], 1e-3))
    cand = m.lm_valid & depth_ok & in_img & dist_ok

    # predicted octave from distance (MapPoint::PredictScale)
    ratio = jnp.maximum(m.lm_dist[:, 1], 1e-3) / jnp.maximum(dist, 1e-3)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1.0)) / jnp.log(scale_factors[1])),
        0, scale_factors.shape[0] - 1,
    ).astype(jnp.int32)

    rad = radius * scale_factors[pred_level]
    kp_idx, dist_h, matched = matching.search_by_projection(
        uv_proj, pred_level, m.lm_desc, cand,
        frame.xy, frame.level, frame.desc, frame.valid,
        rad, max_dist=matching.TH_HIGH, ratio=0.9,
    )
    matched = matching.resolve_duplicates(kp_idx, dist_h, matched, frame.xy.shape[0])

    # per-feature landmark assignment
    F = frame.xy.shape[0]
    feat_lm = jnp.full((F,), mapstate.NO_LM, jnp.int32)
    lm_ids = jnp.arange(m.L, dtype=jnp.int32)
    feat_lm = feat_lm.at[jnp.where(matched, kp_idx, F)].set(
        jnp.where(matched, lm_ids, mapstate.NO_LM), mode="drop"
    )
    has_lm = feat_lm != mapstate.NO_LM

    # pose-only optimization on the matched set
    lm_c = jnp.clip(feat_lm, 0, m.L - 1)
    X_obs = m.lm_pos[lm_c]
    inv_s2 = 1.0 / sigma2[jnp.clip(frame.level, 0, sigma2.shape[0] - 1)]
    stereo_obs = frame.uvr[:, 2] > 0
    res = lm_mod.pose_only_optimize(
        cam, T_cw_pred, X_obs, frame.uvr, inv_s2, stereo_obs,
        has_lm & frame.valid,
    )
    feat_lm = jnp.where(res.inliers, feat_lm, mapstate.NO_LM)
    return TrackResult(res.T_cw, feat_lm, res.n_inliers, jnp.sum(matched))


@partial(jax.jit, static_argnames=())
def track_frame_global(
    m: mapstate.MapState,
    frame: Frame,
    key: jax.Array,
    cam: cam_mod.Pinhole,
    sigma2: jax.Array,
) -> TrackResult:
    """Window-free descriptor tracking (TrackReferenceKeyFrame's role).

    The reference re-acquires after motion-model failure by BoW-accelerated
    global descriptor matching against the reference KF (Tracking.cc:2603);
    with batched Hamming the whole landmark pool is matched directly — no
    search window. The pose comes from batched PnP RANSAC, so the result is
    INITIALIZATION-FREE: this pass recovers from arbitrary prediction error
    (a pose-only LM from a bad init would inherit the drift it is supposed
    to fix).
    """
    kp_idx, dist_h, matched = matching.match_descriptors(
        m.lm_desc, frame.desc, m.lm_valid, frame.valid,
        max_dist=matching.TH_LOW, ratio=0.75, mutual=True,
    )
    matched = matching.resolve_duplicates(kp_idx, dist_h, matched, frame.xy.shape[0])

    F = frame.xy.shape[0]
    feat_lm = jnp.full((F,), mapstate.NO_LM, jnp.int32)
    lm_ids = jnp.arange(m.L, dtype=jnp.int32)
    feat_lm = feat_lm.at[jnp.where(matched, kp_idx, F)].set(
        jnp.where(matched, lm_ids, mapstate.NO_LM), mode="drop"
    )
    has_lm = feat_lm != mapstate.NO_LM
    lm_c = jnp.clip(feat_lm, 0, m.L - 1)
    X_obs = m.lm_pos[lm_c]
    res = pnp_mod.pnp_ransac(
        cam, X_obs, frame.xy, has_lm & frame.valid, key,
        n_hyp=64, min_inliers=12,
    )
    feat_lm = jnp.where(res.inliers, feat_lm, mapstate.NO_LM)
    return TrackResult(res.T_cw, feat_lm, res.n_inliers, jnp.sum(matched))


def _select(cond, a, b):
    """Elementwise tree select: cond ? a : b (cond is a traced scalar)."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(cond, x, y), a, b)


@jax.jit
def track_step(
    m: mapstate.MapState,
    frame: Frame,
    T_cw_prev: jax.Array,
    velocity: jax.Array,
    key: jax.Array,
    cam: cam_mod.Pinhole,
    scale_factors: jax.Array,
    sigma2: jax.Array,
    radius: jax.Array,
) -> tuple[mapstate.MapState, TrackResult, jax.Array, jax.Array]:
    """One fused tracking step: the motion-model guided pass
    (TrackWithMotionModel + TrackLocalMap fused, Tracking.cc:2737,2836) with
    found-counter bookkeeping and motion-model update on device.

    The expensive window-free global re-acquisition (TrackReferenceKeyFrame's
    role) is NOT run here: the host gates it on this pass's inlier count
    (``track_step_recover``), mirroring the reference's early-exit ladder —
    running it unconditionally costs ~2/3 of the per-frame budget for a pass
    that only matters on prediction failure.

    Returns (map', TrackResult, T_cw', velocity'). When tracking fails
    (<10 inliers) T_cw' is the motion-model prediction (dead reckoning) and
    the velocity/counters are left unchanged.
    """
    T_pred = lie.se3_orthonormalize(velocity @ T_cw_prev)
    res = track_frame(m, frame, T_pred, cam, scale_factors, sigma2, radius)
    ok = res.n_inliers >= 10
    res = res._replace(
        T_cw=jnp.where(ok, res.T_cw, T_pred),
        feat_lm=jnp.where(ok, res.feat_lm, mapstate.NO_LM),
    )
    m = update_found_counters(m, res.feat_lm, res.T_cw, cam, ok)
    vel_new = jnp.where(ok, res.T_cw @ lie.se3_inverse(T_cw_prev), velocity)
    return m, res, res.T_cw, vel_new


@jax.jit
def track_step_recover(
    m: mapstate.MapState,
    frame: Frame,
    T_cw_prev: jax.Array,
    T_pred: jax.Array,
    velocity: jax.Array,
    key: jax.Array,
    cam: cam_mod.Pinhole,
    scale_factors: jax.Array,
    sigma2: jax.Array,
    radius: jax.Array,
) -> tuple[mapstate.MapState, TrackResult, jax.Array, jax.Array]:
    """Failure-path re-acquisition: global descriptor matching + PnP RANSAC
    (initialization-free) followed by a guided refinement pass, best-of
    selected on device. Called by the host only when the motion-model pass
    came back weak — TrackReferenceKeyFrame / reacquisition semantics."""
    res_g = track_frame_global(m, frame, key, cam, sigma2)
    res2 = track_frame(m, frame, res_g.T_cw, cam, scale_factors, sigma2, radius)
    res = _select(
        (res_g.n_inliers >= 10) & (res2.n_inliers >= res_g.n_inliers),
        res2, res_g,
    )
    ok = res.n_inliers >= 10
    res = res._replace(
        T_cw=jnp.where(ok, res.T_cw, T_pred),
        feat_lm=jnp.where(ok, res.feat_lm, mapstate.NO_LM),
    )
    m = update_found_counters(m, res.feat_lm, res.T_cw, cam, ok)
    vel_new = jnp.where(ok, res.T_cw @ lie.se3_inverse(T_cw_prev), velocity)
    return m, res, res.T_cw, vel_new


@jax.jit
def update_found_counters(
    m: mapstate.MapState,
    feat_lm: jax.Array,
    T_cw: jax.Array,
    cam: cam_mod.Pinhole,
    frame_ok: jax.Array,
) -> mapstate.MapState:
    """IncreaseFound / IncreaseVisible bookkeeping after a tracked frame.

    ``visible`` counts every landmark whose frustum/scale gate passed at the
    final pose (isInFrustum hits); ``found`` counts only the matched inliers
    — their ratio is MapPointCulling's 0.25 rule. (Round 1 incremented both
    for the same set, so the ratio was identically 1 and the rule dead.)"""
    Xc = lie.se3_apply(T_cw, m.lm_pos)
    uv = cam_mod.project(cam, Xc)
    dist = jnp.linalg.norm(Xc, axis=-1)
    in_view = (
        m.lm_valid & (Xc[:, 2] > 0.1)
        & cam_mod.in_image(cam, uv)
        & (dist >= 0.5 * m.lm_dist[:, 0])
        & (dist <= 1.5 * jnp.maximum(m.lm_dist[:, 1], 1e-3))
        & frame_ok
    )
    visible = m.lm_visible + in_view.astype(jnp.int32)
    tracked = feat_lm != mapstate.NO_LM
    lm_c = jnp.where(tracked, feat_lm, m.L - 1)
    found = m.lm_found.at[lm_c].add(tracked.astype(jnp.int32))
    return m._replace(lm_found=found, lm_visible=visible)


@jax.jit
def near_existing_landmark(
    m: mapstate.MapState,
    frame: Frame,
    T_cw: jax.Array,
    cam: cam_mod.Pinhole,
    radius: jax.Array,
    rel_depth: jax.Array,
) -> jax.Array:
    """[F] mask: an existing valid landmark projects within ``radius`` px of
    the feature at compatible depth. Used to suppress duplicate stereo
    landmark creation (the role SearchInNeighbors' Fuse plays for the
    reference — preventing one physical point from spawning many MapPoints).
    """
    Xc = lie.se3_apply(T_cw, m.lm_pos)
    uv = cam_mod.project(cam, Xc)
    ok = m.lm_valid & (Xc[:, 2] > 0.1)
    du = jnp.abs(frame.xy[:, None, 0] - uv[None, :, 0])
    dv = jnp.abs(frame.xy[:, None, 1] - uv[None, :, 1])
    close = (du < radius) & (dv < radius) & ok[None, :]
    zr = frame.depth[:, None] / jnp.maximum(Xc[None, :, 2], 1e-3)
    depth_compat = (zr > 1.0 - rel_depth) & (zr < 1.0 + rel_depth)
    has_depth = frame.depth[:, None] > 0
    return jnp.any(close & jnp.where(has_depth, depth_compat, True), axis=1)


@jax.jit
def stereo_landmark_candidates(
    frame: Frame,
    T_cw: jax.Array,
    cam: cam_mod.Pinhole,
    feat_lm: jax.Array,
    th_depth: jax.Array,
    scale_factors: jax.Array,
):
    """Positions/descriptors for new stereo landmarks from unmatched close
    features (CreateNewKeyFrame's close-depth MapPoint creation,
    Tracking.cc:3121-3206).

    Returns (pos_w [F, 3], normal [F, 3], dist_range [F, 2], want [F]).
    """
    want = frame.valid & (frame.depth > 0) & (frame.depth < th_depth)
    want &= feat_lm == mapstate.NO_LM
    Xc = cam_mod.unproject(cam, frame.xy, frame.depth)
    T_wc = lie.se3_inverse(T_cw)
    Xw = lie.se3_apply(T_wc, Xc)
    center = lie.translation(T_wc)
    d = Xw - center
    dist = jnp.linalg.norm(d, axis=-1)
    normal = d / jnp.maximum(dist, 1e-9)[:, None]
    lvl = jnp.clip(frame.level, 0, scale_factors.shape[0] - 1)
    max_d = dist * scale_factors[lvl]
    min_d = max_d / scale_factors[-1]
    return Xw, normal, jnp.stack([min_d, max_d], -1), want
