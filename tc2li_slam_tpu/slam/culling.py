"""Map hygiene: landmark culling, keyframe culling, duplicate fusion.

Batched re-design of LocalMapping's maintenance passes:
- ``cull_landmarks``  — MapPointCulling (LocalMapping.cc:360): kill points
  with a poor found/visible ratio or too few observations shortly after
  creation.
- ``cull_keyframes``  — KeyFrameCulling (LocalMapping.cc:913): invalidate
  keyframes whose landmarks are >=90% redundantly observed.
- ``fuse_duplicates`` — SearchInNeighbors/Fuse (LocalMapping.cc:728,
  ORBmatcher::Fuse): merge landmark instances that are the same physical
  point (close in 3D + matching descriptors), redirecting feature links to
  the older instance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom import camera as cam_mod, lie
from ..ops import matching
from . import mapstate


@jax.jit
def cull_landmarks(m: mapstate.MapState, current_kf: jax.Array) -> mapstate.MapState:
    """MapPointCulling: found/visible < 0.25, or <=2 observations once the
    map has moved >=2 keyframes past the landmark's birth."""
    ratio = m.lm_found.astype(jnp.float32) / jnp.maximum(m.lm_visible, 1)
    # obs rule fires after 3 keyframes (the reference's per-KF Fuse grows
    # observation counts faster than our single-KF fuse pass — one extra
    # grace keyframe compensates; rotation-heavy segments starve otherwise)
    old_enough = (current_kf - m.lm_first_kf) >= 3
    kill = m.lm_valid & (
        (ratio < 0.25) | (old_enough & (m.lm_n_obs <= 2))
    )
    # grace period: very young landmarks are kept regardless
    young = (current_kf - m.lm_first_kf) < 2
    kill &= ~young
    return mapstate.remove_landmarks(m, kill)


@jax.jit
def keyframe_redundancy(m: mapstate.MapState) -> jax.Array:
    """[K] fraction of each KF's landmarks that are observed by >=4 KFs
    (the redundancy measure behind KeyFrameCulling's 90% rule)."""
    lm = jnp.clip(m.kf_feat_lm, 0, m.L - 1)
    linked = (m.kf_feat_lm != mapstate.NO_LM) & m.kf_feat_valid
    linked &= m.lm_valid[lm]
    redundant = linked & (m.lm_n_obs[lm] >= 4)
    n_link = jnp.maximum(jnp.sum(linked, axis=1), 1)
    return jnp.sum(redundant, axis=1) / n_link


def cull_keyframes(
    m: mapstate.MapState,
    protect: jax.Array,     # [K] bool (current KF, its neighbors, KF 0)
    thresh: float = 0.9,
) -> tuple[mapstate.MapState, jax.Array]:
    """Invalidate the most redundant keyframe (at most one per call).

    The reference culls one KF per mapping iteration and re-evaluates —
    killing all simultaneously-redundant KFs in one pass would ignore that
    each removal lowers the redundancy of the others.

    Returns ``(map', killed)`` where ``killed`` is the culled slot id as a
    device scalar (-1 when nothing crossed the threshold) so callers can
    mirror host state without a blocking fetch."""
    red = keyframe_redundancy(m)
    cand = m.kf_valid & (red > thresh) & ~protect
    red_m = jnp.where(cand, red, -1.0)
    best = jnp.argmax(red_m)
    hit = red_m[best] > 0
    kill = jnp.zeros(m.K, bool).at[best].set(hit)
    killed = jnp.where(hit, best, -1).astype(jnp.int32)
    return remove_keyframes(m, kill), killed


@jax.jit
def remove_keyframes(m: mapstate.MapState, kill: jax.Array) -> mapstate.MapState:
    kf_valid = m.kf_valid & ~kill
    # scrub observation slots referring to killed KFs
    obs_kf = m.lm_obs_kf
    obs_bad = (obs_kf != mapstate.NO_KF) & kill[jnp.clip(obs_kf, 0, m.K - 1)]
    new_obs_kf = jnp.where(obs_bad, mapstate.NO_KF, obs_kf)
    n_obs = jnp.sum(new_obs_kf != mapstate.NO_KF, axis=1).astype(jnp.int32)
    return m._replace(
        kf_valid=kf_valid, lm_obs_kf=new_obs_kf, lm_n_obs=n_obs,
    )


@jax.jit
def fuse_duplicates(
    m: mapstate.MapState,
    radius: jax.Array = 0.25,       # 3D merge distance [m]
    max_hamming: int = 50,
) -> mapstate.MapState:
    """Merge landmark duplicates: for each landmark, find the OLDEST valid
    landmark within ``radius`` whose descriptor matches; younger instances
    die and their keyframe feature links redirect to the survivor.

    O(L^2) masked distance matrix — fine for local maps (L <= 32k uses 4GB
    at f32 pairwise? no: computed in int16-free form below as chunks is
    unnecessary at L<=32k only if memory allows; callers with big pools
    should pass a restricted active mask).
    """
    L = m.L
    d2 = jnp.sum(
        (m.lm_pos[:, None, :] - m.lm_pos[None, :, :]) ** 2, axis=-1
    )
    close = d2 < radius * radius
    both = m.lm_valid[:, None] & m.lm_valid[None, :]
    ham = matching.hamming_matrix(m.lm_desc, m.lm_desc)
    same = close & both & (ham <= max_hamming)
    # candidate survivors must be strictly older. With slot recycling the id
    # no longer encodes age — use birth keyframe, id as tie-break.
    ids = jnp.arange(L)
    age = m.lm_first_kf
    older = (age[None, :] < age[:, None]) | (
        (age[None, :] == age[:, None]) & (ids[None, :] < ids[:, None])
    )
    cand = same & older
    # survivor = the first matching older landmark (chains a->b->c resolve
    # over successive calls)
    first = jnp.argmax(cand, axis=1)          # first True (0 if none)
    has = jnp.any(cand, axis=1)
    target = jnp.where(has, first, ids)

    # redirect keyframe feature links
    linked = m.kf_feat_lm != mapstate.NO_LM
    lm_c = jnp.clip(m.kf_feat_lm, 0, L - 1)
    new_links = jnp.where(linked, target[lm_c], m.kf_feat_lm)
    # if two features of one KF now point at the same lm, conflicts are
    # tolerated (BA reads observations from the lm side; obs of dead lms
    # are dropped below)
    dead = has
    lm_valid = m.lm_valid & ~dead
    # merge counters into survivors
    found = m.lm_found.at[target].add(jnp.where(dead, m.lm_found, 0))
    visible = m.lm_visible.at[target].add(jnp.where(dead, m.lm_visible, 0))
    return m._replace(
        kf_feat_lm=new_links.astype(jnp.int32),
        lm_valid=lm_valid,
        lm_found=found,
        lm_visible=visible,
        n_lm=jnp.sum(lm_valid).astype(jnp.int32),
    )


@jax.jit
def fuse_into_keyframe(
    m: mapstate.MapState,
    kf_id: jax.Array,
    cam: cam_mod.Pinhole,
    scale_factors: jax.Array,
) -> mapstate.MapState:
    """SearchInNeighbors' Fuse (LocalMapping.cc:728, ORBmatcher::Fuse),
    keyframe-centric: project every valid landmark into ``kf_id``, match
    against its features, then

    - feature already linked to a DIFFERENT landmark -> the two landmarks
      are the same physical point: merge the younger into the older
      (MapPoint::Replace), redirecting all keyframe links;
    - feature unlinked -> extend the landmark with a new observation
      (the half of Fuse that grows observation counts, which in turn feeds
      MapPointCulling's n_obs rule).

    O(L x F) masked Hamming — the same shape as the per-frame tracker, so
    bounded regardless of pool size (the naive pairwise fuse is O(L^2))."""
    kfc = jnp.clip(kf_id, 0, m.K - 1)
    T = m.kf_T_cw[kfc]
    Xc = lie.se3_apply(T, m.lm_pos)
    uv = cam_mod.project(cam, Xc)
    depth_ok = Xc[:, 2] > 0.1
    in_img = cam_mod.in_image(cam, uv)
    dist = jnp.linalg.norm(Xc, axis=-1)
    dist_ok = (dist >= 0.5 * m.lm_dist[:, 0]) & (
        dist <= 1.5 * jnp.maximum(m.lm_dist[:, 1], 1e-3)
    )
    cand = m.lm_valid & depth_ok & in_img & dist_ok
    ratio = jnp.maximum(m.lm_dist[:, 1], 1e-3) / jnp.maximum(dist, 1e-3)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1.0)) / jnp.log(scale_factors[1])),
        0, scale_factors.shape[0] - 1,
    ).astype(jnp.int32)
    rad = 3.0 * scale_factors[pred_level]
    kp_idx, dist_h, matched = matching.search_by_projection(
        uv, pred_level, m.lm_desc, cand,
        m.kf_xy[kfc], m.kf_level[kfc], m.kf_desc[kfc], m.kf_feat_valid[kfc],
        rad, max_dist=matching.TH_LOW, ratio=1.0,
    )
    matched = matching.resolve_duplicates(kp_idx, dist_h, matched, m.F)

    L = m.L
    ids = jnp.arange(L)
    cur = m.kf_feat_lm[kfc][jnp.clip(kp_idx, 0, m.F - 1)]   # [L]
    cur_c = jnp.clip(cur, 0, L - 1)
    conflict = matched & (cur != mapstate.NO_LM) & (cur_c != ids) & m.lm_valid[cur_c]
    # older wins (birth keyframe; id tie-break)
    self_older = (m.lm_first_kf < m.lm_first_kf[cur_c]) | (
        (m.lm_first_kf == m.lm_first_kf[cur_c]) & (ids < cur_c)
    )
    dead = jnp.where(self_older, cur_c, ids)
    surv = jnp.where(self_older, ids, cur_c)
    target = ids.at[jnp.where(conflict, dead, L)].set(
        jnp.where(conflict, surv, 0), mode="drop"
    )
    dead_mask = jnp.zeros(L, bool).at[jnp.where(conflict, dead, L)].set(
        conflict, mode="drop"
    )
    # redirect every keyframe link of a dead landmark to its survivor
    linked = m.kf_feat_lm != mapstate.NO_LM
    lm_links = jnp.clip(m.kf_feat_lm, 0, L - 1)
    new_links = jnp.where(linked, target[lm_links], m.kf_feat_lm)
    # merge counters into survivors
    found = m.lm_found.at[target].add(jnp.where(dead_mask, m.lm_found, 0))
    visible = m.lm_visible.at[target].add(jnp.where(dead_mask, m.lm_visible, 0))
    lm_valid = m.lm_valid & ~dead_mask
    m = m._replace(
        kf_feat_lm=new_links.astype(jnp.int32),
        lm_valid=lm_valid,
        lm_found=found,
        lm_visible=visible,
        n_lm=jnp.sum(lm_valid).astype(jnp.int32),
    )
    # extend observations where the matched feature was unlinked
    extend = matched & (cur == mapstate.NO_LM) & lm_valid
    return mapstate.link_observations(m, kfc, kp_idx, ids, extend)
