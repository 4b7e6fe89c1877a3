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

from ..ops import matching
from . import mapstate


@jax.jit
def cull_landmarks(m: mapstate.MapState, current_kf: jax.Array) -> mapstate.MapState:
    """MapPointCulling: found/visible < 0.25, or <=2 observations once the
    map has moved >=2 keyframes past the landmark's birth."""
    ratio = m.lm_found.astype(jnp.float32) / jnp.maximum(m.lm_visible, 1)
    old_enough = (current_kf - m.lm_first_kf) >= 2
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
) -> mapstate.MapState:
    """Invalidate the most redundant keyframe (at most one per call).

    The reference culls one KF per mapping iteration and re-evaluates —
    killing all simultaneously-redundant KFs in one pass would ignore that
    each removal lowers the redundancy of the others."""
    red = keyframe_redundancy(m)
    cand = m.kf_valid & (red > thresh) & ~protect
    red_m = jnp.where(cand, red, -1.0)
    best = jnp.argmax(red_m)
    kill = jnp.zeros(m.K, bool).at[best].set(red_m[best] > 0)
    return _remove_keyframes(m, kill)


@jax.jit
def _remove_keyframes(m: mapstate.MapState, kill: jax.Array) -> mapstate.MapState:
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
    # candidate survivors must be strictly older (smaller id)
    ids = jnp.arange(L)
    older = ids[None, :] < ids[:, None]
    cand = same & older
    # survivor = the smallest-id matching older landmark
    first = jnp.argmax(cand, axis=1)          # first True (0 if none)
    has = jnp.any(cand, axis=1)
    target = jnp.where(has, first, ids)
    # path-compress one step (chains a->b->c resolve next call)
    target = jnp.where(has, jnp.where(target < ids, target, ids), ids)

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
    )
