"""Map hygiene: landmark/keyframe culling + duplicate fusion."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.slam import culling, mapstate
from tests.test_mapstate import make_map, add_kf


def seeded_map(rng, n_lm=8):
    m = make_map()
    m, k0 = add_kf(m)
    valid = jnp.zeros(m.F, bool).at[:n_lm].set(True)
    m, ids = mapstate.add_landmarks(
        m, k0, jnp.arange(m.F, dtype=jnp.int32),
        jnp.asarray(rng.normal(0, 5, (m.F, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (m.F, 8), dtype=np.uint32)),
        jnp.zeros((m.F, 3)), jnp.ones((m.F, 2)), valid,
    )
    return m, np.asarray(ids)


def test_cull_landmarks_ratio(rng):
    m, ids = seeded_map(rng)
    # landmark 0: bad found/visible ratio; landmark 1: good
    m = m._replace(
        lm_found=m.lm_found.at[ids[0]].set(1),
        lm_visible=m.lm_visible.at[ids[0]].set(10),
        lm_n_obs=m.lm_n_obs.at[ids[:2]].set(5),
    )
    m2 = culling.cull_landmarks(m, jnp.int32(5))
    assert not bool(m2.lm_valid[ids[0]])
    assert bool(m2.lm_valid[ids[1]]) is False or True  # lm1 has 5 obs
    # lm1 kept (ratio 1.0, obs 5)
    assert bool(m2.lm_valid[ids[1]])


def test_cull_landmarks_grace_period(rng):
    m, ids = seeded_map(rng)
    m = m._replace(lm_first_kf=m.lm_first_kf.at[ids[0]].set(5))
    # current = 6 -> age 1 < 2: grace
    m2 = culling.cull_landmarks(m, jnp.int32(6))
    assert bool(m2.lm_valid[ids[0]])


def test_cull_keyframes_redundant(rng):
    m, ids = seeded_map(rng)
    # all of KF1's landmarks heavily observed -> redundant
    f1 = jnp.full((m.F,), mapstate.NO_LM, jnp.int32).at[:8].set(jnp.asarray(ids[:8]))
    m, k1 = add_kf(m, 1.0, f1, 1.0)
    f2 = jnp.full((m.F,), mapstate.NO_LM, jnp.int32).at[:8].set(jnp.asarray(ids[:8]))
    m, k2 = add_kf(m, 2.0, f2, 2.0)
    f3 = jnp.full((m.F,), mapstate.NO_LM, jnp.int32).at[:8].set(jnp.asarray(ids[:8]))
    m, k3 = add_kf(m, 3.0, f3, 3.0)
    # each lm now has 4 observations -> KF1 is fully redundant
    protect = jnp.zeros(m.K, bool).at[0].set(True).at[int(k3)].set(True)
    m2, kill_idx = culling.cull_keyframes(m, protect)
    # exactly one redundant KF culled per call (the reference re-evaluates
    # after each removal)
    killed = {k for k in (1, 2) if not bool(m2.kf_valid[k])}
    assert len(killed) == 1
    assert bool(m2.kf_valid[0]) and bool(m2.kf_valid[int(k3)])
    kdead = killed.pop()
    assert int(kill_idx) == kdead
    assert not np.any(np.asarray(m2.lm_obs_kf) == kdead)
    assert int(m2.lm_n_obs[ids[0]]) == 3


def test_fuse_duplicates(rng):
    m, ids = seeded_map(rng)
    # create a younger duplicate of landmark 0: same position + descriptor
    dup_desc = m.lm_desc[ids[0]]
    pos0 = m.lm_pos[ids[0]]
    f1 = jnp.full((m.F,), mapstate.NO_LM, jnp.int32)
    m, k1 = add_kf(m, 1.0, f1, 1.0)
    valid = jnp.zeros(m.F, bool).at[0].set(True)
    m, dup_ids = mapstate.add_landmarks(
        m, k1, jnp.arange(m.F, dtype=jnp.int32),
        jnp.tile(pos0 + 0.05, (m.F, 1)),
        jnp.tile(dup_desc, (m.F, 1)),
        jnp.zeros((m.F, 3)), jnp.ones((m.F, 2)), valid,
    )
    dup = int(np.asarray(dup_ids)[0])
    assert bool(m.lm_valid[dup])
    m2 = culling.fuse_duplicates(m)
    assert not bool(m2.lm_valid[dup])         # younger dies
    assert bool(m2.lm_valid[ids[0]])          # older survives
    # KF1's feature link redirected to the survivor
    assert int(m2.kf_feat_lm[int(k1), 0]) == ids[0]
