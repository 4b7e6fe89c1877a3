"""Map array-pool semantics: KF/landmark insertion, observation tables,
covisibility, solver views."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.slam import mapstate


def make_map():
    return mapstate.create(max_kf=8, max_feats=16, max_lm=64, max_obs=4)


def add_kf(m, pose_x=0.0, feat_lm=None, t=0.0):
    F = m.F
    T = jnp.eye(4).at[0, 3].set(pose_x)
    if feat_lm is None:
        feat_lm = jnp.full((F,), mapstate.NO_LM, jnp.int32)
    return mapstate.add_keyframe(
        m, T, jnp.float32(t),
        jnp.zeros((F, 2)), jnp.zeros((F, 3)).at[:, 2].set(-1.0),
        jnp.zeros(F, jnp.int32), jnp.zeros(F),
        jnp.zeros((F, 8), jnp.uint32), jnp.ones(F, bool), feat_lm,
    )


def test_add_keyframe_and_landmarks():
    m = make_map()
    m, k0 = add_kf(m)
    assert int(m.n_kf) == 1 and bool(m.kf_valid[0])
    # promote 5 features to landmarks
    B = m.F
    valid = jnp.zeros(B, bool).at[:5].set(True)
    m, ids = mapstate.add_landmarks(
        m, k0, jnp.arange(B, dtype=jnp.int32),
        jnp.ones((B, 3)), jnp.zeros((B, 8), jnp.uint32),
        jnp.zeros((B, 3)), jnp.ones((B, 2)), valid,
    )
    assert int(m.n_lm) == 5
    ids = np.asarray(ids)
    assert (ids[:5] >= 0).all() and (ids[5:] == mapstate.NO_LM).all()
    # feature links and observation tables
    assert np.asarray(m.kf_feat_lm[0])[:5].tolist() == ids[:5].tolist()
    assert np.asarray(m.lm_obs_kf)[ids[:5], 0].tolist() == [0] * 5
    assert np.asarray(m.lm_n_obs)[ids[:5]].tolist() == [1] * 5


def test_observation_registration_on_insert():
    m = make_map()
    m, k0 = add_kf(m)
    valid = jnp.zeros(m.F, bool).at[:6].set(True)
    m, ids = mapstate.add_landmarks(
        m, k0, jnp.arange(m.F, dtype=jnp.int32),
        jnp.ones((m.F, 3)), jnp.zeros((m.F, 8), jnp.uint32),
        jnp.zeros((m.F, 3)), jnp.ones((m.F, 2)), valid,
    )
    # second KF observes landmarks 0..3 at features 2..5
    feat_lm = jnp.full((m.F,), mapstate.NO_LM, jnp.int32)
    feat_lm = feat_lm.at[2:6].set(jnp.asarray(np.asarray(ids)[:4]))
    m, k1 = add_kf(m, pose_x=1.0, feat_lm=feat_lm, t=1.0)
    ids_np = np.asarray(ids)
    assert np.asarray(m.lm_n_obs)[ids_np[:4]].tolist() == [2] * 4
    assert np.asarray(m.lm_obs_kf)[ids_np[0]].tolist()[:2] == [0, 1]
    assert np.asarray(m.lm_obs_feat)[ids_np[0], 1] == 2


def test_covisibility_weights():
    m = make_map()
    m, k0 = add_kf(m)
    valid = jnp.zeros(m.F, bool).at[:8].set(True)
    m, ids = mapstate.add_landmarks(
        m, k0, jnp.arange(m.F, dtype=jnp.int32),
        jnp.ones((m.F, 3)), jnp.zeros((m.F, 8), jnp.uint32),
        jnp.zeros((m.F, 3)), jnp.ones((m.F, 2)), valid,
    )
    ids_np = np.asarray(ids)
    # KF1 shares 6, KF2 shares 2
    f1 = jnp.full((m.F,), mapstate.NO_LM, jnp.int32).at[:6].set(jnp.asarray(ids_np[:6]))
    m, k1 = add_kf(m, 1.0, f1, 1.0)
    f2 = jnp.full((m.F,), mapstate.NO_LM, jnp.int32).at[:2].set(jnp.asarray(ids_np[:2]))
    m, k2 = add_kf(m, 2.0, f2, 2.0)
    w = np.asarray(mapstate.covisibility_weights(m, jnp.int32(0)))
    assert w[1] == 6 and w[2] == 2 and w[0] == 0
    top, vals = mapstate.top_covisible(m, jnp.int32(0), 2, min_weight=3)
    assert np.asarray(top)[0] == 1
    assert np.asarray(top)[1] == mapstate.NO_KF  # weight 2 < min 3


def test_landmark_major_obs_window():
    m = make_map()
    m, k0 = add_kf(m)
    valid = jnp.zeros(m.F, bool).at[:4].set(True)
    m, ids = mapstate.add_landmarks(
        m, k0, jnp.arange(m.F, dtype=jnp.int32),
        jnp.ones((m.F, 3)), jnp.zeros((m.F, 8), jnp.uint32),
        jnp.zeros((m.F, 3)), jnp.ones((m.F, 2)), valid,
    )
    ids_np = np.asarray(ids)
    f1 = jnp.full((m.F,), mapstate.NO_LM, jnp.int32).at[:4].set(jnp.asarray(ids_np[:4]))
    m, k1 = add_kf(m, 1.0, f1, 1.0)
    window = jnp.asarray([0, 1], jnp.int32)
    win_pos, uvr, inv_s2, stereo, ok = mapstate.landmark_major_obs(
        m, window, jnp.ones(8)
    )
    okn = np.asarray(ok)
    assert okn[ids_np[:4]].sum() == 8  # each of 4 lms seen in both KFs
    wp = np.asarray(win_pos)
    assert set(wp[ids_np[0]][okn[ids_np[0]]].tolist()) == {0, 1}


def test_remove_landmarks_clears_links():
    m = make_map()
    m, k0 = add_kf(m)
    valid = jnp.zeros(m.F, bool).at[:4].set(True)
    m, ids = mapstate.add_landmarks(
        m, k0, jnp.arange(m.F, dtype=jnp.int32),
        jnp.ones((m.F, 3)), jnp.zeros((m.F, 8), jnp.uint32),
        jnp.zeros((m.F, 3)), jnp.ones((m.F, 2)), valid,
    )
    ids_np = np.asarray(ids)
    kill = jnp.zeros(m.L, bool).at[ids_np[0]].set(True)
    m = mapstate.remove_landmarks(m, kill)
    assert not bool(m.lm_valid[ids_np[0]])
    assert int(m.kf_feat_lm[0, 0]) == mapstate.NO_LM
    assert int(m.kf_feat_lm[0, 1]) == ids_np[1]  # others untouched
