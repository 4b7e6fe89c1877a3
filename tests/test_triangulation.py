"""Unit tests: epipolar triangulation, landmark-slot recycling, projection
Fuse (CreateNewMapPoints / MapPoint slot churn / SearchInNeighbors parity)."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.geom import camera as cam_mod
from tc2li_slam_tpu.slam import culling, mapstate, triangulation

FX = FY = 450.0
CX, CY = 320.0, 240.0
BF = 45.0  # baseline 0.1 m


def make_cam():
    return cam_mod.Pinhole.create(FX, FY, CX, CY, bf=BF)


def project_np(T, X):
    Xc = (T[:3, :3] @ X.T).T + T[:3, 3]
    return np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX,
                     FY * Xc[:, 1] / Xc[:, 2] + CY], -1), Xc[:, 2]


def two_view_map(rng, n_pts=64, baseline=1.0, noise=0.0, F=96):
    """Map with two KFs observing far points (beyond stereo), unmatched."""
    X = np.stack([
        rng.uniform(-15, 15, n_pts),
        rng.uniform(-8, 8, n_pts),
        rng.uniform(25, 45, n_pts),
    ], -1)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[0, 3] = -baseline  # camera moved +x in world
    m = mapstate.create(max_kf=8, max_feats=F, max_lm=256, max_obs=8)
    descs = rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)
    kf_data = []
    for T in (T1, T2):
        uv, z = project_np(T, X)
        uv = uv + noise * rng.standard_normal(uv.shape)
        xy = np.zeros((F, 2), np.float32)
        xy[:n_pts] = uv
        uvr = np.concatenate([xy, np.full((F, 1), -1.0, np.float32)], -1)
        desc = np.zeros((F, 8), np.uint32)
        desc[:n_pts] = descs
        valid = np.arange(F) < n_pts
        kf_data.append((T, xy, uvr, desc, valid))
    for k, (T, xy, uvr, desc, valid) in enumerate(kf_data):
        m, _ = mapstate.add_keyframe(
            m, jnp.asarray(T), jnp.float32(k), jnp.asarray(xy),
            jnp.asarray(uvr), jnp.zeros(F, jnp.int32), jnp.zeros(F),
            jnp.asarray(desc), jnp.asarray(valid),
            jnp.full((F,), mapstate.NO_LM, jnp.int32),
        )
    return m, X, n_pts


def test_triangulate_pair_recovers_far_points(rng):
    m, X, n = two_view_map(rng, baseline=1.5)
    cam = make_cam()
    sigma2 = jnp.ones(8)
    sf = jnp.asarray(1.2 ** np.arange(8), jnp.float32)
    m2 = triangulation.triangulate_pair(
        m, jnp.int32(1), jnp.int32(0), jnp.bool_(True), cam, sigma2, sf
    )
    n_new = int(m2.n_lm)
    assert n_new > 0.8 * n, f"only {n_new}/{n} triangulated"
    pos = np.asarray(m2.lm_pos)[np.asarray(m2.lm_valid)]
    # match each landmark to its source point by nearest neighbor
    d = np.linalg.norm(pos[:, None, :] - X[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 0.05, f"median triangulation error {np.median(d):.3f}"
    # both views observe the new landmarks
    nobs = np.asarray(m2.lm_n_obs)[np.asarray(m2.lm_valid)]
    assert (nobs == 2).all()
    # and both KFs' feature links are set
    assert int(jnp.sum(m2.kf_feat_lm[0] != mapstate.NO_LM)) == n_new
    assert int(jnp.sum(m2.kf_feat_lm[1] != mapstate.NO_LM)) == n_new


def test_triangulate_zero_baseline_rejected(rng):
    """Inter-KF baseline below the stereo rig baseline must not triangulate
    (LocalMapping.cc:435-447)."""
    m, X, n = two_view_map(rng, baseline=0.05)  # rig baseline is 0.1 m
    cam = make_cam()
    m2 = triangulation.triangulate_pair(
        m, jnp.int32(1), jnp.int32(0), jnp.bool_(True), cam,
        jnp.ones(8), jnp.asarray(1.2 ** np.arange(8), jnp.float32)
    )
    assert int(m2.n_lm) == 0


def test_landmark_slot_recycling(rng):
    """Slots freed by remove_landmarks are handed out again; the pool
    survives churn past its capacity."""
    F = 16
    m = mapstate.create(max_kf=4, max_feats=F, max_lm=32, max_obs=4)
    m, _ = mapstate.add_keyframe(
        m, jnp.eye(4), jnp.float32(0.0), jnp.zeros((F, 2)),
        jnp.zeros((F, 3)), jnp.zeros(F, jnp.int32), jnp.zeros(F),
        jnp.zeros((F, 8), jnp.uint32), jnp.ones(F, bool),
        jnp.full((F,), mapstate.NO_LM, jnp.int32),
    )
    args = lambda: (
        jnp.int32(0), jnp.arange(F, dtype=jnp.int32),
        jnp.asarray(rng.standard_normal((F, 3)), jnp.float32),
        jnp.zeros((F, 8), jnp.uint32), jnp.zeros((F, 3)),
        jnp.tile(jnp.asarray([1.0, 10.0]), (F, 1)), jnp.ones(F, bool),
    )
    for _ in range(5):  # 5 x 16 = 80 > 32 capacity; recycling keeps it alive
        m, ids = mapstate.add_landmarks(m, *args())
        n_before = int(m.n_lm)
        assert n_before <= 32
        # kill half
        kill = jnp.zeros(32, bool).at[jnp.asarray(np.arange(0, 32, 2))].set(True)
        m = mapstate.remove_landmarks(m, kill & m.lm_valid)
        assert int(m.n_lm) == int(jnp.sum(m.lm_valid))
    # allocation after churn reuses freed slots (ids within capacity)
    m, ids = mapstate.add_landmarks(m, *args())
    ids = np.asarray(ids)
    assert (ids[ids >= 0] < 32).all()
    assert int(m.n_lm) == int(jnp.sum(m.lm_valid))


def test_fuse_into_keyframe_merges_and_extends(rng):
    """Projection Fuse: a younger duplicate merges into the older landmark;
    an unlinked feature matching a landmark gains an observation."""
    cam = make_cam()
    F = 32
    m = mapstate.create(max_kf=4, max_feats=F, max_lm=64, max_obs=4)
    X = np.stack([
        rng.uniform(-5, 5, 8), rng.uniform(-3, 3, 8), rng.uniform(8, 14, 8)
    ], -1).astype(np.float32)
    descs = rng.integers(0, 2**32, (8, 8), dtype=np.uint32)
    T = np.eye(4, dtype=np.float32)
    uv, z = project_np(T, X)
    xy = np.zeros((F, 2), np.float32); xy[:8] = uv
    uvr = np.concatenate([xy, np.full((F, 1), -1.0, np.float32)], -1)
    desc = np.zeros((F, 8), np.uint32); desc[:8] = descs
    valid = np.arange(F) < 8
    m, _ = mapstate.add_keyframe(
        m, jnp.asarray(T), jnp.float32(0.0), jnp.asarray(xy),
        jnp.asarray(uvr), jnp.zeros(F, jnp.int32), jnp.zeros(F),
        jnp.asarray(desc), jnp.asarray(valid),
        jnp.full((F,), mapstate.NO_LM, jnp.int32),
    )
    # max distance == current distance -> predicted octave 0, matching the
    # level-0 keypoints (PredictScale semantics)
    dist_rng = np.stack([0.5 * z[:8], 1.0 * z[:8]], -1)
    # old landmarks for features 0..3 (born at KF 0, linked)
    want_old = np.zeros(F, bool); want_old[:4] = True
    pos_all = np.zeros((F, 3), np.float32); pos_all[:8] = X
    desc_all = np.zeros((F, 8), np.uint32); desc_all[:8] = descs
    dr_all = np.ones((F, 2), np.float32); dr_all[:8] = dist_rng
    m, old_ids = mapstate.add_landmarks(
        m, jnp.int32(0), jnp.arange(F, dtype=jnp.int32),
        jnp.asarray(pos_all), jnp.asarray(desc_all),
        jnp.zeros((F, 3)), jnp.asarray(dr_all), jnp.asarray(want_old),
    )
    # younger duplicates of features 0..1 NOT linked to the KF (simulating a
    # second instance created elsewhere), born at "KF 1"
    m = m._replace(n_kf=jnp.int32(2))
    want_dup = np.zeros(F, bool); want_dup[:2] = True
    m_dup, dup_ids = mapstate.add_landmarks(
        m, jnp.int32(1), jnp.arange(F, dtype=jnp.int32),
        jnp.asarray(pos_all + 0.02), jnp.asarray(desc_all),
        jnp.zeros((F, 3)), jnp.asarray(dr_all), jnp.asarray(want_dup),
    )
    # unlink the duplicates from KF "1" (they live only in the pool; KF 1 is
    # not a real keyframe here)
    m = m_dup._replace(kf_feat_lm=m.kf_feat_lm)
    # link the duplicates into KF 0's features 0..1 instead of the old ones,
    # creating the conflict Fuse resolves
    dup_np = np.asarray(dup_ids)
    links = np.array(m.kf_feat_lm)  # writable host copy
    links[0, 0] = dup_np[0]
    links[0, 1] = dup_np[1]
    m = m._replace(kf_feat_lm=jnp.asarray(links))

    sf = jnp.asarray(1.2 ** np.arange(8), jnp.float32)
    m2 = culling.fuse_into_keyframe(m, jnp.int32(0), cam, sf)

    old_np = np.asarray(old_ids)
    valid2 = np.asarray(m2.lm_valid)
    links2 = np.asarray(m2.kf_feat_lm)
    # the younger duplicates died, links point at the older instances
    assert not valid2[dup_np[0]] and not valid2[dup_np[1]]
    assert links2[0, 0] == old_np[0] and links2[0, 1] == old_np[1]
    # features 4..7 had no landmark; the pool has none matching them here,
    # but old landmarks 2..3 still linked stay linked
    assert links2[0, 2] == old_np[2]
    assert int(m2.n_lm) == int(jnp.sum(m2.lm_valid))
