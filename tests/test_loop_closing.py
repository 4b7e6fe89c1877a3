"""Loop closing on a hand-built drifted map: verification + correction."""

import numpy as np
import jax
import jax.numpy as jnp

from tc2li_slam_tpu.geom import lie
from tc2li_slam_tpu.slam import loop_closing, mapstate


def build_loop_map(rng, K=10, L=180, drift=0.05):
    """KF chain where the last KF revisits the first's area; landmarks of the
    first KF are re-observed by the last under pose drift."""
    m = mapstate.create(max_kf=16, max_feats=64, max_lm=256, max_obs=6)

    # ground-truth poses on a loop (world->cam)
    T_gt = [np.eye(4, dtype=np.float32)]
    for i in range(K - 1):
        dT = np.asarray(lie.se3_exp(jnp.asarray(
            [0.8, 0, 0, 0, 0, 2 * np.pi / K], dtype=jnp.float32)))
        T_gt.append((dT @ T_gt[-1]).astype(np.float32))
    # drifted estimates (accumulating)
    T_est = [T_gt[0]]
    for i in range(K - 1):
        rel = T_gt[i + 1] @ np.linalg.inv(T_gt[i])
        noise = np.asarray(lie.se3_exp(jnp.asarray(
            (rng.normal(0, drift, 6) * [1, 1, 1, 0.3, 0.3, 0.3]).astype(np.float32))))
        T_est.append((noise @ rel @ T_est[-1]).astype(np.float32))

    # landmarks around the origin, seen by KF0 (and by KF K-1 at revisit)
    X = rng.uniform(-5, 5, (L, 3)).astype(np.float32) + [0, 0, 8]
    descs = rng.integers(0, 2**32, (L, 8), dtype=np.uint32)

    F = 64
    for k in range(K):
        feat_lm = np.full(F, mapstate.NO_LM, np.int32)
        desc = rng.integers(0, 2**32, (F, 8), dtype=np.uint32)
        if k in (0, K - 1):
            desc[:48] = descs[:48]
        m, _ = mapstate.add_keyframe(
            m, jnp.asarray(T_est[k]), jnp.float32(k),
            jnp.zeros((F, 2)), jnp.zeros((F, 3)).at[:, 2].set(-1.0),
            jnp.zeros(F, jnp.int32), jnp.zeros(F),
            jnp.asarray(desc), jnp.ones(F, bool), jnp.asarray(feat_lm),
        )
        valid = jnp.zeros(m.F, bool).at[:48].set(True)
        if k == 0:
            # original landmark instances (exact world positions)
            m, _ = mapstate.add_landmarks(
                m, jnp.int32(0), jnp.arange(m.F, dtype=jnp.int32),
                jnp.asarray(X[:m.F]),
                jnp.asarray(descs[:m.F]), jnp.zeros((m.F, 3)),
                jnp.ones((m.F, 2)), valid,
            )
        elif k == K - 1:
            # the revisit creates DUPLICATE instances: same physical points,
            # same descriptors, but positions consistent with the drifted
            # pose of KF K-1 (its local reconstruction is metrically
            # correct relative to itself: cam coords = T_gt[K-1] X)
            X_dup = (np.linalg.inv(T_est[k]) @ np.hstack([
                (T_gt[k][:3, :3] @ X[:m.F].T).T + T_gt[k][:3, 3],
                np.ones((m.F, 1), np.float32)]).T).T[:, :3].astype(np.float32)
            m, _ = mapstate.add_landmarks(
                m, jnp.int32(k), jnp.arange(m.F, dtype=jnp.int32),
                jnp.asarray(X_dup),
                jnp.asarray(descs[:m.F]), jnp.zeros((m.F, 3)),
                jnp.ones((m.F, 2)), valid,
            )
    return m, np.stack(T_gt), np.stack(T_est)


def test_verify_and_close_loop(rng):
    m, T_gt, T_est = build_loop_map(rng)
    K = len(T_gt)

    ok, S, n_inl, _ = loop_closing.verify_candidate(
        m, K - 1, 0, jax.random.PRNGKey(0), with_scale=False, min_inliers=15,
    )
    assert ok, f"loop verification failed ({n_inl} inliers)"

    # S should map cand(KF0)-camera coords to cur(KF K-1)-camera coords:
    # ground truth relative = T_gt[K-1] @ inv(T_gt[0])
    rel_gt = T_gt[K - 1] @ np.linalg.inv(T_gt[0])
    err = np.asarray(lie.se3_log(jnp.asarray(
        np.linalg.inv(rel_gt) @ np.asarray(S), dtype=jnp.float32)))
    # drift between est and gt at the loop ends is what we expect S to expose
    assert np.abs(err).max() < 0.2

    m2 = loop_closing.close_loop(m, K - 1, 0, S, iters=12)
    # loop-edge consistency after correction
    T_new = np.asarray(m2.kf_T_cw)
    rel_new = T_new[K - 1] @ np.linalg.inv(T_new[0])
    e_after = np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(
        np.linalg.inv(np.asarray(S)) @ rel_new, dtype=jnp.float32))))
    rel_before = T_est[K - 1] @ np.linalg.inv(T_est[0])
    e_before = np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(
        np.linalg.inv(np.asarray(S)) @ rel_before, dtype=jnp.float32))))
    assert e_after < 0.3 * e_before + 1e-3, f"{e_before:.4f} -> {e_after:.4f}"
    # landmarks moved with their reference keyframes (finite, valid)
    assert np.isfinite(np.asarray(m2.lm_pos)).all()


def test_detect_candidates_excludes_recent(rng):
    m, T_gt, T_est = build_loop_map(rng)
    K = len(T_gt)
    F = m.F
    # fake word lists: KF0 and KF K-1 share words; others random
    kf_words = np.full((m.K, F), -1, np.int32)
    shared = np.sort(rng.integers(0, 1000, F))
    for k in range(K):
        if k in (0, K - 1):
            kf_words[k] = shared
        else:
            kf_words[k] = np.sort(rng.integers(0, 1000, F))
    cands = loop_closing.detect_candidates(
        m, K - 1, jnp.asarray(kf_words), min_gap=3, n_best=3
    )
    assert 0 in cands
    assert all(abs(c - (K - 1)) >= 3 for c in cands)
