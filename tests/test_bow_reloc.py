"""BoW vocabulary, place-recognition scoring, PnP RANSAC, relocalization."""

import numpy as np
import jax
import jax.numpy as jnp

from tc2li_slam_tpu.geom import camera, lie
from tc2li_slam_tpu.ops import bow, orb
from tc2li_slam_tpu.solver import pnp

CAM = camera.Pinhole.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0)


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def test_vocabulary_train_and_quantize(rng):
    descs = rand_desc(rng, 2000)
    voc = bow.train_vocabulary(descs, k=4, depth=3, seed=0)
    assert voc.n_words > 16
    words, weights = bow.quantize(
        voc, jnp.asarray(descs[:256]), jnp.ones(256, bool), voc.depth
    )
    w = np.asarray(words)
    assert (w >= 0).all() and (w < voc.n_words).all()
    # same descriptor -> same word, deterministic
    words2, _ = bow.quantize(
        voc, jnp.asarray(descs[:256]), jnp.ones(256, bool), voc.depth
    )
    np.testing.assert_array_equal(w, np.asarray(words2))
    # invalid -> -1
    words3, _ = bow.quantize(
        voc, jnp.asarray(descs[:4]), jnp.zeros(4, bool), voc.depth
    )
    assert (np.asarray(words3) == -1).all()


def test_quantize_nearest_structure(rng):
    """A descriptor equal to a leaf's centroid quantizes into a word whose
    path is consistent (just sanity: perturbing few bits keeps the word)."""
    descs = rand_desc(rng, 1000)
    voc = bow.train_vocabulary(descs, k=4, depth=3, seed=1)
    d0 = descs[:64]
    w0 = np.asarray(bow.quantize(voc, jnp.asarray(d0), jnp.ones(64, bool), voc.depth)[0])
    d1 = d0 ^ np.uint32(1)  # flip one bit
    w1 = np.asarray(bow.quantize(voc, jnp.asarray(d1), jnp.ones(64, bool), voc.depth)[0])
    assert (w0 == w1).mean() > 0.7


def test_shared_word_scores(rng):
    descs = rand_desc(rng, 3000)
    voc = bow.train_vocabulary(descs, k=4, depth=3, seed=0)
    F = 128
    frameA = descs[:F]
    frameB = np.concatenate([descs[:F // 2], rand_desc(rng, F // 2)])  # half shared
    frameC = rand_desc(rng, F)

    def words(d):
        w, wt = bow.quantize(voc, jnp.asarray(d), jnp.ones(F, bool), voc.depth)
        return jnp.sort(w), wt

    wA, wtA = words(frameA)
    kf_words = jnp.stack([words(frameA)[0], words(frameB)[0], words(frameC)[0]])
    counts, scores = bow.shared_word_scores(
        wA, wtA, kf_words, jnp.ones(3, bool)
    )
    c = np.asarray(counts)
    assert c[0] >= c[1] >= 20
    assert c[0] > c[2]
    cand, vals = bow.reloc_candidates(counts, scores, 2)
    assert int(np.asarray(cand)[0]) == 0


def test_pnp_ransac_with_outliers(rng):
    N = 120
    X = np.stack([rng.uniform(-10, 10, N), rng.uniform(-6, 6, N),
                  rng.uniform(5, 30, N)], -1).astype(np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(
        rng.uniform(-0.3, 0.3, 6).astype(np.float32))))
    Xc = (T_gt[:3, :3] @ X.T).T + T_gt[:3, 3]
    uv = np.array(camera.project(CAM, jnp.asarray(Xc)))
    uv += rng.normal(0, 0.5, uv.shape)
    uv[:30] += rng.uniform(30, 120, (30, 2))  # 25% outliers
    res = pnp.pnp_ransac(
        CAM, jnp.asarray(X), jnp.asarray(uv, jnp.float32), jnp.ones(N, bool),
        jax.random.PRNGKey(0), n_hyp=128,
    )
    assert bool(res.ok)
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_gt)) @ res.T_cw))
    assert np.abs(err).max() < 1e-2, f"pnp err {err}"
    inl = np.asarray(res.inliers)
    assert inl[:30].mean() < 0.2 and inl[30:].mean() > 0.9


def test_pnp_fails_gracefully_on_garbage(rng):
    N = 50
    X = rng.normal(0, 10, (N, 3)).astype(np.float32)
    uv = rng.uniform(0, 640, (N, 2)).astype(np.float32)
    res = pnp.pnp_ransac(
        CAM, jnp.asarray(X), jnp.asarray(uv), jnp.ones(N, bool),
        jax.random.PRNGKey(1), n_hyp=64,
    )
    assert np.isfinite(np.asarray(res.T_cw)).all()


def test_orbvoc_txt_roundtrip(tmp_path, rng):
    """Write a tiny vocabulary in ORBvoc.txt format and load it."""
    k, L = 2, 2
    lines = [f"{k} {L} 0 0"]
    # 2 root children (internal), each with 2 leaf children
    descs = rand_desc(rng, 6)
    parent_of = [0, 0, 1, 1, 2, 2]
    is_leaf = [0, 0, 1, 1, 1, 1]
    for i in range(6):
        d = descs[i].view(np.uint8)
        lines.append(
            f"{parent_of[i]} {is_leaf[i]} " + " ".join(str(b) for b in d)
            + " 0.5"
        )
    path = tmp_path / "voc.txt"
    path.write_text("\n".join(lines) + "\n")
    voc = bow.load_orbvoc_txt(str(path))
    assert voc.n_words == 4
    assert voc.k == 2 and voc.depth == 2
    # quantization runs and lands on a leaf word
    w, _ = bow.quantize(voc, jnp.asarray(descs[2:3]), jnp.ones(1, bool), voc.depth)
    assert 0 <= int(w[0]) < 4
