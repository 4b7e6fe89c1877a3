"""ORB extraction vs OpenCV goldens: descriptor bit-parity on shared
keypoints, orientation agreement, detection repeatability."""

import numpy as np
import cv2
import jax.numpy as jnp

from tc2li_slam_tpu.ops import orb


def make_test_image(rng, h=480, w=640):
    """Synthetic textured scene: gradient + random rectangles + circles."""
    img = np.tile(np.linspace(40, 200, w, dtype=np.float32), (h, 1))
    for _ in range(60):
        x, y = rng.integers(0, w - 40), rng.integers(0, h - 40)
        ww, hh = rng.integers(10, 40, 2)
        img[y : y + hh, x : x + ww] = rng.integers(0, 255)
    for _ in range(30):
        x, y, r = rng.integers(30, w - 30), rng.integers(30, h - 30), rng.integers(5, 15)
        cv2.circle(img, (int(x), int(y)), int(r), int(rng.integers(0, 255)), -1)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img.astype(np.uint8)


def hamming(a, b):
    return np.unpackbits(np.bitwise_xor(a, b), axis=-1).sum(-1)


def test_descriptor_parity_with_cv2(rng):
    """Compute cv2 ORB keypoints/descriptors on level 0; our descriptor at the
    same (position, angle) must be near-identical (round-off on angle only)."""
    img = make_test_image(rng)
    det = cv2.ORB_create(nfeatures=300, nlevels=1, edgeThreshold=31, fastThreshold=20)
    kps = det.detect(img, None)
    kps, desc_cv = det.compute(img, kps)
    assert len(kps) > 100

    rows = jnp.asarray(np.array([round(k.pt[1]) for k in kps], np.int32))
    cols = jnp.asarray(np.array([round(k.pt[0]) for k in kps], np.int32))
    angles = jnp.asarray(np.array([np.deg2rad(k.angle) for k in kps], np.float32))

    blur = orb.gaussian_blur7(jnp.asarray(img))
    ours = orb.descriptors_to_bytes(orb.compute_descriptors(blur, rows, cols, angles))

    d = hamming(ours, desc_cv)
    # Identical sampling grid; differences only from fractional-center rounding
    # (cv2 samples at cvRound(pt) too) and blur fixed-point rounding.
    assert np.median(d) <= 8, f"median Hamming {np.median(d)}"
    assert (d <= 16).mean() > 0.8, f"close fraction {(d<=16).mean():.2f}"


def test_orientation_matches_cv2(rng):
    img = make_test_image(rng)
    det = cv2.ORB_create(nfeatures=300, nlevels=1, edgeThreshold=31, fastThreshold=20)
    kps = det.detect(img, None)
    kps, _ = det.compute(img, kps)
    rows = jnp.asarray(np.array([round(k.pt[1]) for k in kps], np.int32))
    cols = jnp.asarray(np.array([round(k.pt[0]) for k in kps], np.int32))
    ours = np.rad2deg(np.asarray(orb.compute_orientation(jnp.asarray(img), rows, cols))) % 360
    ref = np.array([k.angle for k in kps]) % 360
    diff = np.abs((ours - ref + 180) % 360 - 180)
    assert np.median(diff) < 2.0, f"median angle diff {np.median(diff):.2f} deg"


def test_fast_score_detects_cv2_corners(rng):
    img = make_test_image(rng)
    fast = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
    kps_cv = fast.detect(img, None)
    mask_cv = np.zeros(img.shape, bool)
    for k in kps_cv:
        mask_cv[int(round(k.pt[1])), int(round(k.pt[0]))] = True

    score = np.asarray(orb.fast_score(jnp.asarray(img), 20.0))
    ours = score > 0
    inner = np.zeros_like(mask_cv)
    inner[10:-10, 10:-10] = True
    both = mask_cv & inner
    agree = (ours & both).sum() / max(both.sum(), 1)
    assert agree > 0.95, f"only {agree:.2%} of cv2 FAST corners detected"


def test_extract_full_pipeline(rng):
    img = make_test_image(rng)
    kp = orb.extract(jnp.asarray(img), n_features=1000, n_levels=8)
    valid = np.asarray(kp.valid)
    assert valid.sum() > 500
    xy = np.asarray(kp.xy)[valid]
    assert xy[:, 0].max() <= img.shape[1] and xy[:, 1].max() <= img.shape[0]
    # multi-level coverage
    levels = np.asarray(kp.level)[valid]
    assert len(np.unique(levels)) >= 4
    # spatial spread: keypoints in all 4 quadrants
    h, w = img.shape
    q = [(xy[:, 0] < w / 2) & (xy[:, 1] < h / 2), (xy[:, 0] >= w / 2) & (xy[:, 1] < h / 2),
         (xy[:, 0] < w / 2) & (xy[:, 1] >= h / 2), (xy[:, 0] >= w / 2) & (xy[:, 1] >= h / 2)]
    assert all(m.sum() > 20 for m in q)
    # descriptors valid & distinctive
    desc = np.asarray(kp.desc)[valid]
    assert len(np.unique(desc, axis=0)) > 0.9 * len(desc)


def test_extract_repeatability_under_shift(rng):
    """Shift image 8px; matched descriptors should mostly re-detect nearby."""
    img = make_test_image(rng)
    sh = np.roll(img, (8, 8), axis=(0, 1))
    kp1 = orb.extract(jnp.asarray(img), n_features=500, n_levels=4)
    kp2 = orb.extract(jnp.asarray(sh), n_features=500, n_levels=4)
    v1, v2 = np.asarray(kp1.valid), np.asarray(kp2.valid)
    d1 = orb.descriptors_to_bytes(kp1.desc)[v1]
    d2 = orb.descriptors_to_bytes(kp2.desc)[v2]
    xy1 = np.asarray(kp1.xy)[v1]
    xy2 = np.asarray(kp2.xy)[v2]
    # brute force match
    dm = np.array([[hamming(a[None], b[None])[0] for b in d2[:200]] for a in d1[:200]])
    best = dm.argmin(1)
    good = dm[np.arange(len(best)), best] < 40
    disp = xy2[best[good]] - xy1[:200][good]
    med = np.median(disp, axis=0)
    assert abs(med[0] - 8) < 2 and abs(med[1] - 8) < 2, f"median disp {med}"
