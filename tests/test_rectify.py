"""Stereo rectification (geom.rectify) vs OpenCV oracles: map inversion
correctness, epipolar row alignment, disparity sign/scale, device remap."""

import numpy as np
import cv2
import jax.numpy as jnp

from tc2li_slam_tpu.geom import rectify

W, H = 320, 240
K1 = np.array([[260.0, 0, 158.0], [0, 258.0, 122.0], [0, 0, 1]])
K2 = np.array([[255.0, 0, 162.0], [0, 256.0, 118.0], [0, 0, 1]])
D1 = np.array([-0.28, 0.07, 1e-3, -5e-4, 0.0])
D2 = np.array([-0.25, 0.06, -8e-4, 6e-4, 0.0])


def rig():
    r = np.array([0.01, -0.02, 0.015])
    R, _ = cv2.Rodrigues(r)
    t = np.array([-0.54, 0.004, 0.01])
    return R, t


def test_rectify_map_matches_cv2_inverse():
    """undistortPoints(map[y,x]) with OUR R1/P1 must return (x, y):
    the map is exactly the inverse of cv2's rectifying transform."""
    R, t = rig()
    rec = rectify.StereoRectifier(K1, D1, K2, D2, R, t, (W, H))
    for mp, K, D, Rr, P in ((np.asarray(rec.map1), K1, D1, rec.R1, rec.P1),
                            (np.asarray(rec.map2), K2, D2, rec.R2, rec.P2)):
        ys, xs = np.meshgrid(np.linspace(20, H - 20, 12).astype(int),
                             np.linspace(20, W - 20, 12).astype(int),
                             indexing="ij")
        src = mp[ys, xs].reshape(-1, 1, 2).astype(np.float64)
        back = cv2.undistortPoints(src, K, D, R=Rr, P=P[:, :3]).reshape(-1, 2)
        err = np.abs(back - np.stack([xs.ravel(), ys.ravel()], -1))
        assert err.max() < 0.1, err.max()


def test_epipolar_alignment_and_disparity():
    R, t = rig()
    rec = rectify.StereoRectifier(K1, D1, K2, D2, R, t, (W, H))
    rng = np.random.default_rng(0)
    X = np.stack([rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200),
                  rng.uniform(4, 20, 200)], -1)
    X2 = X @ R.T + t
    px1 = cv2.projectPoints(X, np.zeros(3), np.zeros(3), K1, D1)[0].reshape(-1, 2)
    px2 = cv2.projectPoints(X2, np.zeros(3), np.zeros(3), K2, D2)[0].reshape(-1, 2)
    r1 = cv2.undistortPoints(px1.reshape(-1, 1, 2), K1, D1,
                             R=rec.R1, P=rec.P1[:, :3]).reshape(-1, 2)
    r2 = cv2.undistortPoints(px2.reshape(-1, 1, 2), K2, D2,
                             R=rec.R2, P=rec.P2[:, :3]).reshape(-1, 2)
    inb = ((r1 > 5) & (r1 < [W - 5, H - 5])).all(1)
    assert inb.sum() > 50
    dv = np.abs(r1[inb, 1] - r2[inb, 1])
    assert dv.max() < 0.05, dv.max()          # rows aligned
    disp = r1[inb, 0] - r2[inb, 0]
    assert (disp > 0).all()
    # disparity = f b / z in the RECTIFIED frame
    z_rect = (X[inb] @ rec.R1.T)[:, 2]
    f, b = rec.P1[0, 0], -rec.P2[0, 3] / rec.P1[0, 0]
    np.testing.assert_allclose(disp, f * b / z_rect, rtol=1e-3)


def test_remap_bilinear_matches_scipy():
    from scipy.ndimage import map_coordinates
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 50)).astype(np.float32)
    mp = np.stack(
        [rng.uniform(0, 49, (30, 35)), rng.uniform(0, 39, (30, 35))], -1
    ).astype(np.float32)
    ours = np.asarray(rectify.remap_bilinear(jnp.asarray(img), jnp.asarray(mp)))
    ref = map_coordinates(img, [mp[..., 1], mp[..., 0]], order=1,
                          mode="nearest")
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_rectifier_end_to_end_camparams():
    R, t = rig()
    rec = rectify.StereoRectifier(K1, D1, K2, D2, R, t, (W, H))
    p = rec.cam_params()
    assert abs(p["bf"] / p["fx"] - np.linalg.norm(t)) < 1e-9
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    out_l, out_r = rec(img, img)
    assert out_l.shape == (H, W) and np.isfinite(np.asarray(out_l)).all()


def test_build_rectifier_from_settings(tmp_path):
    """Settings-driven construction (the reference's needToRectify path) +
    None for pre-rectified (KITTI-style) configs."""
    yaml = tmp_path / "rig.yaml"
    rows = lambda M: ", ".join(f"{v}" for v in np.asarray(M).ravel())
    R, t = rig()
    T12 = np.eye(4)
    T12[:3, :3], T12[:3, 3] = R, t
    T_c1_c2 = np.linalg.inv(T12)
    yaml.write_text(f"""%YAML:1.0
Camera.type: "PinHole"
Camera.width: {W}
Camera.height: {H}
Camera1.fx: {K1[0,0]}
Camera1.fy: {K1[1,1]}
Camera1.cx: {K1[0,2]}
Camera1.cy: {K1[1,2]}
Camera1.k1: {D1[0]}
Camera1.k2: {D1[1]}
Camera1.p1: {D1[2]}
Camera1.p2: {D1[3]}
Camera2.fx: {K2[0,0]}
Camera2.fy: {K2[1,1]}
Camera2.cx: {K2[0,2]}
Camera2.cy: {K2[1,2]}
Camera2.k1: {D2[0]}
Camera2.k2: {D2[1]}
Camera2.p1: {D2[2]}
Camera2.p2: {D2[3]}
Stereo.T_c1_c2: !!opencv-matrix
   rows: 4
   cols: 4
   dt: d
   data: [{rows(T_c1_c2)}]
""")
    from tc2li_slam_tpu.slam import settings as set_mod
    rec = set_mod.build_rectifier(str(yaml))
    assert rec is not None
    assert abs(rec.cam_params()["bf"] / rec.cam_params()["fx"]
               - np.linalg.norm(t)) < 1e-6
    # KITTI-style (no distortion keys) -> None
    plain = tmp_path / "plain.yaml"
    plain.write_text("%YAML:1.0\nCamera.fx: 718.0\nCamera.fy: 718.0\n"
                     "Camera.cx: 600.0\nCamera.cy: 180.0\n")
    assert set_mod.build_rectifier(str(plain)) is None
