"""Camera model tests: project/unproject consistency, analytic Jacobians vs
autodiff, stereo projection geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from tc2li_slam_tpu.geom import camera, triangulate, lie

CAM = camera.Pinhole.create(fx=718.856, fy=718.856, cx=607.19, cy=185.2, bf=386.1448)


def random_points(rng, n, zmin=1.0, zmax=50.0):
    z = rng.uniform(zmin, zmax, size=n)
    x = rng.uniform(-0.5, 0.5, size=n) * z
    y = rng.uniform(-0.3, 0.3, size=n) * z
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def test_project_unproject_roundtrip(rng):
    p = random_points(rng, 128)
    uv = camera.project(CAM, jnp.asarray(p))
    p2 = camera.unproject(CAM, uv, jnp.asarray(p[:, 2]))
    np.testing.assert_allclose(np.asarray(p2), p, rtol=1e-5, atol=1e-3)


def test_project_jac_matches_autodiff(rng):
    p = random_points(rng, 16)
    J = np.asarray(camera.project_jac(CAM, jnp.asarray(p)))
    J_ad = np.asarray(
        jax.vmap(jax.jacfwd(lambda q: camera.project(CAM, q)))(jnp.asarray(p))
    )
    np.testing.assert_allclose(J, J_ad, rtol=1e-4, atol=1e-4)


def test_project_stereo_jac_matches_autodiff(rng):
    p = random_points(rng, 16)
    J = np.asarray(camera.project_stereo_jac(CAM, jnp.asarray(p)))
    J_ad = np.asarray(
        jax.vmap(jax.jacfwd(lambda q: camera.project_stereo(CAM, q)))(jnp.asarray(p))
    )
    np.testing.assert_allclose(J, J_ad, rtol=1e-4, atol=1e-4)


def test_stereo_disparity_depth(rng):
    p = random_points(rng, 64)
    uvr = np.asarray(camera.project_stereo(CAM, jnp.asarray(p)))
    disparity = uvr[:, 0] - uvr[:, 2]
    z = np.asarray(camera.depth_from_disparity(CAM, jnp.asarray(disparity)))
    np.testing.assert_allclose(z, p[:, 2], rtol=1e-4)


def test_kb8_project_unproject(rng):
    cam = camera.KannalaBrandt8.create(
        190.9, 190.9, 254.9, 256.9, 0.0034, 0.0007, -0.0034, 0.0007
    )
    p = random_points(rng, 64, zmin=0.5, zmax=10.0)
    uv = camera.kb8_project(cam, jnp.asarray(p))
    ray = np.asarray(camera.kb8_unproject(cam, uv))
    ray_ref = p / p[:, 2:3]
    np.testing.assert_allclose(ray, ray_ref, atol=1e-3)


def test_triangulate_dlt(rng):
    p_world = random_points(rng, 32, zmin=5, zmax=30)
    T1w = lie.se3_identity()
    xi = np.array([0.5, 0.02, -0.01, 0.01, 0.03, -0.02], dtype=np.float32)
    T2w = lie.se3_exp(jnp.asarray(xi))
    p1 = lie.se3_apply(T1w, jnp.asarray(p_world))
    p2 = lie.se3_apply(T2w, jnp.asarray(p_world))
    xn1 = p1[:, :2] / p1[:, 2:3]
    xn2 = p2[:, :2] / p2[:, 2:3]
    X = np.asarray(triangulate.triangulate_dlt(xn1, xn2, T1w, T2w))
    np.testing.assert_allclose(X, p_world, rtol=1e-2, atol=5e-2)


def test_parallax_cos():
    p = jnp.asarray([[0.0, 0.0, 10.0]], dtype=jnp.float32)
    c1 = jnp.asarray([0.0, 0.0, 0.0], dtype=jnp.float32)
    c2 = jnp.asarray([10.0, 0.0, 0.0], dtype=jnp.float32)
    cosang = float(triangulate.parallax_cos(p, c1, c2)[0])
    assert abs(cosang - np.cos(np.pi / 4)) < 1e-5


def test_kb8_project_jac_matches_numeric(rng):
    cam = camera.KannalaBrandt8.create(
        280.0, 280.0, 320.0, 240.0, -0.01, 0.02, -0.005, 0.001
    )
    p = np.stack([
        rng.uniform(-2, 2, 40), rng.uniform(-2, 2, 40), rng.uniform(0.5, 6, 40)
    ], -1).astype(np.float32)
    J = np.asarray(camera.kb8_project_jac(cam, jnp.asarray(p)))
    eps = 1e-3
    for k in range(3):
        dp = np.zeros(3, np.float32)
        dp[k] = eps
        up = np.asarray(camera.kb8_project(cam, jnp.asarray(p + dp)))
        um = np.asarray(camera.kb8_project(cam, jnp.asarray(p - dp)))
        num = (up - um) / (2 * eps)
        np.testing.assert_allclose(J[:, :, k], num, rtol=5e-2, atol=5e-2)


def test_kb8_triangulate_matches(rng):
    """Fisheye dual-camera stereo (TriangulateMatches parity): recover 3D
    points through the rig extrinsic with validation gates."""
    cam = camera.KannalaBrandt8.create(
        280.0, 280.0, 320.0, 240.0, -0.01, 0.02, -0.005, 0.001
    )
    N = 60
    X1 = np.stack([
        rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(2, 10, N)
    ], -1).astype(np.float32)
    T_21 = np.eye(4, dtype=np.float32)
    T_21[0, 3] = -0.2   # 20 cm rig baseline
    X2 = X1 @ T_21[:3, :3].T + T_21[:3, 3]
    uv1 = camera.kb8_project(cam, jnp.asarray(X1))
    uv2 = camera.kb8_project(cam, jnp.asarray(X2))
    s2 = jnp.ones(N)
    X_est, ok = camera.kb8_triangulate_matches(
        cam, cam, uv1, uv2, jnp.asarray(T_21), s2, s2
    )
    ok = np.asarray(ok)
    assert ok.sum() > 0.9 * N, f"only {ok.sum()}/{N} triangulated"
    err = np.linalg.norm(np.asarray(X_est)[ok] - X1[ok], axis=-1)
    assert np.median(err) < 0.02, np.median(err)
    # a mismatched pair (wrong correspondence) must be rejected
    uv2_bad = np.asarray(uv2).copy()
    uv2_bad[:10] = uv2_bad[10:20]
    _, ok_bad = camera.kb8_triangulate_matches(
        cam, cam, uv1, jnp.asarray(uv2_bad), jnp.asarray(T_21), s2, s2
    )
    assert np.asarray(ok_bad)[:10].sum() <= 2


def test_in_image_non_centered_intrinsics():
    """Image-bounds gating must use configured width/height, not a
    principal-point proxy (Frame::isInFrustum uses mnMaxX/Y, Frame.cc:542).
    A cropped/asymmetric rig has cx far from width/2."""
    cam = camera.Pinhole.create(fx=700.0, fy=700.0, cx=300.0, cy=185.0,
                                width=1241, height=376)
    uv = jnp.asarray([
        [1000.0, 200.0],   # inside real bounds, outside 2*cx proxy (600)
        [1240.9, 375.9],   # just inside
        [1241.0, 100.0],   # just outside right edge
        [100.0, 376.0],    # just outside bottom edge
        [-0.5, 100.0],     # outside left
    ])
    got = np.asarray(camera.in_image(cam, uv))
    assert got.tolist() == [True, True, False, False, False]
    # default (no width/height given) falls back to the centered 2cx x 2cy box
    cam_d = camera.Pinhole.create(fx=700.0, fy=700.0, cx=300.0, cy=185.0)
    got_d = np.asarray(camera.in_image(cam_d, uv))
    assert got_d.tolist() == [False, False, False, False, False]
