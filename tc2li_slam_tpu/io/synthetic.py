"""Synthetic stereo + LiDAR + IMU sequence generator.

Stands in for KITTI in tests and benchmarks (no dataset ships with this
environment): a plane-rich world decorated with point "texture dots" is
rendered into stereo pairs (dots become corner features ORB can track),
sampled into LiDAR scans, and differentiated into exact IMU measurements
along an analytic trajectory. Ground truth poses come with every frame, so
end-to-end ATE is measurable offline exactly like the reference's
KITTI-devkit evaluation flow.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

GRAVITY = np.array([0.0, 0.0, -9.81])


def so3_exp_np(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


class CameraRig(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    baseline: float
    width: int
    height: int

    @property
    def bf(self):
        return self.fx * self.baseline


KITTI_LIKE = CameraRig(fx=718.856, fy=718.856, cx=607.19, cy=185.2,
                       baseline=0.537, width=1241, height=376)
SMALL = CameraRig(fx=320.0, fy=320.0, cx=320.0, cy=120.0,
                  baseline=0.5, width=640, height=240)


class World(NamedTuple):
    dots: np.ndarray       # [D, 3] texture dot positions (visual landmarks)
    dot_pattern: np.ndarray  # [D, 3, 3] per-dot intensity patch (distinctive)
    surf: np.ndarray       # [S, 3] dense surface points (LiDAR targets)


def make_world(rng, extent=60.0, n_dots=2500, n_surf=24000) -> World:
    """Ground plane + walls + boxes, with both texture dots and LiDAR surf."""

    def on_planes(n):
        """Street-like scene: a near-field corridor along the +x trajectory
        (road strip + side walls, like KITTI streets) plus far structure.
        Stereo only constrains depth within ~35 x baseline, so the corridor
        keeps close features available everywhere on the path."""
        pts = []
        n_corr = n // 2
        # road strip under/around the path
        n_road = n_corr // 2
        pts.append(np.stack([
            rng.uniform(-10, extent + 30, n_road),
            rng.uniform(-8, 8, n_road),
            np.zeros(n_road),
        ], -1))
        # side walls of the corridor
        per_w = (n_corr - n_road) // 2
        for ywall in (-8.0, 8.0):
            pts.append(np.stack([
                rng.uniform(-10, extent + 30, per_w),
                np.full(per_w, ywall),
                rng.uniform(0.0, 5.0, per_w),
            ], -1))
        # far structure
        n_far = n - n_corr
        n_g = n_far // 2
        pts.append(np.stack([
            rng.uniform(-extent, extent, n_g),
            rng.uniform(-extent, extent, n_g),
            np.zeros(n_g),
        ], -1))
        walls = [
            (extent, "x"), (-extent, "x"), (extent, "y"), (-extent, "y"),
        ]
        per = (n_far - n_g) // len(walls)
        for cpos, ax in walls:
            u = rng.uniform(-extent, extent, per)
            z = rng.uniform(0.0, 6.0, per)
            if ax == "x":
                pts.append(np.stack([np.full(per, cpos), u, z], -1))
            else:
                pts.append(np.stack([u, np.full(per, cpos), z], -1))
        return np.concatenate(pts).astype(np.float32)

    dots = on_planes(n_dots)
    # Distinctive per-dot 3x3 patterns: repetitive identical dots make ORB
    # descriptors ambiguous (stereo/track mismatches); random patches give
    # each corner a recognizable neighborhood like real texture.
    pattern = rng.uniform(40, 255, (len(dots), 3, 3)).astype(np.float32)
    return World(
        dots=dots,
        dot_pattern=pattern,
        surf=on_planes(n_surf),
    )


class Trajectory:
    """R(t) = Exp(w t); p(t) = p0 + R-independent polyline — constant world
    velocity with optional turn, exact IMU."""

    def __init__(self, w_body=(0.0, 0.0, 0.04), v_world=(2.0, 0.2, 0.0), z0=1.6):
        self.w = np.asarray(w_body, np.float64)
        self.v = np.asarray(v_world, np.float64)
        self.p0 = np.array([0.0, 0.0, z0])

    def pose(self, t):
        """World-from-body (x forward, y left, z up)."""
        return so3_exp_np(self.w * t), self.p0 + self.v * t

    def imu(self, t):
        R, _ = self.pose(t)
        return self.w.copy(), R.T @ (-GRAVITY)


# Camera mounted looking along body +x: camera frame z=forward, x=right, y=down.
R_BC = np.array([
    [0.0, -1.0, 0.0],   # cam x = -body y (right)
    [0.0, 0.0, -1.0],   # cam y = -body z (down)
    [1.0, 0.0, 0.0],    # cam z =  body x (forward)
], np.float64).T  # body-from-camera rotation


def body_from_cam() -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = R_BC
    return T


def render_stereo(world: World, cam: CameraRig, T_wb: np.ndarray, rng=None):
    """Render L/R grayscale images by splatting texture dots (3x3 patches).

    Cheap but produces FAST-detectable corners with exact stereo geometry.
    """
    T_wc = T_wb @ body_from_cam()
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    pc = (world.dots - t) @ R  # world -> camera (row convention R^T x)
    imgs = []
    for side in range(2):
        x = pc[:, 0] - (side * cam.baseline)
        y, z = pc[:, 1], pc[:, 2]
        vis = z > 0.5
        u = cam.fx * x / np.where(vis, z, 1.0) + cam.cx
        v = cam.fy * y / np.where(vis, z, 1.0) + cam.cy
        vis &= (u >= 3) & (u < cam.width - 3) & (v >= 3) & (v < cam.height - 3)
        img = np.full((cam.height, cam.width), 30.0, np.float32)
        uu, vv = u[vis], v[vis]
        u0 = np.floor(uu).astype(int)
        v0 = np.floor(vv).astype(int)
        fu = uu - u0
        fv = vv - v0
        pat = world.dot_pattern[vis]
        # Bilinear (tent) splat of each dot's 3x3 pattern: the subpixel
        # projection is encoded in the intensity distribution, so stereo
        # disparity and feature positions stay subpixel-consistent between
        # views (integer splatting quantizes depth by meters at range), and
        # the per-dot pattern keeps descriptors distinctive.
        for a in range(3):
            for b in range(3):
                inten = pat[:, b, a]
                for du in (0, 1):
                    for dv in (0, 1):
                        w = np.where(du, fu, 1 - fu) * np.where(dv, fv, 1 - fv)
                        np.add.at(img, (v0 + dv + b - 1, u0 + du + a - 1), inten * w)
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
    return imgs[0], imgs[1]


def lidar_scan(world: World, T_wb: np.ndarray, rng, max_range=60.0,
               n_max=4096, noise=0.015, T_bl: np.ndarray | None = None):
    """Surf points near the sensor, in the LiDAR frame, padded."""
    if T_bl is None:
        T_bl = np.eye(4)
    T_wl = T_wb @ T_bl
    R, t = T_wl[:3, :3], T_wl[:3, 3]
    d = np.linalg.norm(world.surf - t, axis=-1)
    sel = np.nonzero(d < max_range)[0]
    if len(sel) > n_max:
        sel = rng.choice(sel, n_max, replace=False)
    pw = world.surf[sel] + rng.normal(0, noise, (len(sel), 3))
    pl = (pw - t) @ R
    out = np.zeros((n_max, 3), np.float32)
    out[: len(pl)] = pl
    valid = np.zeros(n_max, bool)
    valid[: len(pl)] = True
    return out, valid


def imu_window(traj: Trajectory, t0, t1, rate=100.0, n_max=32,
               noise_g=0.0, noise_a=0.0, rng=None):
    """Padded IMU samples covering (t0, t1]."""
    ts = np.arange(np.ceil(t0 * rate), np.floor(t1 * rate) + 1) / rate
    ts = ts[(ts > t0) & (ts <= t1)]
    gyro = np.zeros((n_max, 3), np.float32)
    acc = np.zeros((n_max, 3), np.float32)
    dts = np.zeros(n_max, np.float32)
    trel = np.full(n_max, np.inf, np.float32)
    prev = t0
    k = 0
    for t in ts[:n_max]:
        g, a = traj.imu(t)
        if rng is not None:
            g = g + rng.normal(0, noise_g, 3)
            a = a + rng.normal(0, noise_a, 3)
        gyro[k], acc[k], dts[k], trel[k] = g, a, t - prev, t - t0
        prev = t
        k += 1
    if k < n_max and prev < t1 - 1e-9:
        g, a = traj.imu(t1)
        gyro[k], acc[k], dts[k], trel[k] = g, a, t1 - prev, t1 - t0
    return gyro, acc, dts, trel


class FrameData(NamedTuple):
    t: float
    img_l: np.ndarray
    img_r: np.ndarray
    scan: np.ndarray
    scan_valid: np.ndarray
    scan_times: np.ndarray
    gyro: np.ndarray
    acc: np.ndarray
    imu_dts: np.ndarray
    imu_trel: np.ndarray
    T_wb_gt: np.ndarray


def generate_sequence(
    n_frames=30, fps=10.0, cam: CameraRig = SMALL, seed=0,
    traj: Trajectory | None = None, world: World | None = None,
    lidar_noise=0.015, n_scan=4096,
):
    """Yield FrameData for a full synthetic run (deterministic per seed)."""
    rng = np.random.default_rng(seed)
    world = world or make_world(rng)
    traj = traj or Trajectory()
    dt = 1.0 / fps
    frames = []
    for i in range(n_frames):
        t = i * dt
        R, p = traj.pose(t)
        T_wb = np.eye(4)
        T_wb[:3, :3] = R
        T_wb[:3, 3] = p
        img_l, img_r = render_stereo(world, cam, T_wb, rng)
        scan, sv = lidar_scan(world, T_wb, rng, noise=lidar_noise, n_max=n_scan)
        gyro, acc, dts, trel = imu_window(traj, max(t - dt, 0.0), t) if i else (
            np.zeros((32, 3), np.float32), np.zeros((32, 3), np.float32),
            np.zeros(32, np.float32), np.full(32, np.inf, np.float32),
        )
        frames.append(FrameData(
            t=t, img_l=img_l, img_r=img_r, scan=scan, scan_valid=sv,
            scan_times=np.full(n_scan, 0.0, np.float32),
            gyro=gyro, acc=acc, imu_dts=dts, imu_trel=trel, T_wb_gt=T_wb,
        ))
    return frames, world, traj


def ate_rmse(T_est: np.ndarray, T_gt: np.ndarray) -> float:
    """Absolute trajectory error after SE3 (Umeyama, no scale) alignment —
    the KITTI-devkit/evo metric the reference is judged by."""
    p_est = T_est[:, :3, 3]
    p_gt = T_gt[:, :3, 3]
    mu_e = p_est.mean(0)
    mu_g = p_gt.mean(0)
    E = (p_est - mu_e).T @ (p_gt - mu_g)
    U, _, Vt = np.linalg.svd(E)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = Vt.T @ S @ U.T
    t = mu_g - R @ mu_e
    p_al = p_est @ R.T + t
    return float(np.sqrt(np.mean(np.sum((p_al - p_gt) ** 2, axis=-1))))
