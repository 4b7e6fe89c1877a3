"""Shared synthetic world + trajectory generators for tests and benches.

A box-world of planes (ground + walls + boxes) with an analytic trajectory
(constant body angular velocity + constant world velocity), exact IMU
measurements, and ray-free LiDAR "scans" (world points near the sensor,
expressed in the sensor frame with optional noise). This stands in for KITTI
(no dataset is available offline) while exercising exactly the same code
paths; see tests/test_lio.py and bench.py.
"""

import numpy as np

GRAVITY = np.array([0.0, 0.0, -9.81])


def make_world(rng, n_ground=8000, n_wall=3000, extent=60.0, wall_h=6.0):
    """Plane-rich world: ground plane + 4 walls + a few interior walls."""
    pts = [
        np.stack(
            [
                rng.uniform(-extent, extent, n_ground),
                rng.uniform(-extent, extent, n_ground),
                np.zeros(n_ground),
            ],
            -1,
        )
    ]
    walls = [
        (+extent, "x"), (-extent, "x"), (+extent, "y"), (-extent, "y"),
        (extent / 3, "x"), (-extent / 2, "y"),
    ]
    for c, axis in walls:
        u = rng.uniform(-extent, extent, n_wall)
        z = rng.uniform(0, wall_h, n_wall)
        if axis == "x":
            pts.append(np.stack([np.full(n_wall, c), u, z], -1))
        else:
            pts.append(np.stack([u, np.full(n_wall, c), z], -1))
    return np.concatenate(pts).astype(np.float32)


def so3_exp_np(w):
    th = np.linalg.norm(w)
    if th < 1e-9:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


class Trajectory:
    """R(t) = R0 Exp(w_b t); p(t) = p0 + v t  (exact IMU available)."""

    def __init__(self, w_body=(0.0, 0.0, 0.05), v_world=(1.5, 0.0, 0.0), z0=1.5):
        self.w = np.asarray(w_body, np.float64)
        self.v = np.asarray(v_world, np.float64)
        self.p0 = np.array([0.0, 0.0, z0])

    def pose(self, t):
        return so3_exp_np(self.w * t), self.p0 + self.v * t

    def imu(self, t):
        """(gyro, accel) measured in body frame, bias-free, noise-free."""
        R, _ = self.pose(t)
        gyro = self.w.copy()
        accel = R.T @ (-GRAVITY)  # zero world acceleration
        return gyro, accel


def make_scan(rng, world, R, p, max_range=40.0, n_max=4096, noise=0.01):
    """Points near the sensor, in sensor frame, padded to n_max."""
    d = np.linalg.norm(world - p, axis=-1)
    sel = np.nonzero(d < max_range)[0]
    if len(sel) > n_max:
        sel = rng.choice(sel, n_max, replace=False)
    pw = world[sel] + rng.normal(0, noise, (len(sel), 3))
    pl = (pw - p) @ R  # R^T (pw - p)
    out = np.zeros((n_max, 3), np.float32)
    out[: len(pl)] = pl
    valid = np.zeros(n_max, bool)
    valid[: len(pl)] = True
    return out, valid


def imu_window(traj, t0, t1, rate=100.0, n_max=32, noise_g=0.0, noise_a=0.0, rng=None):
    """Padded IMU samples covering (t0, t1]: (gyro [N,3], acc [N,3], dts [N],
    t_rel [N] w/ +inf pad)."""
    ts = np.arange(np.ceil(t0 * rate), np.floor(t1 * rate) + 1) / rate
    ts = ts[(ts > t0) & (ts <= t1)]
    gyro = np.zeros((n_max, 3), np.float32)
    acc = np.zeros((n_max, 3), np.float32)
    dts = np.zeros(n_max, np.float32)
    trel = np.full(n_max, np.inf, np.float32)
    prev = t0
    for i, t in enumerate(ts[:n_max]):
        g, a = traj.imu(t)
        if rng is not None:
            g = g + rng.normal(0, noise_g, 3)
            a = a + rng.normal(0, noise_a, 3)
        gyro[i] = g
        acc[i] = a
        dts[i] = t - prev
        trel[i] = t - t0
        prev = t
    # final partial step to t1
    k = len(ts[:n_max])
    if k < n_max and prev < t1 - 1e-9:
        g, a = traj.imu(t1)
        gyro[k] = g
        acc[k] = a
        dts[k] = t1 - prev
        trel[k] = t1 - t0
    return gyro, acc, dts, trel
