"""Trajectory output in KITTI / TUM formats.

Byte-compatible with the reference's savers (``System::SaveTrajectoryKITTI``,
``SaveTrajectoryTUM``, ``SaveKeyFrameTrajectoryTUM`` — System.cc:379-548):
KITTI = 12 floats per line (3x4 world-from-camera), TUM = ``t tx ty tz qx qy
qz qw``.
"""

from __future__ import annotations

import numpy as np


def save_kitti(path: str, T_wc_list) -> None:
    with open(path, "w") as f:
        for T in T_wc_list:
            T = np.asarray(T)
            row = T[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def save_tum(path: str, times, T_wc_list) -> None:
    from ..geom import lie
    import jax.numpy as jnp

    with open(path, "w") as f:
        for t, T in zip(times, T_wc_list):
            T = np.asarray(T)
            q = np.asarray(lie.mat_to_quat(jnp.asarray(T[:3, :3])))
            tx, ty, tz = T[:3, 3]
            f.write(
                f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def load_kitti(path: str) -> np.ndarray:
    raw = np.loadtxt(path).reshape(-1, 3, 4)
    out = np.tile(np.eye(4), (len(raw), 1, 1))
    out[:, :3, :4] = raw
    return out
