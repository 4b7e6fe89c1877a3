"""IMU-mode support: per-keyframe inertial state + preintegration store.

The IMU_STEREO_LIDAR pipeline (reference: ``LidarInertialProcess`` thread +
``Tracking::PreintegrateIMU`` + ``LocalMapping``'s inertial BA dispatch)
needs, per keyframe: the preintegrated IMU factor from the previous KF,
velocity and bias snapshots, and the gravity vector expressed in the visual
world frame. This module owns those fixed-capacity arrays and the window
assembly for ``inertial_ba.lvi_ba``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..estimation import imu as imu_mod
from ..solver import inertial_ba

# Minimum credible preintegration sigmas (unmodeled-error floor; see
# ImuKfStore.set_kf). Information caps at 1/floor^2: 4e4 / 400 / 400.
# Empirically the f32 LM + Schur pipeline stalls above ~1e5-scale blocks
# mixed with O(1) visual terms (the quadratic model and the evaluated cost
# disagree at the f32 noise level of the big blocks); at these floors a
# window with exact factors converges to sub-cm from 2 cm perturbations.
SIGMA_ROT_FLOOR = 5e-3   # [rad]
SIGMA_VEL_FLOOR = 5e-2   # [m/s]
SIGMA_POS_FLOOR = 5e-2   # [m]


class ImuKfStore(NamedTuple):
    """Per-KF inertial data, indexed by keyframe id (factor i = KF i-1 -> i)."""

    dR: jax.Array      # [K, 3, 3]
    dV: jax.Array      # [K, 3]
    dP: jax.Array      # [K, 3]
    JRg: jax.Array     # [K, 3, 3]
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    dt: jax.Array      # [K]
    C_inv: jax.Array   # [K, 9, 9]
    bg_lin: jax.Array  # [K, 3]
    ba_lin: jax.Array  # [K, 3]
    vel: jax.Array     # [K, 3] velocity snapshot at the KF (visual world)
    has_factor: jax.Array  # [K] bool (false for KF 0)
    bg: jax.Array      # [K, 3] per-KF gyro bias state (LVI-BA variables)
    ba: jax.Array      # [K, 3] per-KF accel bias state
    vel_opt: jax.Array  # [K] bool: velocity came from an optimizer (not the
    #                     raw ESEKF snapshot) — inertial init / LVI-BA output

    @staticmethod
    def create(max_kf: int):
        z3 = jnp.zeros((max_kf, 3))
        z33 = jnp.zeros((max_kf, 3, 3))
        return ImuKfStore(
            dR=jnp.tile(jnp.eye(3), (max_kf, 1, 1)), dV=z3, dP=z3,
            JRg=z33, JVg=z33, JVa=z33, JPg=z33, JPa=z33,
            dt=jnp.zeros(max_kf), C_inv=jnp.zeros((max_kf, 9, 9)),
            bg_lin=z3, ba_lin=z3, vel=z3,
            has_factor=jnp.zeros(max_kf, bool),
            bg=z3, ba=z3, vel_opt=jnp.zeros(max_kf, bool),
        )

    def set_kf(self, kf_id, pre: imu_mod.Preintegrated | None, vel,
               bg=None, ba=None):
        s = self._replace(vel=self.vel.at[kf_id].set(vel))
        if bg is not None:
            s = s._replace(bg=s.bg.at[kf_id].set(bg))
        if ba is not None:
            s = s._replace(ba=s.ba.at[kf_id].set(ba))
        if pre is None:
            return s
        # Covariance FLOOR: a quiet IMU preintegrates to micrometer/microrad
        # sigmas, i.e. information ~1e8 — far beyond both what systematic
        # model error (time sync, extrinsics, discretization, fixed-pose
        # anchors) supports and what f32 normal equations can balance
        # against O(1) visual terms (g2o hid this in doubles). Flooring the
        # per-component sigma keeps the factor honest and the solve stable.
        C9 = pre.C[:9, :9] + jnp.diag(jnp.concatenate([
            jnp.full(3, SIGMA_ROT_FLOOR ** 2),
            jnp.full(3, SIGMA_VEL_FLOOR ** 2),
            jnp.full(3, SIGMA_POS_FLOOR ** 2),
        ]))
        C_inv = jnp.linalg.inv(C9)
        return s._replace(
            dR=s.dR.at[kf_id].set(pre.dR),
            dV=s.dV.at[kf_id].set(pre.dV),
            dP=s.dP.at[kf_id].set(pre.dP),
            JRg=s.JRg.at[kf_id].set(pre.JRg),
            JVg=s.JVg.at[kf_id].set(pre.JVg),
            JVa=s.JVa.at[kf_id].set(pre.JVa),
            JPg=s.JPg.at[kf_id].set(pre.JPg),
            JPa=s.JPa.at[kf_id].set(pre.JPa),
            dt=s.dt.at[kf_id].set(pre.dt),
            C_inv=s.C_inv.at[kf_id].set(C_inv),
            bg_lin=s.bg_lin.at[kf_id].set(pre.bg),
            ba_lin=s.ba_lin.at[kf_id].set(pre.ba),
            has_factor=s.has_factor.at[kf_id].set(True),
        )


def window_factors(store: ImuKfStore, window: list[int],
                   info_bg: float = 1e5, info_ba: float = 1e4,
                   has_factor=None):
    """Assemble consecutive-pair ImuWindowFactors for a temporal KF window.

    Factor i connects window[i] -> window[i+1]; only valid when the window
    ids are consecutive KFs (factor stored at the later KF's slot).

    ``has_factor``: optional host-side list mirror of ``store.has_factor``
    — passing it avoids one blocking device->host fetch per window pair
    (the System keeps such a mirror; it sets both in the same code path)."""
    P = len(window)
    idx = []
    valid = []
    for a, b in zip(window[:-1], window[1:]):
        idx.append(b)
        hf = has_factor[b] if has_factor is not None \
            else bool(store.has_factor[b])
        valid.append(b == a + 1 and hf)
    sl = jnp.asarray(idx, jnp.int32)
    return inertial_ba.ImuWindowFactors(
        dR=store.dR[sl], dV=store.dV[sl], dP=store.dP[sl],
        JRg=store.JRg[sl], JVg=store.JVg[sl], JVa=store.JVa[sl],
        JPg=store.JPg[sl], JPa=store.JPa[sl],
        dt=store.dt[sl], C_inv=store.C_inv[sl],
        bg_lin=store.bg_lin[sl], ba_lin=store.ba_lin[sl],
        info_bg=jnp.full((P - 1,), info_bg),
        info_ba=jnp.full((P - 1,), info_ba),
        valid=jnp.asarray(valid),
    )
