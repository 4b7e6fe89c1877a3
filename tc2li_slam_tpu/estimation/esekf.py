"""Iterated error-state Kalman filter on the FAST-LIO2 compound manifold.

TPU-native reimplementation of the reference's IKFoM toolkit
(``include/IKFoM_toolkit/esekfom/esekfom.hpp`` + ``use-ikfom.hpp``): the state
lives on (R^3 x SO(3) x SO(3) x R^3 x R^3 x R^3 x R^3 x S^2) — position,
orientation, LiDAR-IMU extrinsic rotation/translation, velocity, gyro bias,
accel bias, gravity — with a 23-dim error state (gravity has the 2-dof S^2
tangent, matching MTK's ``S2`` type).

Design differences from the reference (deliberate, TPU-first):
- ``predict`` is one ``lax.scan`` over the scan's padded IMU samples instead
  of per-sample virtual calls; each step also records the pose for scan
  undistortion (the reference saves ``IMUpose`` in ``UndistortPcl``).
- The iterated update (``update_iterated_dyn_share_modified``,
  esekfom.hpp:1621) is a fixed-count ``lax.scan`` of Gauss-Newton/MAP steps
  ``(H^T H / r + P^-1) δ = -(H^T z / r + P^-1 (x_i ⊟ x_0))`` with a
  convergence mask (no data-dependent loop exit under jit). The measurement
  closure ``h_fn`` is re-evaluated each iteration, like ``h_share_model``.
- The per-iteration tangent-basis re-projection of P (esekfom.hpp:1663-1700)
  is implemented exactly: ``transport_jacobian`` computes L = ∂((x ⊞ δ) ⊟
  x0)/∂δ by forward-mode autodiff through the module's own manifold ops and
  enters both each GN iterate's prior term and the final covariance
  (see ``update_iterated``), matching the reference's L/L_ matrices.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..geom import lie

ERR_DIM = 23
# error-state slices (use-ikfom.hpp ordering: pos, rot, extR, extT, vel, bg, ba, grav)
POS = slice(0, 3)
ROT = slice(3, 6)
EXT_R = slice(6, 9)
EXT_T = slice(9, 12)
VEL = slice(12, 15)
BG = slice(15, 18)
BA = slice(18, 21)
GRAV = slice(21, 23)


class State(NamedTuple):
    pos: jax.Array    # [3]
    R: jax.Array      # [3, 3] world-from-body
    R_LI: jax.Array   # [3, 3] body-from-lidar rotation (offset_R_L_I)
    t_LI: jax.Array   # [3]    body-from-lidar translation
    vel: jax.Array    # [3]
    bg: jax.Array     # [3]
    ba: jax.Array     # [3]
    grav: jax.Array   # [3], |grav| fixed (S2)


class Filter(NamedTuple):
    x: State
    P: jax.Array      # [23, 23]


def init_state(gravity_mag: float = 9.81, dtype=jnp.float32) -> State:
    return State(
        pos=jnp.zeros(3, dtype),
        R=jnp.eye(3, dtype=dtype),
        R_LI=jnp.eye(3, dtype=dtype),
        t_LI=jnp.zeros(3, dtype),
        vel=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        grav=jnp.array([0.0, 0.0, -gravity_mag], dtype),
    )


def init_filter(gravity_mag: float = 9.81, P0: float = 1e-3, dtype=jnp.float32) -> Filter:
    P = jnp.eye(ERR_DIM, dtype=dtype) * P0
    # Extrinsic and gravity start more certain (FAST-LIO defaults: 1e-5/1e-4..).
    P = P.at[EXT_R, EXT_R].set(jnp.eye(3, dtype=dtype) * 1e-5)
    P = P.at[EXT_T, EXT_T].set(jnp.eye(3, dtype=dtype) * 1e-5)
    P = P.at[GRAV, GRAV].set(jnp.eye(2, dtype=dtype) * 1e-4)
    return Filter(init_state(gravity_mag, dtype), P)


# ---------------------------------------------------------------------------
# S2 manifold helpers (MTK S2 semantics)
# ---------------------------------------------------------------------------

def s2_basis(g: jax.Array) -> jax.Array:
    """Orthonormal tangent basis B(g) [3, 2] with B^T g = 0, branch-free."""
    # Pick the world axis least aligned with g as the seed.
    a = jnp.abs(g)
    seed = jnp.eye(3, dtype=g.dtype)[jnp.argmin(a)]
    b1 = jnp.cross(g, seed)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    gn = g / jnp.maximum(jnp.linalg.norm(g), 1e-12)
    b2 = jnp.cross(gn, b1)
    return jnp.stack([b1, b2], axis=-1)


def s2_boxplus(g: jax.Array, delta2: jax.Array) -> jax.Array:
    """g ⊞ δ = Exp(B(g) δ) g — rotate g by a tangent perturbation."""
    u = s2_basis(g) @ delta2
    return (lie.so3_exp(u) @ g[..., None])[..., 0]


def s2_boxminus(g1: jax.Array, g0: jax.Array) -> jax.Array:
    """δ s.t. g0 ⊞ δ ≈ g1: rotation axis-angle from g0 to g1 in B(g0) coords.

    AD-smooth at g1 == g0: the rotation vector is written as
    f(θ)·(n0 × n1) with f = θ/sin θ (Taylor-switched, no /‖cross‖) — the
    earlier normalize-then-mask form had a ZERO derivative through the mask
    at the origin, which silently dropped the gravity block from
    ``transport_jacobian`` and with it the prior's gravity information."""
    n0 = g0 / jnp.maximum(jnp.linalg.norm(g0), 1e-12)
    n1 = g1 / jnp.maximum(jnp.linalg.norm(g1), 1e-12)
    cross = jnp.cross(n0, n1)          # |cross| = sin(theta)
    c = jnp.dot(n0, n1)
    s2 = jnp.sum(cross * cross)
    small = s2 < 1e-6
    # theta / sin(theta): Taylor 1 + t^2/6 near 0 (t ~ sin t there), exact
    # atan2 form elsewhere; double-where keeps both value and derivative
    # finite on the unselected branch
    s_safe = jnp.sqrt(jnp.where(small, 1.0, s2))
    f_exact = jnp.arctan2(s_safe, c) / s_safe
    f = jnp.where(small, 1.0 + s2 / 6.0, f_exact)
    return s2_basis(g0).T @ (f * cross)


# ---------------------------------------------------------------------------
# boxplus / boxminus on the full state
# ---------------------------------------------------------------------------

def boxplus(x: State, dx: jax.Array) -> State:
    return State(
        pos=x.pos + dx[POS],
        R=x.R @ lie.so3_exp(dx[ROT]),
        R_LI=x.R_LI @ lie.so3_exp(dx[EXT_R]),
        t_LI=x.t_LI + dx[EXT_T],
        vel=x.vel + dx[VEL],
        bg=x.bg + dx[BG],
        ba=x.ba + dx[BA],
        grav=s2_boxplus(x.grav, dx[GRAV]),
    )


def transport_jacobian(x_new: State, x0: State) -> jax.Array:
    """L = ∂((x_new ⊞ δ) ⊟ x0)/∂δ at δ = 0  ([23, 23]).

    The per-iteration tangent-basis re-projection of the reference ESEKF
    (esekfom.hpp:1663-1700): identity on Euclidean blocks, inverse right
    Jacobian on the SO(3) blocks, 2x2 S2 transport for gravity. Computed
    EXACTLY for this module's boxplus/boxminus conventions via forward-mode
    autodiff (23 cheap JVPs through the manifold ops) instead of
    hand-derived per-block formulas — bit-consistent with the retraction
    actually used, and negligible next to the [M, 23] measurement work."""
    return jax.jacfwd(
        lambda d: boxminus(boxplus(x_new, d), x0)
    )(jnp.zeros(ERR_DIM, x0.pos.dtype))


def boxminus(x1: State, x0: State) -> jax.Array:
    return jnp.concatenate([
        x1.pos - x0.pos,
        lie.so3_log(x0.R.T @ x1.R),
        lie.so3_log(x0.R_LI.T @ x1.R_LI),
        x1.t_LI - x0.t_LI,
        x1.vel - x0.vel,
        x1.bg - x0.bg,
        x1.ba - x0.ba,
        s2_boxminus(x1.grav, x0.grav),
    ])


# ---------------------------------------------------------------------------
# Predict
# ---------------------------------------------------------------------------

class NoiseCfg(NamedTuple):
    gyr: jax.Array      # white gyro noise std [rad/s/sqrt(s) discrete-ish]
    acc: jax.Array      # white accel noise std
    bg_rw: jax.Array    # gyro bias random walk std
    ba_rw: jax.Array    # accel bias random walk std

    @staticmethod
    def create(gyr=0.1, acc=0.1, bg_rw=1e-4, ba_rw=1e-4):
        return NoiseCfg(*[jnp.float32(v) for v in (gyr, acc, bg_rw, ba_rw)])


@jax.jit
def predict(
    f: Filter,
    gyro: jax.Array,   # [N, 3] padded IMU window
    acc: jax.Array,    # [N, 3]
    dts: jax.Array,    # [N] (0 = padding)
    noise: NoiseCfg,
) -> tuple[Filter, jax.Array, jax.Array]:
    """Propagate through an IMU window (esekfom ``predict``, per sample).

    Returns (filter, body_R_traj [N, 3, 3], body_p_traj [N, 3]) — the pose
    after each sample, consumed by scan undistortion.
    """
    dtype = gyro.dtype

    def step(carry, inp):
        x, P = carry
        w, a, dt = inp
        active = dt > 0
        dt = jnp.where(active, dt, 0.0)

        w_ub = w - x.bg
        a_ub = a - x.ba
        acc_w = x.R @ a_ub + x.grav

        dRi = lie.so3_exp(w_ub * dt)
        Jr = lie.so3_right_jacobian(w_ub * dt)
        Bg = s2_basis(x.grav)

        new_x = State(
            pos=x.pos + x.vel * dt + 0.5 * acc_w * dt * dt,
            R=x.R @ dRi,
            R_LI=x.R_LI,
            t_LI=x.t_LI,
            vel=x.vel + acc_w * dt,
            bg=x.bg,
            ba=x.ba,
            grav=x.grav,
        )

        eye3 = jnp.eye(3, dtype=dtype)
        F = jnp.eye(ERR_DIM, dtype=dtype)
        F = F.at[POS, VEL].set(eye3 * dt)
        F = F.at[ROT, ROT].set(dRi.T)
        F = F.at[ROT, BG].set(-Jr * dt)
        F = F.at[VEL, ROT].set(-x.R @ lie.hat(a_ub) * dt)
        F = F.at[VEL, BA].set(-x.R * dt)
        F = F.at[VEL, GRAV].set(-lie.hat(x.grav) @ Bg * dt)

        Fw = jnp.zeros((ERR_DIM, 12), dtype)
        Fw = Fw.at[ROT, 0:3].set(-Jr * dt)
        Fw = Fw.at[VEL, 3:6].set(-x.R * dt)
        Fw = Fw.at[BG, 6:9].set(eye3 * dt)
        Fw = Fw.at[BA, 9:12].set(eye3 * dt)
        Q = jnp.diag(jnp.concatenate([
            jnp.full(3, noise.gyr ** 2),
            jnp.full(3, noise.acc ** 2),
            jnp.full(3, noise.bg_rw ** 2),
            jnp.full(3, noise.ba_rw ** 2),
        ])).astype(dtype)

        new_P = F @ P @ F.T + Fw @ Q @ Fw.T
        x_out = jax.tree.map(lambda n, o: jnp.where(active, n, o), new_x, x)
        P_out = jnp.where(active, new_P, P)
        return (x_out, P_out), (x_out.R, x_out.pos)

    (x, P), (R_traj, p_traj) = jax.lax.scan(step, (f.x, f.P), (gyro, acc, dts))
    return Filter(x, P), R_traj, p_traj


# ---------------------------------------------------------------------------
# Iterated update
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("h_fn", "max_iters"))
def update_iterated(
    f: Filter,
    h_fn: Callable[[State], tuple[jax.Array, jax.Array, jax.Array]],
    meas_noise: jax.Array,  # [] scalar R (LASER_POINT_COV in the reference)
    max_iters: int = 4,
    eps: float = 1e-3,
) -> tuple[Filter, jax.Array]:
    """Iterated MAP update (esekfom.hpp:1621).

    ``h_fn(state) -> (z [M], H [M, 23], valid [M])`` re-evaluates the
    point-to-plane measurement at the current iterate (the reference's
    ``h_share_model``: fresh kNN + plane fit each iteration). Returns the
    updated filter and the number of iterations actually used (for stats).
    """
    x0, P0 = f.x, f.P
    P0_inv = jnp.linalg.inv(P0 + 1e-9 * jnp.eye(ERR_DIM, dtype=P0.dtype))
    r_inv = 1.0 / meas_noise

    def gn_step(carry, _):
        x_i, converged, iters = carry
        z, H, valid = h_fn(x_i)
        w = valid.astype(z.dtype) * r_inv
        Hw = H * w[:, None]
        HtH = H.T @ Hw                      # [23, 23]
        Htz = Hw.T @ z                      # [23]
        dx0 = boxminus(x_i, x0)
        # Tangent-basis transport (esekfom.hpp:1663-1700): the prior term
        # ||x ⊟ x0||^2_{P0^-1} linearized in the tangent AT THE ITERATE is
        # ||dx0 + L δ||^2 with L = ∂((x_i ⊞ δ) ⊟ x0)/∂δ — identity on the
        # Euclidean blocks, inverse right Jacobians on SO(3), the 2x2 S2
        # transport for gravity.
        Lj = transport_jacobian(x_i, x0)
        LtP = Lj.T @ P0_inv
        A = HtH + LtP @ Lj
        b = -(Htz + LtP @ dx0)
        delta = jnp.linalg.solve(A, b)
        step_ok = jnp.logical_not(converged)
        x_next = boxplus(x_i, jnp.where(step_ok, delta, 0.0))
        now_conv = jnp.max(jnp.abs(delta)) < eps
        return (x_next, converged | now_conv, iters + step_ok.astype(jnp.int32)), None

    carry = (x0, jnp.array(False), jnp.array(0, jnp.int32))
    (x_fin, _, iters), _ = jax.lax.scan(gn_step, carry, None, length=max_iters)

    # Final covariance in the tangent at the CONVERGED state:
    # P = (H^T R^-1 H + L^T P0^-1 L)^-1 — the (I - K H) P form of the
    # reference with its per-iteration L re-projection folded in.
    z, H, valid = h_fn(x_fin)
    w = valid.astype(z.dtype) * r_inv
    HtH = H.T @ (H * w[:, None])
    Lf = transport_jacobian(x_fin, x0)
    P_new = jnp.linalg.inv(HtH + Lf.T @ P0_inv @ Lf)
    P_new = 0.5 * (P_new + P_new.T)
    return Filter(x_fin, P_new), iters


# ---------------------------------------------------------------------------
# Static initialization (ImuProcess::IMU_init, IMU_Processing.cpp:105-157)
# ---------------------------------------------------------------------------

def static_init(
    f: Filter,
    gyro: jax.Array,  # [N, 3] samples while stationary
    acc: jax.Array,   # [N, 3]
    valid: jax.Array,  # [N]
    gravity_mag: float = 9.81,
) -> Filter:
    """Mean-acc gravity alignment + gyro-bias estimate from a static window."""
    wsum = jnp.maximum(jnp.sum(valid), 1)
    mean_acc = jnp.sum(acc * valid[:, None], axis=0) / wsum
    mean_gyr = jnp.sum(gyro * valid[:, None], axis=0) / wsum
    g_dir = -mean_acc / jnp.maximum(jnp.linalg.norm(mean_acc), 1e-9)
    x = f.x._replace(
        grav=g_dir * gravity_mag,
        bg=mean_gyr,
    )
    return f._replace(x=x)
