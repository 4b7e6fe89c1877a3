"""Distributed bundle adjustment over a device mesh.

The reference has no distributed backend (single process, std::thread —
SURVEY §2.4); this is the new-capability north star from BASELINE.json:
shard the landmark/observation axis across chips, keep Schur landmark
elimination chip-local, and build the dense reduced camera system with
``psum`` over ICI — the SLAM analog of data-parallel gradient all-reduce.

Layout:
- mesh axis ``"lm"``: landmarks (and their observation rows) are sharded;
  poses are replicated.
- per shard: residuals/Jacobians, per-landmark 3x3 elimination, local
  partial of the reduced system S and gradient.
- ``psum(S), psum(g)`` over ICI -> identical dense solve on every chip
  (P*6 x P*6, tiny) -> landmark back-substitution chip-local.

On multi-host, the same program runs under ``jax.distributed`` with a global
mesh; DCN only carries the psum across hosts (the S matrix, ~(6P)^2 floats).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geom import camera as cam_mod, lie
from ..solver import factors
from ..solver.lm import BAObservations


def make_mesh(devices=None, axis: str = "lm") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, (axis,))


def shard_problem(mesh: Mesh, X_w, obs: BAObservations, valid_lm):
    """Place landmark-major arrays sharded on the mesh, poses replicated."""
    sh = NamedSharding(mesh, P("lm"))
    put = lambda x: jax.device_put(x, sh)
    return (
        put(X_w),
        BAObservations(*(put(x) for x in obs)),
        put(valid_lm),
    )


def gn_step_fn(mesh: Mesh, cam: cam_mod.Pinhole, damping: float = 1e-4):
    """Build the sharded one-GN-iteration function (jit over the mesh)."""

    def per_shard(T_cw, X_w, obs: BAObservations, valid_lm, fixed_pose):
        Pn = T_cw.shape[0]
        L, K = obs.pose_idx.shape
        pidx = jnp.clip(obs.pose_idx, 0, Pn - 1).reshape(-1)
        T_o = T_cw[pidx]
        X_o = jnp.repeat(X_w, K, axis=0)
        rr = factors.reproj_residuals(
            cam, T_o, X_o, obs.uv.reshape(-1, 3), obs.inv_sigma2.reshape(-1),
            obs.stereo.reshape(-1),
        )
        thresh = jnp.where(obs.stereo.reshape(-1), factors.CHI2_STEREO, factors.CHI2_MONO)
        w_hub = factors.huber_weight(rr.chi2, thresh)
        active = obs.valid.reshape(-1) & rr.depth_ok
        w = obs.inv_sigma2.reshape(-1) * w_hub * active.astype(rr.r.dtype)

        Jp = rr.J_pose * w[:, None, None]
        Hpp_blk = jnp.einsum("oij,oik->ojk", Jp, rr.J_pose)
        gp_blk = jnp.einsum("oij,oi->oj", Jp, rr.r)
        Hpp = jnp.zeros((Pn, 6, 6)).at[pidx].add(Hpp_blk)
        gp = jnp.zeros((Pn, 6)).at[pidx].add(gp_blk)

        Hll = jnp.sum(
            jnp.einsum("oij,oik->ojk", rr.J_lm * w[:, None, None], rr.J_lm
                       ).reshape(L, K, 3, 3), axis=1)
        gl = jnp.sum(
            jnp.einsum("oij,oi->oj", rr.J_lm * w[:, None, None], rr.r
                       ).reshape(L, K, 3), axis=1)
        B = jnp.einsum("oij,oik->ojk", Jp, rr.J_lm).reshape(L, K, 6, 3)

        lmw = valid_lm.astype(jnp.float32)
        Hll_d = Hll + damping * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hll)) \
            + 1e-6 * jnp.eye(3)
        Hll_inv = jnp.linalg.inv(Hll_d) * lmw[:, None, None]

        pi = jnp.clip(obs.pose_idx, 0, Pn - 1)
        BHinv = jnp.einsum("lkij,ljm->lkim", B, Hll_inv)
        corr = jnp.einsum("lkim,lqjm->lkqij", BHinv, B)
        S = jnp.zeros((Pn, Pn, 6, 6))
        S = S.at[jnp.arange(Pn), jnp.arange(Pn)].add(Hpp)
        S = S.at[pi[:, :, None], pi[:, None, :]].add(-corr)
        gcorr = jnp.einsum("lkim,lm->lki", BHinv, gl)
        g_red = gp.at[pi.reshape(-1)].add(-gcorr.reshape(-1, 6))

        # all-reduce the reduced camera system over ICI
        S = jax.lax.psum(S, "lm")
        g_red = jax.lax.psum(g_red, "lm")
        cost = jax.lax.psum(jnp.sum(w * jnp.sum(rr.r * rr.r, -1)), "lm")

        free = (~fixed_pose).astype(jnp.float32)
        S = S * free[:, None, None, None] * free[None, :, None, None]
        D = Pn * 6
        Sd = S.transpose(0, 2, 1, 3).reshape(D, D)
        free_d = jnp.repeat(free, 6)
        Sd = Sd + jnp.diag(1.0 - free_d)
        Sd = Sd + damping * jnp.diag(jnp.diag(Sd)) + 1e-8 * jnp.eye(D)
        dp = -jnp.linalg.solve(Sd, (g_red.reshape(-1) * free_d)).reshape(Pn, 6)
        dp = dp * free[:, None]

        # landmark back-substitution — local to this shard
        dp_obs = dp[pi]
        Bt_dp = jnp.einsum("lkij,lki->lj", B, dp_obs)
        dl = -jnp.einsum("lij,lj->li", Hll_inv, gl + Bt_dp) * lmw[:, None]

        T_new = lie.se3_exp(dp) @ T_cw
        return T_new, X_w + dl, cost

    specs_obs = BAObservations(
        pose_idx=P("lm"), uv=P("lm"), inv_sigma2=P("lm"),
        stereo=P("lm"), valid=P("lm"),
    )
    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("lm"), specs_obs, P("lm"), P()),
        out_specs=(P(), P("lm"), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def optimize(mesh, cam, T_cw0, X_w0, obs, valid_lm, fixed_pose, iters=10):
    """Multi-iteration driver: re-jits once; host loop over GN steps."""
    step = gn_step_fn(mesh, cam)
    T, X = T_cw0, X_w0
    cost = None
    for _ in range(iters):
        T, X, cost = step(T, X, obs, valid_lm, fixed_pose)
    return T, X, cost
