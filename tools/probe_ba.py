"""Decompose local_ba device time: setup vs per-iteration vs BALM overhead.

The r5 kf-event profile showed run_local_ba at 410 ms (8192 active, 6 iters,
BALM on) vs 174 ms (BALM off) — far above what 2 lazy quadratic evals
(~13 ms) explain. This probe times lm.local_ba directly at bench shapes with
iters in {0, 2, 6} x extra_fn in {None, zero-quadratic, balm} to separate
the intercept (assemble/writeback/extra setup) from the slope (per-iter) and
attribute the BALM premium. Run: python tools/probe_ba.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def devtime(name, fn, n=5, reps=3):
    out = fn()
    _fetch(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:<56}{best * 1e3:>9.2f} ms", flush=True)
    return best * 1e3


def zero_extra48(T_cw_win):
    return (jnp.zeros((48, 48)), jnp.zeros((48,)), jnp.asarray(0.0))


def main():
    rng = np.random.default_rng(0)
    from tc2li_slam_tpu.geom import camera as cam_mod, lie
    from tc2li_slam_tpu.solver import lm as lm_mod
    from tc2li_slam_tpu.solver import balm as balm_mod

    cam = cam_mod.Pinhole.create(718.0, 718.0, 607.0, 185.0, bf=386.0)
    P, K = 8, 8
    T0 = jnp.asarray(np.stack([np.eye(4)] * P), jnp.float32)
    fixed = jnp.zeros(P, bool).at[0].set(True)

    for L in (2048, 4096, 8192):
        X = jnp.asarray(np.stack([
            rng.uniform(-15, 15, L), rng.uniform(-8, 8, L),
            rng.uniform(5, 40, L)], -1), jnp.float32)
        obs = lm_mod.BAObservations(
            pose_idx=jnp.asarray(rng.integers(0, P, (L, K)), jnp.int32),
            uv=jnp.asarray(rng.uniform(0, 1200, (L, K, 3)), jnp.float32),
            inv_sigma2=jnp.ones((L, K)),
            stereo=jnp.ones((L, K), bool),
            valid=jnp.asarray(rng.random((L, K)) < 0.6),
        )
        act = jnp.ones(L, bool)
        for iters in (0, 2, 6):
            devtime(f"local_ba L={L} iters={iters} extra=None",
                    lambda it=iters: lm_mod.local_ba(
                        cam, T0, X, obs, fixed, act, iters=it))

    L = 4096
    X = jnp.asarray(np.stack([
        rng.uniform(-15, 15, L), rng.uniform(-8, 8, L),
        rng.uniform(5, 40, L)], -1), jnp.float32)
    obs = lm_mod.BAObservations(
        pose_idx=jnp.asarray(rng.integers(0, P, (L, K)), jnp.int32),
        uv=jnp.asarray(rng.uniform(0, 1200, (L, K, 3)), jnp.float32),
        inv_sigma2=jnp.ones((L, K)),
        stereo=jnp.ones((L, K), bool),
        valid=jnp.asarray(rng.random((L, K)) < 0.6),
    )
    act = jnp.ones(L, bool)

    zext = jax.tree_util.Partial(zero_extra48)
    for iters in (0, 2, 6):
        devtime(f"local_ba L=4096 iters={iters} extra=zeros",
                lambda it=iters: lm_mod.local_ba(
                    cam, T0, X, obs, fixed, act, iters=it, extra_fn=zext))

    # real BALM extra at bench shapes (6 lidar KFs x 2048 pts, 512 voxels)
    from tc2li_slam_tpu.slam import local_mapping as lmap
    pts = jnp.asarray(rng.uniform(-30, 30, (6, 2048, 3)), jnp.float32)
    pv = jnp.ones((6, 2048), bool)
    T_wl = jnp.asarray(np.stack([np.eye(4)] * 6), jnp.float32)
    clusters = balm_mod.build_clusters(
        pts, pv, T_wl, voxel_size=1.0, max_voxels=512, min_points=15)
    ext = jax.tree_util.Partial(
        lmap._balm_extra, clusters=clusters,
        pos_in_win=jnp.arange(6, dtype=jnp.int32),
        lvalid=jnp.ones(6, bool), T_cl=jnp.eye(4),
        w_lba=jnp.asarray(0.01, jnp.float32))
    devtime("balm extra_fn eval alone", lambda: ext(T0))
    for iters in (0, 2, 6):
        devtime(f"local_ba L=4096 iters={iters} extra=balm",
                lambda it=iters: lm_mod.local_ba(
                    cam, T0, X, obs, fixed, act, iters=it, extra_fn=ext))


if __name__ == "__main__":
    main()
