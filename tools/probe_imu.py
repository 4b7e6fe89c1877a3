"""Fetch-barrier decomposition of the IMU-mode hot path at bench shapes.

Two dominant costs in the r5 IMU bench: the FAST-LIO scan step (~400 ms/
frame) and the LVI-BA (~2 s/event). This probe times each fused program and
its pieces so optimization lands on the right sub-kernel.
Run: python tools/probe_imu.py [lio lvi]
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


def main():
    groups = set(sys.argv[1:]) or {"lio", "lvi"}
    rng = np.random.default_rng(0)
    from tc2li_slam_tpu.estimation import esekf
    from tc2li_slam_tpu.ops import voxel_map
    from tc2li_slam_tpu.slam import lio as lio_mod

    if "lio" in groups:
        print("--- lio_scan_step (per frame)", flush=True)
        cfg = lio_mod.LioConfig(scan_voxel=0.5, map_voxel=0.5,
                                plane_thresh=0.1, meas_cov=0.001,
                                max_iters=4, det_range=100.0, blind=2.0)
        vmap = voxel_map.create(1 << 19, 0.5)
        # pre-fill the pool ~50%
        pts0 = jnp.asarray(rng.uniform(-50, 50, (1 << 18, 3)), jnp.float32)
        vmap = voxel_map.insert(vmap, pts0, jnp.ones(1 << 18, bool))
        filt = esekf.init_filter()
        noise = esekf.NoiseCfg.create(gyr=1e-2, acc=1e-1, bg_rw=1e-6,
                                      ba_rw=1e-5)
        N = 32768
        scan = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)
        st = jnp.zeros(N)
        sv = jnp.ones(N, bool)
        W = 32
        gyro = jnp.asarray(rng.normal(0, 0.01, (W, 3)), jnp.float32)
        acc = jnp.asarray(
            rng.normal(0, 0.01, (W, 3)) + np.array([0, 0, 9.81]), jnp.float32)
        dts = jnp.full(W, 0.0031)
        trel = jnp.cumsum(dts)
        devtime("lio_scan_step 32k pts, 4 iters", lambda: lio_mod.lio_scan_step(
            filt, vmap, scan, st, sv, gyro, acc, dts, trel, noise, cfg))
        for it in (1, 2, 3):
            c2 = cfg._replace(max_iters=it)
            devtime(f"lio_scan_step 32k pts, {it} iters",
                    lambda c=c2: lio_mod.lio_scan_step(
                        filt, vmap, scan, st, sv, gyro, acc, dts, trel,
                        noise, c))
        for cap in (8192, 16384):
            c2 = cfg._replace(work_cap=cap)
            devtime(f"lio_scan_step 32k pts, 4 iters, work_cap={cap}",
                    lambda c=c2: lio_mod.lio_scan_step(
                        filt, vmap, scan, st, sv, gyro, acc, dts, trel,
                        noise, c))
        # pieces
        q = scan[:8192]
        devtime("voxel knn 8192q k=5", lambda: voxel_map.knn(
            vmap, q, k=5, radius=2))
        devtime("voxel knn 32768q k=5", lambda: voxel_map.knn(
            vmap, scan, k=5, radius=2))
        devtime("voxel insert 32k", lambda: voxel_map.insert(
            vmap, scan, sv))

    if "lvi" in groups:
        print("--- lvi_ba (per event)", flush=True)
        from tc2li_slam_tpu.geom import camera as cam_mod
        from tc2li_slam_tpu.solver import balm as balm_mod, inertial_ba
        from tc2li_slam_tpu.solver.lm import BAObservations

        cam = cam_mod.Pinhole.create(718.0, 718.0, 607.0, 185.0, bf=386.0)
        P, K, L = 6, 8, 4096
        T_cb = jnp.eye(4)
        state0 = inertial_ba.InertialState(
            T_wb=jnp.tile(jnp.eye(4)[None], (P, 1, 1)),
            vel=jnp.zeros((P, 3)), bg=jnp.zeros((P, 3)), ba=jnp.zeros((P, 3)))
        X = jnp.asarray(np.stack([
            rng.uniform(-15, 15, L), rng.uniform(-8, 8, L),
            rng.uniform(5, 40, L)], -1), jnp.float32)
        obs = BAObservations(
            pose_idx=jnp.asarray(rng.integers(0, P, (L, K)), jnp.int32),
            uv=jnp.asarray(rng.uniform(0, 1200, (L, K, 3)), jnp.float32),
            inv_sigma2=jnp.ones((L, K)),
            stereo=jnp.ones((L, K), bool),
            valid=jnp.asarray(rng.random((L, K)) < 0.6))
        Pm1 = P - 1
        fac = inertial_ba.ImuWindowFactors(
            dR=jnp.tile(jnp.eye(3)[None], (Pm1, 1, 1)),
            dV=jnp.zeros((Pm1, 3)), dP=jnp.zeros((Pm1, 3)),
            JRg=jnp.zeros((Pm1, 3, 3)), JVg=jnp.zeros((Pm1, 3, 3)),
            JVa=jnp.zeros((Pm1, 3, 3)), JPg=jnp.zeros((Pm1, 3, 3)),
            JPa=jnp.zeros((Pm1, 3, 3)), dt=jnp.full(Pm1, 0.5),
            C_inv=jnp.tile(jnp.eye(9)[None], (Pm1, 1, 1)),
            bg_lin=jnp.zeros((Pm1, 3)), ba_lin=jnp.zeros((Pm1, 3)),
            info_bg=jnp.full(Pm1, 1e5), info_ba=jnp.full(Pm1, 1e4),
            valid=jnp.ones(Pm1, bool))
        fixed = jnp.zeros(P, bool).at[0].set(True)
        act = jnp.ones(L, bool)
        grav = jnp.asarray([0.0, 0.0, -9.81])
        for it in (0, 2, 6):
            devtime(f"lvi_ba P=6 L=4096 iters={it} no-balm",
                    lambda i=it: inertial_ba.lvi_ba(
                        cam, T_cb, state0, X, obs, fac, fixed, act, grav,
                        iters=i))
        pts = jnp.asarray(rng.uniform(-30, 30, (P, 2048, 3)), jnp.float32)
        pv = jnp.ones((P, 2048), bool)
        cl = balm_mod.build_clusters(
            pts, pv, jnp.tile(jnp.eye(4)[None], (P, 1, 1)),
            voxel_size=1.0, max_voxels=512, min_points=15)
        for it in (0, 2, 6):
            devtime(f"lvi_ba P=6 L=4096 iters={it} balm",
                    lambda i=it: inertial_ba.lvi_ba(
                        cam, T_cb, state0, X, obs, fac, fixed, act, grav,
                        balm_clusters=cl, T_bl=jnp.eye(4), w_lidar=0.01,
                        iters=i, use_balm=True, n_lidar=P))


if __name__ == "__main__":
    main()
