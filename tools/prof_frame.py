"""Fetch-barrier device-time attribution for the frame hot path.

block_until_ready is unreliable through the axon tunnel; the only trustworthy
barrier is an actual device->host fetch (np.asarray) of part of the result.
Methodology: chain N calls, fetch a tiny leaf of the last output, divide.
A ready-array fetch costs ~0 ms (client-side cache), a fresh fetch pays the
~24 ms tunnel RTT once — amortized over N it adds <2.5 ms/call of noise,
and we report min-of-reps which squeezes most of that out.

Run: python tools/prof_frame.py [group ...]   groups: disp vision track kf
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def devtime(name, fn, n=10, reps=3):
    out = fn()
    _fetch(out)  # compile + settle
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:<52}{best * 1e3:>9.2f} ms", flush=True)
    return best * 1e3


def main():
    groups = set(sys.argv[1:]) or {"disp", "vision", "track"}
    rng = np.random.default_rng(0)
    H, W = 376, 1241
    img_np = rng.integers(0, 255, (H, W), dtype=np.uint8)
    img = jnp.asarray(img_np.astype(np.float32))
    img_r = jnp.asarray(
        rng.integers(0, 255, (H, W), dtype=np.uint8).astype(np.float32))
    _fetch(img), _fetch(img_r)

    from tc2li_slam_tpu.ops import matching, orb, stereo
    from tc2li_slam_tpu.geom import camera as cam_mod

    cam = cam_mod.Pinhole.create(718.856, 718.856, 607.19, 185.2, bf=386.14)
    sf = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)

    if "disp" in groups:
        print("--- dispatch floors", flush=True)
        x = jnp.zeros(())
        f_tiny = jax.jit(lambda v: v + 1.0)
        devtime("tiny add (per dispatch)", lambda: f_tiny(x), n=50)
        A = jnp.eye(6) * 3.0 + 0.1
        b = jnp.ones(6)
        f_s6 = jax.jit(lambda: jnp.linalg.solve(A, b))
        devtime("linalg.solve 6x6", f_s6, n=20)
        f_cho = jax.jit(
            lambda: jax.scipy.linalg.cho_solve(
                (jnp.linalg.cholesky(A), True), b))
        devtime("cholesky solve 6x6", f_cho, n=20)

    if "vision" in groups:
        print("--- orb pieces (level-0 sizes)", flush=True)
        f_raw = jax.jit(orb.fast_score_raw)
        devtime("fast_score_raw (pallas)", lambda: f_raw(img))
        f_det = jax.jit(orb.detect_level)
        devtime("detect_level", lambda: f_det(img))
        score = f_det(img)
        _fetch(score)
        f_sel = jax.jit(lambda s: orb.select_topk_grid(s, 433))
        devtime("select_topk_grid k=433 (top_k)", lambda: f_sel(score))

        def sel_approx(s, k=433, cell=16):
            cell_max = orb._cell_has(s, cell)
            is_best = (s >= cell_max) & (s > 0)
            rank = s + jnp.where(is_best, 1e6, 0.0)
            vals, idx = jax.lax.approx_max_k(rank.ravel(), k,
                                             recall_target=0.99)
            return idx // s.shape[1], idx % s.shape[1], vals

        f_sa = jax.jit(sel_approx)
        devtime("select approx_max_k k=433", lambda: f_sa(score))

        rows = jnp.asarray(rng.integers(20, H - 20, 433), jnp.int32)
        cols = jnp.asarray(rng.integers(20, W - 20, 433), jnp.int32)
        angles = jnp.asarray(rng.uniform(-3, 3, 433), jnp.float32)
        f_or = jax.jit(orb.compute_orientation)
        devtime("compute_orientation K=433 (adv-index)",
                lambda: f_or(img, rows, cols))

        def orient_ds(im, r, c):
            def one(rr, cc):
                return jax.lax.dynamic_slice(
                    im, (rr - 15, cc - 15), (31, 31))
            p = jax.vmap(one)(r, c)
            m = jnp.asarray(orb._IC_MASK)
            m10 = jnp.sum(p * m * jnp.asarray(orb._IC_U), axis=(1, 2))
            m01 = jnp.sum(p * m * jnp.asarray(orb._IC_V), axis=(1, 2))
            return jnp.arctan2(m01, m10)

        f_ods = jax.jit(orient_ds)
        devtime("compute_orientation K=433 (dyn-slice)",
                lambda: f_ods(img, rows, cols))

        f_bl = jax.jit(orb.gaussian_blur7)
        devtime("gaussian_blur7", lambda: f_bl(img))
        blur = f_bl(img)
        _fetch(blur)
        f_de = jax.jit(orb.compute_descriptors)
        devtime("compute_descriptors K=433", lambda: f_de(blur, rows, cols, angles))
        f_rs = jax.jit(lambda im: jax.image.resize(im, (313, 1034), "linear"))
        devtime("resize ->level1", lambda: f_rs(img))
        f_ex = jax.jit(
            lambda im: orb.extract(im, n_features=2000, n_levels=8))
        devtime("orb.extract 2000x8", lambda: f_ex(img), n=5)
        f_ex2 = jax.jit(jax.vmap(
            lambda im: orb.extract(im, n_features=2000, n_levels=8)))
        both = jnp.stack([img, img_r])
        devtime("vmapped extract x2 [2,H,W]", lambda: f_ex2(both), n=5)

        kuv = jnp.asarray(rng.uniform(30, W - 30, (2000, 2)), jnp.float32)
        vf = jnp.ones(2000, bool)
        ur0 = kuv[:, 0] - 5.0
        f_sr = jax.jit(lambda: stereo.subpixel_refine(img, img_r, kuv, ur0, vf))
        devtime("subpixel_refine 2000 (adv-index)", f_sr)

        lvl = jnp.zeros(2000, jnp.int32)
        d_l = jnp.asarray(rng.integers(0, 2 ** 32, (2000, 8), dtype=np.uint32))
        d_r = jnp.asarray(rng.integers(0, 2 ** 32, (2000, 8), dtype=np.uint32))
        f_ms = jax.jit(lambda: stereo.match_stereo(
            kuv, lvl, d_l, vf, kuv, lvl, d_r, vf, sf,
            jnp.float32(386.14), jnp.float32(0.537)))
        devtime("match_stereo 2000x2000", f_ms)

        from tc2li_slam_tpu.slam import tracking
        f_bf = lambda: tracking.build_frame(img, img_r, cam, sf,
                                            n_features=2000, n_levels=8)
        devtime("build_frame total", f_bf, n=5)

    if "track" in groups:
        print("--- track pieces (L=32768, F=2000)", flush=True)
        L, F = 32768, 2000
        d1 = jnp.asarray(rng.integers(0, 2 ** 32, (L, 8), dtype=np.uint32))
        d2 = jnp.asarray(rng.integers(0, 2 ** 32, (F, 8), dtype=np.uint32))
        f_h = jax.jit(matching.hamming_matrix)
        devtime("hamming_matrix 32768x2000", lambda: f_h(d1, d2))

        dist = f_h(d1, d2)
        _fetch(dist)
        mask = jnp.asarray(rng.random((L, F)) < 0.01)
        _fetch(mask)

        f_tk = jax.jit(lambda d, m: matching._masked_best2(d, m))
        devtime("masked_best2 (top_k k=2)", lambda: f_tk(dist, mask))

        def best2_min(d, m):
            BIG = jnp.int32(1 << 20)
            dm = jnp.where(m, d, BIG)
            best = jnp.min(dm, axis=1)
            idx = jnp.argmin(dm, axis=1)
            dm2 = jnp.where(
                jnp.arange(d.shape[1])[None, :] == idx[:, None], BIG, dm)
            second = jnp.min(dm2, axis=1)
            return idx, best, second

        f_bm = jax.jit(best2_min)
        devtime("masked_best2 (min/argmin)", lambda: f_bm(dist, mask))

        def best2_key(d, m):
            # pack dist<<16 | col into one int32; single min reduction
            BIGK = jnp.int32(0x7FFFFFFF)
            col = jnp.arange(d.shape[1], dtype=jnp.int32)[None, :]
            key = jnp.where(m, (d << 16) | col, BIGK)
            k1 = jnp.min(key, axis=1)
            best = k1 >> 16
            idx = k1 & 0xFFFF
            key2 = jnp.where(key == k1[:, None], BIGK, key)
            second = jnp.min(key2, axis=1) >> 16
            return idx, best, second

        f_bk = jax.jit(best2_key)
        devtime("masked_best2 (packed-key min)", lambda: f_bk(dist, mask))

        uvp = jnp.asarray(rng.uniform(0, W, (L, 2)), jnp.float32)
        kuv = jnp.asarray(rng.uniform(0, W, (F, 2)), jnp.float32)
        lvm = jnp.zeros(L, jnp.int32)
        lvf = jnp.zeros(F, jnp.int32)
        vm_ = jnp.ones(L, bool)
        vf = jnp.ones(F, bool)
        rad = jnp.full(L, 15.0)
        f_sp = jax.jit(lambda: matching.search_by_projection(
            uvp, lvm, d1, vm_, kuv, lvf, d2, vf, rad))
        devtime("search_by_projection (current)", f_sp)

        from tc2li_slam_tpu.slam import mapstate, tracking
        m = mapstate.create(max_kf=256, max_feats=2000, max_lm=L, max_obs=8)
        frame_xy = kuv
        frame = tracking.Frame(
            xy=frame_xy,
            uvr=jnp.concatenate([frame_xy, jnp.full((F, 1), -1.0)], -1),
            depth=jnp.asarray(rng.uniform(1, 40, F), jnp.float32),
            level=lvf,
            angle=jnp.zeros(F),
            desc=d2,
            valid=vf,
        )
        key = jax.random.PRNGKey(0)
        f_ts = lambda: tracking.track_step(
            m, frame, jnp.eye(4), jnp.eye(4), key, cam, sf, sf ** 2,
            jnp.float32(15.0))
        devtime("track_step total", f_ts, n=5)
        f_uf = jax.jit(lambda: tracking.update_found_counters(
            m, jnp.zeros(F, jnp.int32), jnp.eye(4), cam, jnp.bool_(True)))
        devtime("update_found_counters", f_uf)

    if "kf" in groups:
        print("--- keyframe event pieces", flush=True)
        from tc2li_slam_tpu.slam import mapstate, tracking, culling
        from tc2li_slam_tpu.ops import voxel_map, pointcloud
        L, F = 32768, 2000
        m = mapstate.create(max_kf=256, max_feats=F, max_lm=L, max_obs=8)
        kuv = jnp.asarray(rng.uniform(30, W - 30, (F, 2)), jnp.float32)
        d2 = jnp.asarray(rng.integers(0, 2 ** 32, (F, 8), dtype=np.uint32))
        frame = tracking.Frame(
            xy=kuv,
            uvr=jnp.concatenate([kuv, jnp.full((F, 1), -1.0)], -1),
            depth=jnp.asarray(rng.uniform(1, 40, F), jnp.float32),
            level=jnp.zeros(F, jnp.int32),
            angle=jnp.zeros(F),
            desc=d2,
            valid=jnp.ones(F, bool),
        )
        f_ne = jax.jit(lambda: tracking.near_existing_landmark(
            m, frame, jnp.eye(4), cam, jnp.float32(4.0), jnp.float32(0.15)))
        devtime("near_existing_landmark [2000x32k]", f_ne)
        f_ak = jax.jit(lambda: mapstate.add_keyframe(
            m, jnp.eye(4), jnp.float32(0.0), frame.xy, frame.uvr,
            frame.level, frame.angle, frame.desc, frame.valid,
            jnp.full((F,), mapstate.NO_LM, jnp.int32)))
        devtime("add_keyframe", f_ak)
        pos = jnp.asarray(rng.uniform(-40, 40, (F, 3)), jnp.float32)
        nrm = jnp.zeros((F, 3))
        f_al = jax.jit(lambda: mapstate.add_landmarks(
            m, jnp.int32(0), jnp.arange(F, dtype=jnp.int32), pos, d2,
            nrm, jnp.ones((F, 2)), jnp.ones(F, bool)))
        devtime("add_landmarks", f_al)
        f_us = jax.jit(mapstate.update_landmark_stats)
        devtime("update_landmark_stats", lambda: f_us(m))
        f_fu = jax.jit(lambda: culling.fuse_into_keyframe(
            m, jnp.int32(0), cam, sf))
        devtime("fuse_into_keyframe", f_fu)
        f_kr = jax.jit(culling.keyframe_redundancy)
        devtime("keyframe_redundancy", lambda: f_kr(m))
        f_cl = jax.jit(lambda: culling.cull_landmarks(m, jnp.int32(0)))
        devtime("cull_landmarks", f_cl)

        cap = 1 << 19
        vm = voxel_map.create(cap, 0.5)
        pts = jnp.asarray(rng.uniform(-80, 80, (1 << 17, 3)), jnp.float32)
        val = jnp.ones(1 << 17, bool)
        vm = voxel_map.insert(vm, pts, val)
        _fetch(vm.keys)
        pts2 = jnp.asarray(rng.uniform(-80, 80, (1 << 17, 3)), jnp.float32)
        f_pp = jax.jit(lambda: pointcloud.preprocess(
            pts2, jnp.zeros(1 << 17), val, 2.0))
        devtime("preprocess 131k", f_pp)
        f_vd = jax.jit(lambda: pointcloud.voxel_downsample(pts2, val, 0.5))
        devtime("voxel_downsample 131k", f_vd)
        ds, dsv = pointcloud.voxel_downsample(pts2, val, 0.5)
        ds32, dsv32 = ds[: 1 << 15], dsv[: 1 << 15]
        _fetch(ds32)
        devtime("insert 32k into 2^19 map",
                lambda: voxel_map.insert(vm, ds32, dsv32), n=5)
        q = jnp.asarray(rng.uniform(-40, 40, (F, 3)), jnp.float32)
        devtime("knn 2000q k=5 radius=3",
                lambda: voxel_map.knn(vm, q, k=5, radius=3), n=5)
        from tc2li_slam_tpu.solver import balm as balm_mod
        kf_pts = jnp.asarray(rng.uniform(-40, 40, (6, 2048, 3)), jnp.float32)
        kf_val = jnp.ones((6, 2048), bool)
        T = jnp.tile(jnp.eye(4)[None], (6, 1, 1))
        devtime("balm.build_clusters 6x2048",
                lambda: balm_mod.build_clusters(
                    kf_pts, kf_val, T, voxel_size=1.0, max_voxels=512,
                    min_points=15), n=5)


if __name__ == "__main__":
    main()
