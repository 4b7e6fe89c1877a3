"""Micro-profiler: per-piece device times for the frame hot path.

Times each jitted piece with representative KITTI shapes (median of reps,
block_until_ready). Run on the real chip:  python tools/microprof.py
Pass group names to restrict:  python tools/microprof.py vision map
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=5):
    # compile
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[len(ts) // 2] * 1e3
    print(f"{name:<44}{ms:>10.2f} ms")
    return ms


def main():
    groups = set(sys.argv[1:]) or {"misc", "vision", "track", "map", "kf"}
    rng = np.random.default_rng(0)
    H, W = 376, 1241
    img_l = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
    img_r = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))

    from tc2li_slam_tpu.ops import matching, orb, pointcloud, stereo, voxel_map
    from tc2li_slam_tpu.geom import camera as cam_mod

    cam = cam_mod.Pinhole.create(718.856, 718.856, 607.19, 185.2, bf=386.14)
    scale_factors = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
    sigma2 = scale_factors ** 2

    if "misc" in groups:
        print("--- misc")
        x = jnp.zeros(())
        jax.block_until_ready(x)
        ts = []
        for _ in range(20):
            t0 = time.perf_counter()
            float(x)  # fetch an already-ready scalar
            ts.append(time.perf_counter() - t0)
        print(f"{'scalar fetch (ready array)':<44}{sorted(ts)[10]*1e3:>10.2f} ms")
        ts = []
        for _ in range(20):
            y = x + 1.0
            t0 = time.perf_counter()
            float(y)  # fetch forcing one tiny dispatch
            ts.append(time.perf_counter() - t0)
        print(f"{'scalar fetch (tiny dispatch)':<44}{sorted(ts)[10]*1e3:>10.2f} ms")

    if "vision" in groups:
        print("--- vision (per level-0 call unless noted)")
        bench("fast_score_raw (pallas)", jax.jit(orb.fast_score_raw), img_l)
        bench("detect_level", jax.jit(orb.detect_level), img_l)
        bench("select_topk_grid k=433",
              jax.jit(lambda s: orb.select_topk_grid(s, 433)),
              orb.detect_level(img_l))
        rows = jnp.asarray(rng.integers(20, H - 20, 433), jnp.int32)
        cols = jnp.asarray(rng.integers(20, W - 20, 433), jnp.int32)
        angles = jnp.asarray(rng.uniform(-3, 3, 433), jnp.float32)
        bench("compute_orientation K=433",
              jax.jit(orb.compute_orientation), img_l, rows, cols)
        bench("gaussian_blur7", jax.jit(orb.gaussian_blur7), img_l)
        bench("compute_descriptors K=433",
              jax.jit(orb.compute_descriptors), img_l, rows, cols, angles)
        bench("resize level1 (1034x313)",
              jax.jit(lambda im: jax.image.resize(im, (313, 1034), "linear")),
              img_l)
        bench("orb.extract 2000x8 (one image)",
              lambda im: orb.extract(im, n_features=2000, n_levels=8), img_l)

        desc_l = jnp.asarray(rng.integers(0, 2**32, (2000, 8), dtype=np.uint32))
        desc_r = jnp.asarray(rng.integers(0, 2**32, (2000, 8), dtype=np.uint32))
        uv_l = jnp.asarray(rng.uniform(0, W, (2000, 2)), jnp.float32)
        uv_r = jnp.asarray(rng.uniform(0, W, (2000, 2)), jnp.float32)
        lvl = jnp.zeros(2000, jnp.int32)
        v = jnp.ones(2000, bool)
        bench("match_stereo 2000x2000",
              jax.jit(lambda: stereo.match_stereo(
                  uv_l, lvl, desc_l, v, uv_r, lvl, desc_r, v,
                  scale_factors, jnp.float32(386.14), jnp.float32(0.537))))
        ur0 = uv_l[:, 0] - 5.0
        bench("subpixel_refine 2000",
              jax.jit(stereo.subpixel_refine), img_l, img_r, uv_l, ur0, v)

        from tc2li_slam_tpu.slam import tracking
        bench("build_frame total",
              lambda: tracking.build_frame(img_l, img_r, cam, scale_factors,
                                           n_features=2000, n_levels=8))

    if "track" in groups:
        print("--- track (L=32768 landmarks, F=2000)")
        L, F = 32768, 2000
        d_map = jnp.asarray(rng.integers(0, 2**32, (L, 8), dtype=np.uint32))
        d_f = jnp.asarray(rng.integers(0, 2**32, (F, 8), dtype=np.uint32))
        bench("hamming_matrix 32768x2000",
              jax.jit(matching.hamming_matrix), d_map, d_f)
        uv_proj = jnp.asarray(rng.uniform(0, W, (L, 2)), jnp.float32)
        kp_uv = jnp.asarray(rng.uniform(0, W, (F, 2)), jnp.float32)
        lvl_m = jnp.zeros(L, jnp.int32)
        lvl_f = jnp.zeros(F, jnp.int32)
        vm = jnp.ones(L, bool)
        vf = jnp.ones(F, bool)
        rad = jnp.full(L, 15.0)
        bench("search_by_projection L=32k",
              jax.jit(lambda: matching.search_by_projection(
                  uv_proj, lvl_m, d_map, vm, kp_uv, lvl_f, d_f, vf, rad)))
        from tc2li_slam_tpu.solver import lm as lm_mod
        X = jnp.asarray(rng.uniform(-20, 20, (F, 3)), jnp.float32)
        uvr = jnp.concatenate([kp_uv, jnp.full((F, 1), -1.0)], -1)
        inv_s2 = jnp.ones(F)
        bench("pose_only_optimize F=2000",
              jax.jit(lambda: lm_mod.pose_only_optimize(
                  cam, jnp.eye(4), X, uvr, inv_s2,
                  jnp.zeros(F, bool), vf)))

    if "map" in groups:
        print("--- voxel map (cap 2^19, scan 131072)")
        N_SCAN = 1 << 17
        cap = 1 << 19
        pts = jnp.asarray(rng.uniform(-80, 80, (N_SCAN, 3)), jnp.float32)
        val = jnp.ones(N_SCAN, bool)
        vm = voxel_map.create(cap, 0.5)
        # pre-populate the map half full
        vm = voxel_map.insert(vm, pts, val)
        pts2 = jnp.asarray(rng.uniform(-80, 80, (N_SCAN, 3)), jnp.float32)
        bench("preprocess 131k", jax.jit(
            lambda p, v: pointcloud.preprocess(p, jnp.zeros(N_SCAN), v, 2.0)),
            pts2, val)
        bench("voxel_downsample 131k",
              jax.jit(lambda p, v: pointcloud.voxel_downsample(p, v, 0.5)),
              pts2, val)
        ds, dsv = pointcloud.voxel_downsample(pts2, val, 0.5)
        ds32, dsv32 = ds[: 1 << 15], dsv[: 1 << 15]
        bench("insert 32k into 2^19 map",
              voxel_map.insert, vm, ds32, dsv32)
        q = jnp.asarray(rng.uniform(-40, 40, (2000, 3)), jnp.float32)
        bench("knn 2000 q, k=5, radius=3 (landmark gate)",
              lambda m, qq: voxel_map.knn(m, qq, k=5, radius=3), vm, q)
        q5 = jnp.asarray(rng.uniform(-40, 40, (30000, 3)), jnp.float32)
        bench("knn 30k q, k=5, radius=1 (lio h-model)",
              lambda m, qq: voxel_map.knn(m, qq, k=5, radius=1), vm, q5)

    if "kf" in groups:
        print("--- keyframe event pieces")
        from tc2li_slam_tpu.slam import mapstate, tracking, culling
        m = mapstate.create(max_kf=256, max_feats=2000, max_lm=32768, max_obs=8)
        frame_xy = jnp.asarray(rng.uniform(0, W, (2000, 2)), jnp.float32)
        frame = tracking.Frame(
            xy=frame_xy,
            uvr=jnp.concatenate([frame_xy, jnp.full((2000, 1), -1.0)], -1),
            depth=jnp.asarray(rng.uniform(1, 40, 2000), jnp.float32),
            level=jnp.zeros(2000, jnp.int32),
            angle=jnp.zeros(2000),
            desc=jnp.asarray(rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)),
            valid=jnp.ones(2000, bool),
        )
        bench("near_existing_landmark [2000x32768]",
              jax.jit(lambda: tracking.near_existing_landmark(
                  m, frame, jnp.eye(4), cam, jnp.float32(4.0),
                  jnp.float32(0.15))))
        bench("add_keyframe",
              jax.jit(lambda: mapstate.add_keyframe(
                  m, jnp.eye(4), jnp.float32(0.0), frame.xy, frame.uvr,
                  frame.level, frame.angle, frame.desc, frame.valid,
                  jnp.full((2000,), mapstate.NO_LM, jnp.int32))))
        bench("update_landmark_stats",
              jax.jit(mapstate.update_landmark_stats), m)
        bench("fuse_into_keyframe",
              jax.jit(lambda: culling.fuse_into_keyframe(
                  m, jnp.int32(0), cam, scale_factors)))
        bench("keyframe_redundancy",
              jax.jit(culling.keyframe_redundancy), m)
        bench("cull_landmarks",
              jax.jit(lambda: culling.cull_landmarks(m, jnp.int32(0))))


if __name__ == "__main__":
    main()
