"""On-chip fetch-barrier timing of the keyframe-event pieces at bench shapes.

The r4 sync-stage attribution says the keyframe event is local_ba (~500 ms/
event) + keyframe-creation chain (~350 ms/event) + cull; this probe breaks
those down kernel by kernel with realistic shapes/occupancy so the
optimization targets the right sub-piece.

Run: python tools/prof_kf_event.py [ba kf cull]
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


def make_map(rng, K=256, F=2000, L=32768, n_kf=23, n_lm=2300, Ko=8):
    """Structurally valid MapState at bench occupancy."""
    from tc2li_slam_tpu.slam import mapstate
    m = mapstate.create(max_kf=K, max_feats=F, max_lm=L, max_obs=Ko)
    kf_T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(n_kf):
        kf_T[k, :3, 3] = [0.1 * k, 0.02 * k, 0.0]
    lm_pos = np.zeros((L, 3), np.float32)
    lm_pos[:n_lm] = np.stack([
        rng.uniform(-30, 30, n_lm), rng.uniform(-10, 10, n_lm),
        rng.uniform(2, 60, n_lm)], -1)
    lm_valid = np.zeros(L, bool)
    lm_valid[:n_lm] = True
    obs_kf = np.full((L, Ko), mapstate.NO_KF, np.int32)
    obs_ft = np.zeros((L, Ko), np.int32)
    for i in range(n_lm):
        n_o = rng.integers(2, 6)
        obs_kf[i, :n_o] = rng.integers(0, n_kf, n_o)
        obs_ft[i, :n_o] = rng.integers(0, F, n_o)
    feat_lm = np.full((K, F), mapstate.NO_LM, np.int32)
    for k in range(n_kf):
        sel = rng.choice(F, 900, replace=False)
        feat_lm[k, sel] = rng.integers(0, n_lm, 900)
    m = m._replace(
        kf_T_cw=jnp.asarray(kf_T),
        kf_valid=jnp.zeros(K, bool).at[:n_kf].set(True),
        kf_xy=jnp.asarray(rng.uniform(0, 1200, (K, F, 2)), jnp.float32),
        kf_uvr=jnp.asarray(rng.uniform(0, 1200, (K, F, 3)), jnp.float32),
        kf_level=jnp.zeros((K, F), jnp.int32),
        kf_desc=jnp.asarray(
            rng.integers(0, 2 ** 32, (K, F, 8), dtype=np.uint32)),
        kf_feat_valid=jnp.ones((K, F), bool),
        kf_feat_lm=jnp.asarray(feat_lm),
        lm_pos=jnp.asarray(lm_pos),
        lm_desc=jnp.asarray(
            rng.integers(0, 2 ** 32, (L, 8), dtype=np.uint32)),
        lm_normal=jnp.asarray(rng.normal(size=(L, 3)), jnp.float32),
        lm_dist=jnp.asarray(
            np.stack([np.full(L, 1.0), np.full(L, 80.0)], -1), jnp.float32),
        lm_valid=jnp.asarray(lm_valid),
        lm_obs_kf=jnp.asarray(obs_kf),
        lm_obs_feat=jnp.asarray(obs_ft),
        lm_n_obs=jnp.asarray((obs_kf != mapstate.NO_KF).sum(1), jnp.int32),
        lm_first_kf=jnp.asarray(rng.integers(0, n_kf, L), jnp.int32),
        n_kf=jnp.asarray(n_kf, jnp.int32),
        n_lm=jnp.asarray(n_lm, jnp.int32),
    )
    return m


def main():
    groups = set(sys.argv[1:]) or {"ba", "kf", "cull"}
    rng = np.random.default_rng(0)
    from tc2li_slam_tpu.geom import camera as cam_mod
    from tc2li_slam_tpu.slam import culling, local_mapping, mapstate, tracking
    from tc2li_slam_tpu.ops import voxel_map

    cam = cam_mod.Pinhole.create(718.856, 718.856, 607.19, 185.2, bf=386.14,
                                 width=1241, height=376)
    sf = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
    s2 = sf * sf
    m = make_map(rng)
    _fetch(m.lm_pos)
    kf_id = 22
    T_cl = jnp.eye(4)

    store = local_mapping.LidarStore.create(256, 2048)
    pts = rng.uniform(-40, 40, (256, 2048, 3)).astype(np.float32)
    store = store._replace(
        points=jnp.asarray(pts),
        valid=jnp.zeros((256, 2048), bool).at[:23].set(True),
    )
    window = list(range(kf_id - 5, kf_id + 1)) + []
    fixed = [True] + [False] * 5

    if "ba" in groups:
        print("--- local BA (per event)", flush=True)
        def ba(w_lba, iters, max_active):
            return local_mapping.run_local_ba(
                m, store, kf_id, cam, s2, T_cl, n_window=6,
                balm_window=6, balm_voxel=1.0, balm_max_voxels=512,
                balm_min_points=15, w_lba=w_lba, iters=iters, n_kf=23,
                window=window, fixed=fixed, max_active=max_active,
            )
        devtime("run_local_ba w_lba=.01 iters=6 active=8192",
                lambda: ba(0.01, 6, 8192), n=3)
        devtime("run_local_ba w_lba=0   iters=6 active=8192",
                lambda: ba(0.0, 6, 8192), n=3)
        devtime("run_local_ba w_lba=.01 iters=2 active=8192",
                lambda: ba(0.01, 2, 8192), n=3)
        devtime("run_local_ba w_lba=.01 iters=6 active=4096",
                lambda: ba(0.01, 6, 4096), n=3)
        devtime("run_local_ba w_lba=.01 iters=6 active=2048",
                lambda: ba(0.01, 6, 2048), n=3)
        from tc2li_slam_tpu.solver import balm as balm_mod
        T6 = jnp.tile(jnp.eye(4)[None], (6, 1, 1))
        cl = balm_mod.build_clusters(
            store.points[jnp.asarray(window)], store.valid[jnp.asarray(window)],
            T6, voxel_size=1.0, max_voxels=512, min_points=15)
        _fetch(cl)
        devtime("balm.build_clusters 6x2048", lambda: balm_mod.build_clusters(
            store.points[jnp.asarray(window)],
            store.valid[jnp.asarray(window)], T6,
            voxel_size=1.0, max_voxels=512, min_points=15))
        devtime("balm.quadratic 512vox x6", lambda: balm_mod.quadratic(cl, T6))

    if "kf" in groups:
        print("--- keyframe creation chain (per event)", flush=True)
        F = 2000
        kuv = jnp.asarray(rng.uniform(30, 1200, (F, 2)), jnp.float32)
        frame = tracking.Frame(
            xy=kuv,
            uvr=jnp.concatenate([kuv, jnp.full((F, 1), -1.0)], -1),
            depth=jnp.asarray(rng.uniform(1, 40, F), jnp.float32),
            level=jnp.zeros(F, jnp.int32),
            angle=jnp.zeros(F),
            desc=jnp.asarray(rng.integers(0, 2 ** 32, (F, 8), dtype=np.uint32)),
            valid=jnp.ones(F, bool),
        )
        feat_lm = jnp.full((F,), mapstate.NO_LM, jnp.int32)
        devtime("add_keyframe", lambda: mapstate.add_keyframe(
            m, jnp.eye(4), jnp.float32(0.0), frame.xy, frame.uvr, frame.level,
            frame.angle, frame.desc, frame.valid, feat_lm))
        devtime("stereo_landmark_candidates",
                lambda: tracking.stereo_landmark_candidates(
                    frame, jnp.eye(4), cam, feat_lm, jnp.float32(35.0), sf))
        devtime("near_existing_landmark 2000x32k",
                lambda: tracking.near_existing_landmark(
                    m, frame, jnp.eye(4), cam, jnp.float32(4.0),
                    jnp.float32(0.15)))
        pos = jnp.asarray(rng.uniform(-40, 40, (F, 3)), jnp.float32)
        devtime("add_landmarks", lambda: mapstate.add_landmarks(
            m, jnp.int32(kf_id), jnp.arange(F, dtype=jnp.int32), pos,
            frame.desc, jnp.zeros((F, 3)), jnp.ones((F, 2)),
            jnp.zeros(F, bool).at[:300].set(True)))
        vm = voxel_map.create(1 << 19, 0.5)
        scan = jnp.asarray(rng.uniform(-60, 60, (1 << 17, 3)), jnp.float32)
        sval = jnp.ones(1 << 17, bool)
        vm = voxel_map.insert(vm, scan, sval)
        _fetch(vm.keys)
        from tc2li_slam_tpu.slam import lio
        from tc2li_slam_tpu.ops import plane_fit as pf
        lcfg = lio.LioConfig(scan_voxel=0.5, map_voxel=0.5, blind=2.0)
        devtime("plane-gate knn 512 r2 + fit", lambda: voxel_map.knn(
            vm, pos[:512], k=5, radius=2))
        devtime("store_kf_lidar: preprocess+ds+select 131k", lambda: (
            lio.select_plane_features(
                vm, scan[: 1 << 15], sval[: 1 << 15], jnp.eye(4), lcfg)))
        staged = lio.camera_scan_stage(
            scan, sval, jnp.eye(4), T_cl, jnp.float32(2.0), jnp.float32(0.5))
        _fetch(staged)
        p4 = jnp.concatenate([staged[0]] * 4)
        v4 = jnp.concatenate([staged[1]] * 4)
        devtime("lidar flush insert 4x32k -> 512k pool",
                lambda: lio.camera_map_flush(vm, p4, v4, jnp.zeros(3)), n=3)
        devtime("camera_scan_stage 131k", lambda: lio.camera_scan_stage(
            scan, sval, jnp.eye(4), T_cl, jnp.float32(2.0), jnp.float32(0.5)))
        from tc2li_slam_tpu.slam import triangulation
        devtime("create_new_map_points 3 pairs",
                lambda: triangulation.create_new_map_points(
                    m, kf_id, [21, 20, 19], cam, s2, sf, max_pairs=3), n=2)
        devtime("fuse_into_keyframe", lambda: culling.fuse_into_keyframe(
            m, jnp.int32(kf_id), cam, sf))
        devtime("update_landmark_stats",
                lambda: mapstate.update_landmark_stats(m))
        devtime("top_covisible", lambda: mapstate.top_covisible(
            m, jnp.int32(kf_id), 5, min_weight=10))

    if "cull" in groups:
        print("--- cull (per event)", flush=True)
        devtime("cull_landmarks", lambda: culling.cull_landmarks(
            m, jnp.int32(kf_id)))
        devtime("keyframe_redundancy", lambda: culling.keyframe_redundancy(m))
        pm = jnp.zeros(256, bool)
        devtime("cull_keyframes (full unjitted path)",
                lambda: culling.cull_keyframes(m, pm, 0.9))
        devtime("remove_keyframes", lambda: culling.remove_keyframes(
            m, jnp.zeros(256, bool).at[3].set(True)))


if __name__ == "__main__":
    main()
