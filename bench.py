"""Benchmark: tracked frames/sec/chip on the full SLAM pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline = the reference's real-time rate (10 Hz sensor rate on CPU — it has
no published throughput beyond running real time; BASELINE.md). The north
star is >= 3x that (30 fps/chip). Runs on whatever backend jax selects (the
real TPU chip under the driver; set BENCH_PLATFORM=cpu to force CPU when
verifying locally).

KITTI-shaped workload (per VERDICT r1: the 12-frame / 8k-point round-1 bench
was not representative):
- KITTI-sized stereo pair (1241 x 376), 2000 ORB features, 8 levels
- full-size LiDAR scans (131,072-point pad — KITTI HDL-64E scans are ~120k)
- 100 measured frames past a 10-frame warmup (compile + map bootstrap)
- steady-state map occupancy (keyframes + landmarks + voxel map grown in)
- per-stage host-time breakdown (REGISTER_TIMES analog) in the JSON extras
"""

import json
import os
import sys
import time

import numpy as np


def main():
    if os.environ.get("BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax  # noqa: F811

    from tc2li_slam_tpu.io import synthetic as syn
    from tc2li_slam_tpu.slam import config as cfg_mod, system as sys_mod

    n_frames = int(os.environ.get("BENCH_FRAMES", "100"))
    n_warm = int(os.environ.get("BENCH_WARMUP", "10"))
    n_scan = int(os.environ.get("BENCH_SCAN", str(1 << 17)))  # 131072

    cam = syn.KITTI_LIKE
    cfg = cfg_mod.SystemConfig(
        camera=cfg_mod.CameraConfig(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height, baseline=cam.baseline,
            th_depth=35.0 * cam.baseline,
        ),
        orb=cfg_mod.OrbConfig(n_features=2000, n_levels=8),
        lidar=cfg_mod.LidarConfig(
            enabled=True, map_capacity=1 << 19, kf_points=2048,
            balm_max_voxels=512, scan_voxel=0.5, map_voxel=0.5, blind=2.0,
            T_cl=np.linalg.inv(syn.body_from_cam()),
        ),
        tracking=cfg_mod.TrackingConfig(
            max_kf=256, max_lm=32768, max_obs=8, kf_max_interval=5,
            local_window=6, ba_iters=6,
        ),
        profile=True,
    )

    t_gen0 = time.perf_counter()
    rng = np.random.default_rng(0)
    world = syn.make_world(rng, n_surf=300_000)
    frames, world, traj = syn.generate_sequence(
        n_frames=n_frames + n_warm, cam=cam, seed=0, n_scan=n_scan,
        world=world,
        traj=syn.Trajectory(w_body=(0, 0, 0.03), v_world=(1.5, 0.1, 0.0)),
    )
    # int16-quantize scans (loader-side, like the native prefetcher would):
    # halves the tunnel H2D bytes at 4 mm resolution
    quant = cfg.lidar.scan_quant
    scans_q = [np.clip(np.round(fr.scan / quant), -32767, 32767).astype(np.int16)
               for fr in frames]
    t_gen = time.perf_counter() - t_gen0

    slam = sys_mod.System(cfg)
    # warmup: compile everything (first frames hit all code paths incl. BA)
    for fr, sq in zip(frames[:n_warm], scans_q[:n_warm]):
        slam.track(fr.img_l, fr.img_r, fr.t, sq, fr.scan_valid)
    slam.timers.reset()  # stage stats = steady state only

    # steady state: prefetch frame k+1's sensor arrays (async H2D) before
    # processing frame k, so the tunnel transfer overlaps device compute —
    # the reference's sensor-callback threads do the same (SURVEY §2.4)
    t0 = time.perf_counter()
    staged = slam.prefetch(frames[n_warm].img_l, frames[n_warm].img_r,
                           scans_q[n_warm], frames[n_warm].scan_valid)
    for i in range(n_warm, len(frames)):
        fr, cur = frames[i], staged
        if i + 1 < len(frames):
            staged = slam.prefetch(frames[i + 1].img_l, frames[i + 1].img_r,
                                   scans_q[i + 1], frames[i + 1].scan_valid)
        slam.track(fr.img_l, fr.img_r, fr.t, scans_q[i], fr.scan_valid,
                   staged=cur)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    baseline_fps = 10.0  # reference real-time sensor rate
    st = slam.timers.stats()
    stages = {
        k: round(v["total_s"] * 1e3 / n_frames, 2)  # amortized ms per frame
        for k, v in sorted(st.items())
    }

    # Effective arithmetic throughput of the descriptor-matching path (the
    # MXU-bound kernel): per frame, track_step runs one [max_lm x F] and two
    # windowed Hamming matrices over 8 x uint32 descriptors (XOR + popcount
    # + accumulate ~ 3 ops per word).
    L, F = cfg.tracking.max_lm, cfg.orb.n_features
    hamming_ops = 3 * L * F * 8 * 3  # 3 passes in track_step
    track_ms = stages.get("track_step", None)
    eff_gops = (hamming_ops / (track_ms * 1e-3) / 1e9) if track_ms else None

    n_kf = int(slam.map.n_kf)
    print(json.dumps({
        "metric": "tracked frames/sec/chip (stereo+LiDAR, KITTI-shaped synthetic)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "frames": n_frames,
        "warmup": n_warm,
        "scan_points": n_scan,
        "orb_features": F,
        "keyframes": n_kf,
        "landmarks": int(slam.map.n_lm),
        "stage_ms_per_frame": stages,
        "hamming_effective_gops": round(eff_gops, 1) if eff_gops else None,
        "datagen_s": round(t_gen, 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    sys.exit(main())
