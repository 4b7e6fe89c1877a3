"""Benchmark: tracked frames/sec/chip on the full SLAM pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's real-time rate (10 Hz sensor rate on CPU — it has
no published throughput beyond running real time; BASELINE.md). Runs on
whatever backend jax selects (the real TPU chip under the driver; set
BENCH_PLATFORM=cpu to force CPU when verifying locally).

The workload mirrors the KITTI configuration: KITTI-sized stereo pair
(1241x376), 2000 ORB features, 8 pyramid levels, LiDAR scan in the loop.
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

    n_frames = int(os.environ.get("BENCH_FRAMES", "12"))
    n_warm = 3

    cam = syn.KITTI_LIKE
    cfg = cfg_mod.SystemConfig(
        camera=cfg_mod.CameraConfig(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height, baseline=cam.baseline,
            th_depth=35.0 * cam.baseline,
        ),
        orb=cfg_mod.OrbConfig(n_features=2000, n_levels=8),
        lidar=cfg_mod.LidarConfig(
            enabled=True, map_capacity=1 << 18, kf_points=1024,
            balm_max_voxels=512, scan_voxel=0.5, map_voxel=0.5, blind=2.0,
            T_cl=np.linalg.inv(syn.body_from_cam()),
        ),
        tracking=cfg_mod.TrackingConfig(
            max_kf=128, max_lm=16384, max_obs=8, kf_max_interval=5,
            local_window=6, ba_iters=6,
        ),
    )

    frames, world, traj = syn.generate_sequence(
        n_frames=n_frames + n_warm, cam=cam, seed=0, n_scan=8192,
        traj=syn.Trajectory(w_body=(0, 0, 0.03), v_world=(1.5, 0.1, 0.0)),
    )

    slam = sys_mod.System(cfg)
    # warmup: compile everything (first frames hit all code paths)
    for fr in frames[:n_warm]:
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)

    t0 = time.perf_counter()
    for fr in frames[n_warm:]:
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    baseline_fps = 10.0  # reference real-time sensor rate
    print(json.dumps({
        "metric": "tracked frames/sec/chip (stereo+LiDAR, KITTI-scale synthetic)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
