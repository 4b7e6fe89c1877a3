"""Run the TPU SLAM system on a KITTI odometry sequence.

The app layer the reference implements as ROS nodes
(``src/examples/camera_lidar.cc`` / ``camera_lidar_inertial.cc``: subscribe
topics -> System::TrackStereoLidar -> SaveTrajectoryKITTI): here it reads the
odometry benchmark layout directly (no rosbags), prefetches velodyne scans on
native threads, tracks every frame, writes KITTI- and TUM-format
trajectories, and evaluates ATE/RPE against ground truth when available.

    python examples/run_kitti.py --root /data/kitti_odometry --seq 04 \
        --out results/04 [--frames N] [--no-lidar] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_config(calib, args):
    from tc2li_slam_tpu.slam import config as cfg_mod

    # camera-from-lidar: calib.txt's Tr is velo->cam0
    return cfg_mod.SystemConfig(
        camera=cfg_mod.CameraConfig(
            fx=calib.fx, fy=calib.fy, cx=calib.cx, cy=calib.cy,
            baseline=calib.baseline, th_depth=35.0 * calib.baseline,
        ),
        orb=cfg_mod.OrbConfig(n_features=args.features, n_levels=8),
        lidar=cfg_mod.LidarConfig(
            enabled=not args.no_lidar, map_capacity=1 << 19, kf_points=2048,
            balm_max_voxels=512, scan_voxel=0.5, map_voxel=0.5, blind=2.0,
            det_range=100.0, w_lba=args.w_lba, T_cl=calib.T_cam_velo,
        ),
        tracking=cfg_mod.TrackingConfig(
            max_kf=args.max_kf, max_lm=1 << 15, max_obs=8,
            kf_max_interval=5, local_window=6, ba_iters=6,
        ),
        profile=True,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="KITTI odometry root")
    ap.add_argument("--seq", required=True, help="sequence id, e.g. 04")
    ap.add_argument("--out", default="results", help="output directory")
    ap.add_argument("--frames", type=int, default=0, help="frame limit (0=all)")
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--max-kf", type=int, default=2048)
    ap.add_argument("--w-lba", type=float, default=0.01)
    ap.add_argument("--no-lidar", action="store_true")
    ap.add_argument("--n-scan", type=int, default=1 << 17)
    ap.add_argument("--platform", default=None, help="jax platform override")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tc2li_slam_tpu.io import kitti, native
    from tc2li_slam_tpu.slam import evaluate, system as sys_mod

    seq = kitti.KittiSequence(args.root, args.seq, n_scan=args.n_scan)
    cfg = build_config(seq.calib, args)
    slam = sys_mod.System(cfg)

    n = len(seq) if args.frames <= 0 else min(args.frames, len(seq))
    scan_paths = [
        os.path.join(seq.seq_dir, "velodyne", f"{i:06d}.bin") for i in range(n)
    ]
    pre = native.ScanPrefetcher(scan_paths, n_max=args.n_scan)

    t0 = time.perf_counter()
    for i in range(n):
        img_l = kitti.load_image(seq.seq_dir, 0, i)
        img_r = kitti.load_image(seq.seq_dir, 1, i)
        if cfg.lidar.enabled:
            scan, stimes, svalid, _ = pre.get(i)
        else:
            scan = svalid = None
        slam.track(img_l, img_r, float(seq.times[i]), scan, svalid)
        if i % 100 == 0:
            print(f"frame {i}/{n} state={slam.state} kf={slam.n_kf_host}",
                  file=sys.stderr)
    wall = time.perf_counter() - t0
    pre.close()

    os.makedirs(args.out, exist_ok=True)
    kitti_path = os.path.join(args.out, f"{args.seq}.txt")
    tum_path = os.path.join(args.out, f"{args.seq}_tum.txt")
    slam.save_trajectory_kitti(kitti_path)
    slam.save_trajectory_tum(tum_path)

    result = {
        "seq": args.seq, "frames": n, "fps": round(n / wall, 3),
        "keyframes": slam.n_kf_host, "trajectory": kitti_path,
    }
    if seq.gt is not None:
        est = slam.trajectory_world_from_cam()
        gt = seq.gt[:n]
        ev = evaluate.evaluate(est, gt)
        result["ate_rmse_m"] = round(ev["ate_rmse_m"], 4)
        result["kitti_t_err_pct"] = round(ev["kitti_t_err_pct"], 3)
        result["kitti_r_err_deg_per_m"] = round(ev["kitti_r_err_deg_per_m"], 5)
    print(json.dumps(result))
    print(slam.timers.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
