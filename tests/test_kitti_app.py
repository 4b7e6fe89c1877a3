"""KITTI app layer end-to-end: synthesize a sequence in the odometry
benchmark's on-disk layout, run examples/run_kitti.py on it, check the
trajectories and evaluation output. Exercises the loader, the native
velodyne decode/prefetch path, and the runner (reference flow:
camera_lidar.cc + System::SaveTrajectoryKITTI)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tc2li_slam_tpu.io import kitti, synthetic as syn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_kitti_sequence(root, seq="99", n_frames=10, n_scan=4096):
    """Materialize a synthetic sequence in KITTI odometry layout."""
    import cv2
    cam = syn.SMALL
    frames, world, traj = syn.generate_sequence(
        n_frames=n_frames, cam=cam, seed=0, n_scan=n_scan,
    )
    seq_dir = os.path.join(root, "sequences", seq)
    for sub in ("image_0", "image_1", "velodyne"):
        os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)

    T_bc = syn.body_from_cam()
    T_cb = np.linalg.inv(T_bc)
    times, gt_rows = [], []
    T_wc0_inv = None
    for i, fr in enumerate(frames):
        cv2.imwrite(os.path.join(seq_dir, "image_0", f"{i:06d}.png"), fr.img_l)
        cv2.imwrite(os.path.join(seq_dir, "image_1", f"{i:06d}.png"), fr.img_r)
        # velodyne .bin: [N, 4] float32 (x y z reflectance), LiDAR frame =
        # body frame here (Tr = cam0 <- velo = T_cb)
        pts = fr.scan[fr.scan_valid]
        arr = np.concatenate([pts, np.ones((len(pts), 1))], -1).astype(np.float32)
        arr.tofile(os.path.join(seq_dir, "velodyne", f"{i:06d}.bin"))
        times.append(fr.t)
        # GT poses: T_w_cam0 rows, world anchored at first camera
        T_wc = fr.T_wb_gt @ T_bc
        if T_wc0_inv is None:
            T_wc0_inv = np.linalg.inv(T_wc)
        gt_rows.append((T_wc0_inv @ T_wc)[:3, :4].reshape(-1))

    np.savetxt(os.path.join(seq_dir, "times.txt"), np.asarray(times))
    np.savetxt(os.path.join(root, "poses", f"{seq}.txt"), np.stack(gt_rows))
    fx, fy, cx, cy, b = cam.fx, cam.fy, cam.cx, cam.cy, cam.baseline
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        P = f"{fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0"
        f.write(f"P0: {P}\n")
        f.write(f"P1: {fx} 0 {cx} {-fx * b} 0 {fy} {cy} 0 0 0 1 0\n")
        tr = " ".join(str(v) for v in T_cb[:3, :4].reshape(-1))
        f.write(f"Tr: {tr}\n")
    return seq_dir


@pytest.mark.slow
def test_run_kitti_end_to_end(tmp_path):
    root = str(tmp_path / "kitti")
    write_kitti_sequence(root, n_frames=10)

    # loader sanity
    seq = kitti.KittiSequence(root, "99", n_scan=4096)
    assert len(seq) == 10
    calib = seq.calib
    assert abs(calib.baseline - syn.SMALL.baseline) < 1e-6
    fr = seq.frame(0)
    assert fr["img_l"].shape == (syn.SMALL.height, syn.SMALL.width)
    assert fr["scan_valid"].sum() > 1000

    out = str(tmp_path / "results")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1").strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_kitti.py"),
         "--root", root, "--seq", "99", "--out", out,
         "--features", "512", "--n-scan", "4096", "--max-kf", "64",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["frames"] == 10
    assert result["ate_rmse_m"] < 0.5, result
    # trajectory files exist and parse
    traj = np.loadtxt(os.path.join(out, "99.txt"))
    assert traj.shape == (10, 12)
    tum = np.loadtxt(os.path.join(out, "99_tum.txt"))
    assert tum.shape == (10, 8)
