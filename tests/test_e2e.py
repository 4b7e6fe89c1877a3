"""End-to-end: full STEREO_LIDAR pipeline on a synthetic sequence with ATE
assertion (the SURVEY §7.3 minimum slice: ORB -> stereo -> track -> KF ->
stereo landmarks -> local BA w/ BALM -> trajectory)."""

import numpy as np
import pytest

from tc2li_slam_tpu.io import synthetic as syn
from tc2li_slam_tpu.slam import config as cfg_mod, system as sys_mod


def small_cfg(lidar=True):
    cam = syn.SMALL
    return cfg_mod.SystemConfig(
        camera=cfg_mod.CameraConfig(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height, baseline=cam.baseline,
            th_depth=17.5,  # 35 x baseline, the reference's ThDepth rule
        ),
        orb=cfg_mod.OrbConfig(n_features=512, n_levels=4),
        lidar=cfg_mod.LidarConfig(
            enabled=lidar, map_capacity=1 << 16, kf_points=512,
            balm_max_voxels=256, scan_voxel=0.4, map_voxel=0.4, blind=1.0,
            w_lba=0.01,
            # synthetic scans are in the body frame; camera-from-lidar =
            # camera-from-body = inv(body_from_cam)
            T_cl=np.linalg.inv(syn.body_from_cam()),
        ),
        tracking=cfg_mod.TrackingConfig(
            max_kf=64, max_lm=8192, max_obs=8, kf_max_interval=5,
            local_window=6, ba_iters=6, min_inliers=25,
        ),
    )


def run_sequence(n_frames=20, lidar=True, seed=0):
    frames, world, traj = syn.generate_sequence(
        n_frames=n_frames, cam=syn.SMALL, seed=seed, n_scan=2048,
    )
    cfg = small_cfg(lidar)
    slam = sys_mod.System(cfg)
    T_bc = syn.body_from_cam()
    est, gt = [], []
    for fr in frames:
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
        gt.append(fr.T_wb_gt @ T_bc)  # gt world-from-camera
    est = slam.trajectory_world_from_cam()
    return slam, est, np.stack(gt)


@pytest.mark.slow
def test_e2e_stereo_lidar_ate():
    slam, est, gt = run_sequence(n_frames=20, lidar=True)
    assert slam.state == sys_mod.TrackingState.OK
    assert int(slam.map.n_kf) >= 3
    assert int(slam.map.n_lm) > 80
    ate = syn.ate_rmse(est, gt)
    assert ate < 0.15, f"ATE {ate:.3f} m"


@pytest.mark.slow
def test_e2e_stereo_only_ate():
    slam, est, gt = run_sequence(n_frames=12, lidar=False)
    ate = syn.ate_rmse(est, gt)
    assert ate < 0.15, f"ATE {ate:.3f} m"


@pytest.mark.slow
def test_e2e_trajectory_io(tmp_path):
    slam, est, gt = run_sequence(n_frames=8, lidar=False)
    kitti = tmp_path / "kitti.txt"
    tum = tmp_path / "tum.txt"
    slam.save_trajectory_kitti(str(kitti))
    slam.save_trajectory_tum(str(tum))
    from tc2li_slam_tpu.slam import trajectory as tr
    loaded = tr.load_kitti(str(kitti))
    assert loaded.shape == est.shape
    np.testing.assert_allclose(loaded[:, :3, :], est[:, :3, :], rtol=1e-5, atol=1e-6)
    lines = tum.read_text().strip().splitlines()
    assert len(lines) == len(est) and len(lines[0].split()) == 8


@pytest.mark.slow
def test_local_ba_compiles_once():
    """Regression: round 1 passed a fresh extra_fn closure per keyframe as a
    static jit arg, recompiling the local BA XLA program on EVERY BA
    keyframe. The BALM term must enter as data (tree_util.Partial), keeping
    one cache entry across keyframes."""
    from tc2li_slam_tpu.solver import lm as lm_mod
    before = lm_mod.local_ba._cache_size()
    slam, est, gt = run_sequence(n_frames=20, lidar=True)
    n_ba_kf = max(int(slam.map.n_kf) - 2, 0)  # BA runs from the 3rd KF on
    assert n_ba_kf >= 2, "sequence must exercise several BA keyframes"
    assert lm_mod.local_ba._cache_size() - before <= 1
