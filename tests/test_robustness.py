"""Failure-detection guards: timestamp jump, bad IMU, localization-only
(Tracking.cc:1919-1946, LocalMapping.cc:144-154, System::ActivateLocalizationMode)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from tc2li_slam_tpu.io import synthetic as syn
from tc2li_slam_tpu.slam import system as sys_mod
from tests.test_e2e import small_cfg
from tests.test_imu_mode import imu_cfg


@pytest.mark.slow
def test_timestamp_jump_starts_new_map():
    frames, world, traj = syn.generate_sequence(
        n_frames=16, cam=syn.SMALL, seed=0, n_scan=2048,
    )
    slam = sys_mod.System(small_cfg(True))
    for i, fr in enumerate(frames):
        t = fr.t + (100.0 if i >= 8 else 0.0)   # 100 s gap at frame 8
        slam.track(fr.img_l, fr.img_r, t, fr.scan, fr.scan_valid)
    # the pre-jump map was frozen (or discarded if too small) and a new one
    # started; tracking recovered in the new map
    assert slam.map_id >= 1
    assert slam.state == sys_mod.TrackingState.OK
    est = slam.trajectory_world_from_cam()
    assert np.isfinite(est).all()


@pytest.mark.slow
def test_bad_imu_resets_inertial_stack():
    cfg = dataclasses.replace(imu_cfg(), inertial_ba=False)
    frames, world, traj = syn.generate_sequence(
        n_frames=14, cam=syn.SMALL, seed=3, n_scan=2048,
    )
    slam = sys_mod.System(cfg)
    for i, fr in enumerate(frames):
        gyro = fr.gyro.copy()
        if i == 7:
            gyro[:] = np.nan   # corrupted IMU packet
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid,
                   gyro=gyro, acc=fr.acc, imu_dts=fr.imu_dts,
                   imu_trel=fr.imu_trel, scan_times=fr.scan_times)
        if i == 7:
            assert not slam._imu_initialized, "bad-IMU reset did not fire"
    # visual tracking survived, the filter re-initialized afterwards
    assert slam.state == sys_mod.TrackingState.OK
    assert slam._imu_initialized
    assert bool(jnp.all(jnp.isfinite(slam.filt.x.pos)))
    est = slam.trajectory_world_from_cam()
    assert np.isfinite(est).all()


@pytest.mark.slow
def test_localization_only_freezes_map():
    frames, world, traj = syn.generate_sequence(
        n_frames=16, cam=syn.SMALL, seed=0, n_scan=2048,
    )
    slam = sys_mod.System(small_cfg(True))
    for fr in frames[:8]:
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
    n_kf = slam.n_kf_host
    n_lm = int(slam.map.n_lm)
    slam.activate_localization_mode(True)
    for fr in frames[8:]:
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
    assert slam.state == sys_mod.TrackingState.OK
    assert slam.n_kf_host == n_kf, "keyframes created in localization mode"
    assert int(slam.map.n_lm) == n_lm, "landmarks created in localization mode"
