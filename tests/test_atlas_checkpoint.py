"""Tests: atlas multi-map recovery + checkpoint/resume roundtrip."""

import numpy as np
import jax.numpy as jnp
import pytest

from tc2li_slam_tpu.io import synthetic as syn
from tc2li_slam_tpu.slam import checkpoint, config as cfg_mod, system as sys_mod


@pytest.fixture(scope="module")
def seq():
    cam = syn.SMALL
    frames, world, traj = syn.generate_sequence(
        n_frames=10, cam=cam, seed=3, n_scan=2048,
        traj=syn.Trajectory(w_body=(0, 0, 0.02), v_world=(1.2, 0.0, 0.0)),
    )
    return cam, frames


def _cfg(cam, lidar=True, **tr):
    kwargs = dict(max_kf=32, max_lm=4096, max_obs=6, kf_max_interval=4,
                  local_window=4, ba_iters=4)
    kwargs.update(tr)
    return cfg_mod.SystemConfig(
        camera=cfg_mod.CameraConfig(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height, baseline=cam.baseline,
            th_depth=35.0 * cam.baseline,
        ),
        orb=cfg_mod.OrbConfig(n_features=512, n_levels=4),
        lidar=cfg_mod.LidarConfig(
            enabled=lidar, map_capacity=1 << 15, kf_points=256,
            balm_max_voxels=128, T_cl=np.linalg.inv(syn.body_from_cam()),
        ),
        tracking=cfg_mod.TrackingConfig(**kwargs),
    )


def test_checkpoint_roundtrip(seq, tmp_path):
    cam, frames = seq
    cfg = _cfg(cam)
    slam = sys_mod.System(cfg)
    for fr in frames[:6]:
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_system(slam, p)
    slam2 = checkpoint.load_system(p, cfg)
    np.testing.assert_allclose(
        np.asarray(slam2.T_cw), np.asarray(slam.T_cw), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(slam2.map.lm_pos), np.asarray(slam.map.lm_pos), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(slam2.vmap.keys), np.asarray(slam.vmap.keys)
    )
    assert slam2.n_kf_host == slam.n_kf_host
    assert slam2.frame_idx == slam.frame_idx
    assert slam2.state == slam.state

    # resumed system continues tracking and matches the uninterrupted run
    for fr in frames[6:]:
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
        slam2.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
    np.testing.assert_allclose(
        np.asarray(slam2.T_cw), np.asarray(slam.T_cw), atol=1e-4
    )


def test_checkpoint_vocab_guard(seq, tmp_path):
    cam, frames = seq
    cfg = _cfg(cam, lidar=False)
    from tc2li_slam_tpu.ops import bow

    rng = np.random.default_rng(0)
    descs = rng.integers(0, 2**32, (512, 8), dtype=np.uint32)
    voc = bow.train_vocabulary(descs, k=4, depth=3)
    slam = sys_mod.System(cfg, voc)
    for fr in frames[:3]:
        slam.track(fr.img_l, fr.img_r, fr.t)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_system(slam, p)
    # wrong vocabulary -> rejected (MD5 guard)
    voc_other = bow.train_vocabulary(
        rng.integers(0, 2**32, (512, 8), dtype=np.uint32), k=4, depth=3
    )
    with pytest.raises(ValueError, match="checksum"):
        checkpoint.load_system(p, cfg, voc_other)
    # right vocabulary -> loads
    slam2 = checkpoint.load_system(p, cfg, voc)
    assert slam2.n_kf_host == slam.n_kf_host


def test_atlas_recovery(seq):
    cam, frames = seq
    cfg = _cfg(cam, lidar=False, recently_lost_frames=3, atlas_min_kf=2)
    slam = sys_mod.System(cfg)
    for fr in frames[:7]:
        slam.track(fr.img_l, fr.img_r, fr.t)
    kfs_before = slam.n_kf_host
    assert kfs_before >= 2
    # blackout: untrackable noise frames force RECENTLY_LOST -> new map
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 255, frames[0].img_l.shape, dtype=np.uint8)
    for i in range(5):
        T = slam.track(noise, noise, 100.0 + 0.1 * i)
        assert np.isfinite(np.asarray(T)).all()
    assert slam.atlas.n_created >= 2
    assert len(slam.atlas.frozen) >= 1          # old map preserved
    assert slam.atlas.frozen[0].n_kf == kfs_before
    # re-initializes into the new map on structured input
    for fr in frames[7:]:
        slam.track(fr.img_l, fr.img_r, fr.t + 200.0)
    est = slam.trajectory_world_from_cam()
    assert np.isfinite(est).all()
    assert est.shape[0] == len(slam.traj)


def test_atlas_discards_tiny_map(seq):
    cam, frames = seq
    cfg = _cfg(cam, lidar=False, recently_lost_frames=2, atlas_min_kf=10)
    slam = sys_mod.System(cfg)
    for fr in frames[:4]:
        slam.track(fr.img_l, fr.img_r, fr.t)
    rng = np.random.default_rng(2)
    noise = rng.integers(0, 255, frames[0].img_l.shape, dtype=np.uint8)
    for i in range(4):
        slam.track(noise, noise, 50.0 + 0.1 * i)
    # small map (< atlas_min_kf KFs) must be discarded, not frozen
    assert slam.atlas.n_discarded >= 1
    assert len(slam.atlas.frozen) == 0
