"""System-level relocalization: lose tracking by frame teleport, recover via
BoW + PnP (Tracking::Relocalization pipeline)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tc2li_slam_tpu.io import synthetic as syn
from tc2li_slam_tpu.ops import bow, orb
from tc2li_slam_tpu.slam import system as sys_mod
from tests.test_e2e import small_cfg


def train_voc_from_frames(frames, n=4):
    descs = []
    for fr in frames[:n]:
        kp = orb.extract(jnp.asarray(fr.img_l), n_features=512, n_levels=4)
        d = np.asarray(kp.desc)[np.asarray(kp.valid)]
        descs.append(d)
    return bow.train_vocabulary(np.concatenate(descs), k=6, depth=3, seed=0)


@pytest.mark.slow
def test_relocalization_recovers_from_teleport():
    frames, world, traj = syn.generate_sequence(
        n_frames=12, cam=syn.SMALL, seed=0, n_scan=2048,
    )
    voc = train_voc_from_frames(frames)
    slam = sys_mod.System(small_cfg(True), voc=voc)

    # build the map on the first 8 frames
    for fr in frames[:8]:
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
    assert slam.state == sys_mod.TrackingState.OK
    T_before = slam.T_cw.copy()

    # corrupt the motion model hard (simulated tracking loss: the prediction
    # points far away, guided + global matching must fail or reloc must win)
    from tc2li_slam_tpu.geom import lie
    slam.velocity = jnp.asarray(
        np.asarray(lie.se3_exp(jnp.asarray(
            [30.0, 20.0, -15.0, 0.6, -0.8, 0.9], dtype=jnp.float32))))

    # revisit frame 5's viewpoint: the system should re-acquire
    fr = frames[5]
    slam.track(fr.img_l, fr.img_r, 0.9, fr.scan, fr.scan_valid)
    assert slam.state == sys_mod.TrackingState.OK, "did not recover"
    # recovered pose must be near frame 5's tracked pose (same viewpoint)
    T_bc = syn.body_from_cam()
    T0g = frames[0].T_wb_gt @ T_bc
    gt_cw = np.linalg.inv(frames[5].T_wb_gt @ T_bc) @ T0g
    err = np.linalg.norm(np.asarray(slam.T_cw)[:3, 3] - gt_cw[:3, 3])
    assert err < 0.3, f"recovered pose err {err:.3f} m"
