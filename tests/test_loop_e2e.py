"""Loop closing end-to-end: a circular trajectory revisits its start; the
detected loop + Sim3 pose graph must reduce accumulated drift
(the capability BASELINE targets for KITTI 00-02; the covisibility-group
candidate gating follows KeyFrameDatabase::DetectLoopCandidates)."""

import dataclasses

import numpy as np
import pytest

from tc2li_slam_tpu.io import synthetic as syn
from tc2li_slam_tpu.ops import bow
from tc2li_slam_tpu.slam import config as cfg_mod, system as sys_mod
from tests.test_e2e import small_cfg


def inject_drift(slam, W):
    """Simulate accumulated odometric drift as a gauge jump: the RECENT map
    segment (last 8 KFs + the landmarks they first observed) and the live
    pose move to a drifted world gauge W, exactly the state a stretch of
    degraded dead-reckoned odometry leaves behind. Pre-event map entries
    keep the old gauge, so the revisit carries a real loop error for the
    Sim3 verification + pose graph to correct."""
    import jax.numpy as jnp
    from tc2li_slam_tpu.geom import lie

    slam.flush_mapping()   # deferred mapping must land in the old gauge
    W = jnp.asarray(W, jnp.float32)
    W_inv = lie.se3_inverse(W)
    cut = max(slam.n_kf_host - 8, 1)
    m = slam.map
    K = m.kf_T_cw.shape[0]
    recent_kf = (jnp.arange(K) >= cut) & m.kf_valid
    kf_T = jnp.where(recent_kf[:, None, None], m.kf_T_cw @ W_inv, m.kf_T_cw)
    lm_recent = (m.lm_first_kf >= cut) & m.lm_valid
    lm_pos = jnp.where(lm_recent[:, None],
                       lie.se3_apply(W, m.lm_pos), m.lm_pos)
    slam.map = m._replace(kf_T_cw=kf_T, lm_pos=lm_pos)
    slam.T_cw = slam.T_cw @ W_inv
    slam.last_T_cw = slam.last_T_cw @ W_inv


def run_circle(loop_closing: bool, n_frames=140, seed=0, drift_at=None,
               drift_xi=None):
    # radius 4 m, period 12.57 s -> 140 frames cover ~1.1 revolutions so the
    # platform genuinely revisits its start (a too-slow circle never closes
    # physically and every BoW candidate is a texture alias)
    traj = syn.CircleTrajectory(omega=0.5, speed=2.0)
    frames, world, _ = syn.generate_sequence(
        n_frames=n_frames, cam=syn.SMALL, seed=seed, n_scan=2048, traj=traj,
    )
    cfg = small_cfg(lidar=False)
    cfg = dataclasses.replace(
        cfg, loop_closing=loop_closing, loop_min_gap=15, loop_min_kf=18,
        tracking=dataclasses.replace(
            cfg.tracking, kf_max_interval=3, max_kf=128,
        ),
    )
    descs = []
    for fr in frames[::5]:
        from tc2li_slam_tpu.slam import tracking
        import jax.numpy as jnp
        f = tracking.build_frame(
            jnp.asarray(fr.img_l), jnp.asarray(fr.img_r),
            _cam_of(cfg), jnp.asarray(cfg.orb.scale_factors(), jnp.float32),
            n_features=cfg.orb.n_features, n_levels=cfg.orb.n_levels,
        )
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    # k=8 depth=4 -> up to 4096 words: a 216-word toy vocabulary saturates
    # (every KF pair shares ~90% of its words) and candidate ranking
    # degenerates to noise on this repetitive synthetic corridor
    voc = bow.train_vocabulary(np.concatenate(descs), k=8, depth=4, seed=0)

    slam = sys_mod.System(cfg, voc=voc)
    T_bc = syn.body_from_cam()
    gt = []
    for k, fr in enumerate(frames):
        if drift_at is not None:
            # incremental gauge drift over [drift_at, drift_end): the way
            # real odometric error accumulates (a ramp, not a step)
            a, b = drift_at if isinstance(drift_at, tuple) else (
                drift_at, drift_at + 1)
            if a <= k < b:
                from tc2li_slam_tpu.geom import lie
                xi = np.asarray(drift_xi, np.float32) / (b - a)
                inject_drift(slam, lie.se3_exp(xi))
        slam.track(fr.img_l, fr.img_r, fr.t, fr.scan, fr.scan_valid)
        gt.append(fr.T_wb_gt @ T_bc)
    est = slam.trajectory_world_from_cam()
    ate = syn.ate_rmse(est, np.stack(gt))
    return slam, ate


def _cam_of(cfg):
    from tc2li_slam_tpu.geom import camera as cam_mod
    c = cfg.camera
    return cam_mod.Pinhole.create(c.fx, c.fy, c.cx, c.cy, bf=c.bf)


@pytest.mark.slow
def test_loop_closure_end_to_end():
    """A loop is detected (covisibility-group BoW gating), geometrically
    verified (3D-3D RANSAC) and closed (Sim3 pose graph) on a revisiting
    trajectory; the correction keeps the trajectory in the same accuracy
    class. On this drift-free synthetic the closure cannot IMPROVE much
    (odometry ATE is already ~4 cm over 56 m); the drift-correction math
    itself is asserted quantitatively in test_sim3_loop/test_loop_closing."""
    slam_off, ate_off = run_circle(False)
    slam_on, ate_on = run_circle(True)
    assert getattr(slam_on, "n_loops_closed", 0) >= 1, "no loop was closed"
    assert getattr(slam_off, "n_loops_closed", 0) == 0
    assert ate_on < max(1.6 * ate_off, 0.09), (ate_on, ate_off)


@pytest.mark.slow
def test_loop_closure_reduces_injected_drift():
    """VERDICT r3 weak #5 done-criterion: on a DRIFTY revisit, closing the
    loop must cut ATE — not merely keep it in class. Drift is injected as a
    mid-run gauge jump of the recent map segment (~35 cm + ~3.4 deg yaw —
    the state a degraded odometry stretch leaves behind); without closure
    the whole return leg carries it, with closure the Sim3-verified loop +
    pose graph pulls the drifted segment back onto the start."""
    XI = (0.25, 0.0, 0.12, 0.0, 0.06, 0.0)
    slam_off, ate_off = run_circle(False, drift_at=60, drift_xi=XI)
    slam_on, ate_on = run_circle(True, drift_at=60, drift_xi=XI)
    assert getattr(slam_on, "n_loops_closed", 0) >= 1, "no loop was closed"
    assert ate_off > 0.10, f"drift injection too weak ({ate_off:.3f})"
    assert ate_on < 0.5 * ate_off, (
        f"closure did not reduce drift: on {ate_on:.3f} vs off {ate_off:.3f}"
    )
