"""Tests: reference-format settings loading + trajectory evaluation."""

import numpy as np
import pytest

from tc2li_slam_tpu.slam import evaluate, settings


SETTINGS_YAML = """%YAML:1.0
#File.version: 1.0
Camera.type: "PinHole"
Camera.fx: 707.0912
Camera.fy: 707.0912
Camera.cx: 601.8873
Camera.cy: 183.1104
Camera.width: 1226
Camera.height: 370
Camera.fps: 10.0
Camera.bf: 379.8145
ThDepth: 40.0
Tbc: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [ -0.0010886,-0.0085120,0.9999632,1.1438987,
          -0.9999764,-0.0067777,-0.0011463,-0.3127184,
          0.0067872,-0.9999408,-0.0085044,0.7265461,
          0.0, 0.0, 0.0, 1.0 ]
IMU.NoiseGyro: 1.6968e-04
IMU.NoiseAcc: 2.0000e-3
IMU.GyroWalk: 0.003491
IMU.AccWalk: 5.0000e-3
IMU.Frequency: 100
loopClosing: 0
LiDAR.enabled: 1
LiDAR.wLBA: 0.01
Tcl: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [ 7.027555e-03, -9.999753e-01, 2.599616e-05, -7.137748e-03,-2.254837e-03, -4.184312e-05, -9.999975e-01, -7.482656e-02,9.999728e-01, 7.027479e-03, -2.255075e-03, -3.336324e-01,0.0, 0.0, 0.0, 1.0 ]
ORBextractor.nFeatures: 2000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 12
ORBextractor.minThFAST: 7
"""

ROSPARAM_YAML = """
preprocess:
  scan_line: 64
  blind: 2
mapping:
  det_range: 100.0
  extrinsic_T: [ 0.81, -0.30, 0.80 ]
"""


@pytest.fixture
def settings_file(tmp_path):
    p = tmp_path / "kitti.yaml"
    p.write_text(SETTINGS_YAML)
    return str(p)


@pytest.fixture
def rosparam_file(tmp_path):
    p = tmp_path / "lidar.yaml"
    p.write_text(ROSPARAM_YAML)
    return str(p)


def test_parse_opencv_yaml(settings_file):
    d = settings.parse_opencv_yaml(settings_file)
    assert d["Camera.fx"] == pytest.approx(707.0912)
    assert d["Camera.type"] == "PinHole"
    assert d["ORBextractor.nFeatures"] == 2000
    assert d["IMU.NoiseGyro"] == pytest.approx(1.6968e-4)
    assert d["Tcl"].shape == (4, 4)
    assert d["Tcl"][3, 3] == 1.0
    assert d["Tbc"].shape == (4, 4)
    # rotation block of Tcl must be a rotation
    R = d["Tcl"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_load_settings(settings_file, rosparam_file):
    cfg = settings.load_settings(settings_file, rosparam_file)
    assert cfg.camera.fx == pytest.approx(707.0912)
    assert cfg.camera.baseline == pytest.approx(379.8145 / 707.0912)
    assert cfg.camera.th_depth == pytest.approx(40.0 * 379.8145 / 707.0912)
    assert cfg.orb.n_features == 2000
    assert cfg.orb.ini_th_fast == 12
    assert cfg.lidar.enabled
    assert cfg.lidar.w_lba == pytest.approx(0.01)
    assert cfg.lidar.blind == pytest.approx(2.0)
    assert cfg.lidar.det_range == pytest.approx(100.0)
    assert cfg.use_imu  # IMU block + Tbc present
    assert not cfg.loop_closing
    assert cfg.imu.T_bc[0, 2] == pytest.approx(0.9999632)


def test_load_settings_overrides(settings_file):
    cfg = settings.load_settings(
        settings_file, tracking=dict(max_kf=64), use_imu=False
    )
    assert cfg.tracking.max_kf == 64
    assert not cfg.use_imu


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def _circle_traj(n=200, r=50.0):
    th = np.linspace(0, 2 * np.pi, n)
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, 0, 3] = r * np.cos(th)
    T[:, 1, 3] = r * np.sin(th)
    for i, a in enumerate(th):
        c, s = np.cos(a), np.sin(a)
        T[i, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return T


def test_ate_zero_for_rigid_transform():
    gt = _circle_traj()
    # arbitrary rigid transform of the whole trajectory
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    M = np.eye(4)
    M[:3, :3] = Rz
    M[:3, 3] = [5.0, -3.0, 2.0]
    est = np.einsum("ij,njk->nik", M, gt)
    assert evaluate.ate_rmse(est, gt) < 1e-5


def test_ate_known_noise():
    gt = _circle_traj()
    rng = np.random.default_rng(0)
    est = gt.copy()
    est[:, :3, 3] += rng.normal(0, 0.1, (len(gt), 3))
    a = evaluate.ate_rmse(est, gt)
    assert 0.05 < a < 0.3


def test_sim3_alignment_removes_scale():
    gt = _circle_traj()
    est = gt.copy()
    est[:, :3, 3] *= 1.3  # pure scale error
    assert evaluate.ate_rmse(est, gt, with_scale=True) < 1e-5
    assert evaluate.ate_rmse(est, gt, with_scale=False) > 1.0


def test_kitti_rpe_perfect():
    gt = _circle_traj(400, r=100.0)  # circumference ~628m > segments
    t_err, r_err = evaluate.kitti_rpe(gt, gt)
    assert t_err == pytest.approx(0.0, abs=1e-9)
    assert r_err == pytest.approx(0.0, abs=1e-9)


def test_kitti_rpe_drift():
    gt = _circle_traj(400, r=100.0)
    est = gt.copy()
    # 1% along-track drift: scale positions by 1.01
    est[:, :3, 3] *= 1.01
    t_err, _ = evaluate.kitti_rpe(est, gt)
    assert 0.005 < t_err < 0.02


def test_evaluate_summary():
    gt = _circle_traj()
    out = evaluate.evaluate(gt, gt)
    assert out["ate_rmse_m"] == pytest.approx(0.0, abs=1e-9)
    assert out["n_frames"] == len(gt)
