"""Tests: visualization exporters + stage timers."""

import numpy as np

from tc2li_slam_tpu.slam import profiling, viewer


def test_draw_frame_marks_keypoints():
    img = np.full((64, 96), 100, np.uint8)
    xy = np.array([[20.0, 30.0], [50.0, 10.0], [90.0, 60.0]])
    valid = np.array([True, True, False])
    tracked = np.array([True, False, False])
    out = viewer.draw_frame(img, xy, valid, tracked, state_text="OK")
    assert out.shape == (64, 96, 3)
    # tracked keypoint drawn green at its box corner
    assert tuple(out[30 - 2, 20 - 2]) == (0, 255, 0)
    # untracked drawn blue
    assert tuple(out[10 - 2, 50 - 2]) == (80, 80, 255)
    # invalid keypoint untouched
    assert tuple(out[60 - 2, 90 - 2]) == (100, 100, 100)


def test_save_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    p = tmp_path / "m.ply"
    viewer.save_ply(str(p), pts)
    lines = p.read_text().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex {len(pts)}" in lines[2]
    data = np.loadtxt(lines[lines.index("end_header") + 1:])
    np.testing.assert_allclose(data, pts, atol=1e-3)


def test_stage_timer_stats():
    t = profiling.StageTimer()
    for _ in range(5):
        with t.stage("a"):
            pass
    t.add("b", 0.01)
    s = t.stats()
    assert s["a"]["n"] == 5
    assert s["b"]["mean_ms"] == 10.0
    rep = t.report()
    assert "a" in rep and "b" in rep
    t.reset()
    assert t.stats() == {}


def test_stage_timer_disabled():
    t = profiling.StageTimer(enabled=False)
    with t.stage("x"):
        pass
    assert t.stats() == {}
