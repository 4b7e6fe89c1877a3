"""Native runtime library: velodyne decode, prefetcher, trajectory writer.

Builds the library on demand (g++ is part of the target environment); the
Python fallback paths are exercised for parity either way.
"""

import os
import subprocess

import numpy as np
import pytest

from tc2li_slam_tpu.io import native

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def built():
    if not native.available():
        try:
            subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pytest.skip("native toolchain unavailable")
        native._LIB = None  # force re-probe
    if not native.available():
        pytest.skip("native build failed")
    return True


def make_bins(tmp_path, rng, n_files=3, n_pts=50000):
    paths = []
    for i in range(n_files):
        pts = rng.normal(0, 15, (n_pts, 4)).astype(np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        pts.tofile(p)
        paths.append(p)
    return paths


def test_read_velodyne_native_matches_numpy(built, tmp_path, rng):
    paths = make_bins(tmp_path, rng, 1)
    xyz_n, t_n, v_n, n_n = native.read_velodyne(paths[0], n_max=65536)
    lib = native._LIB
    native._LIB = None
    try:
        xyz_p, t_p, v_p, n_p = native.read_velodyne(paths[0], n_max=65536)
    finally:
        native._LIB = lib
    assert n_n == n_p
    np.testing.assert_allclose(xyz_n[:n_n], xyz_p[:n_p], atol=1e-6)
    np.testing.assert_allclose(t_n[:n_n], t_p[:n_p], atol=1e-6)


def test_read_velodyne_decimates(built, tmp_path, rng):
    paths = make_bins(tmp_path, rng, 1, n_pts=4000)
    xyz, t, v, n = native.read_velodyne(paths[0], n_max=1000)
    assert n == 1000 and v.sum() == 1000
    assert (t[v] >= 0).all() and (t[v] <= 0.1).all()


def test_prefetcher_sequential(built, tmp_path, rng):
    paths = make_bins(tmp_path, rng, 4, n_pts=20000)
    pf = native.ScanPrefetcher(paths, n_max=32768, n_threads=2, ahead=2)
    try:
        for i in range(4):
            xyz, t, v, n = pf.get(i)
            assert n == 20000 and v.sum() == 20000
    finally:
        pf.close()


def test_missing_file_raises(built):
    with pytest.raises(FileNotFoundError):
        native.read_velodyne("/nonexistent/file.bin")


def test_trajectory_writer_roundtrip(built, tmp_path):
    from tc2li_slam_tpu.slam import trajectory
    T = np.tile(np.eye(4, dtype=np.float32), (7, 1, 1))
    T[:, 0, 3] = np.arange(7)
    T[:, 1, 3] = -np.arange(7) * 0.5
    p = str(tmp_path / "traj.txt")
    native.write_kitti_trajectory(p, T)
    back = trajectory.load_kitti(p)
    np.testing.assert_allclose(back, T, atol=1e-6)
