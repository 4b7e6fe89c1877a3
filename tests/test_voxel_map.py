"""Voxel map (ikd-tree replacement): insert/kNN/evict/recenter vs numpy
brute-force oracles."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.ops import voxel_map, plane_fit, pointcloud


def make_map(capacity=4096, voxel=0.5):
    return voxel_map.create(capacity, voxel)


def test_insert_and_count(rng):
    m = make_map()
    pts = rng.uniform(-20, 20, size=(512, 3)).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(512, bool))
    n = int(m.count)
    # One point per 0.5m voxel: duplicates collapse.
    keys = np.floor(pts / 0.5).astype(np.int64)
    uniq = len(np.unique(keys[:, 0] * 10**10 + keys[:, 1] * 10**5 + keys[:, 2]))
    assert n == uniq
    # Keys stay sorted with EMPTY at tail.
    k = np.asarray(m.keys)
    assert np.all(np.diff(k.astype(np.int64)) >= 0)


def test_insert_existing_voxel_keeps_old_point(rng):
    m = make_map()
    p1 = np.array([[1.01, 1.01, 1.01]], np.float32)
    p2 = np.array([[1.02, 1.02, 1.02]], np.float32)  # same 0.5m voxel
    m = voxel_map.insert(m, jnp.asarray(p1), jnp.ones(1, bool))
    m = voxel_map.insert(m, jnp.asarray(p2), jnp.ones(1, bool))
    assert int(m.count) == 1
    stored = np.asarray(m.points[0])
    np.testing.assert_allclose(stored, p1[0])


def test_knn_matches_bruteforce(rng):
    m = make_map(capacity=8192)
    pts = rng.uniform(-10, 10, size=(2048, 3)).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    stored = np.asarray(m.points)[: int(m.count)]

    q = rng.uniform(-9, 9, size=(64, 3)).astype(np.float32)
    dists, nbrs, valid = voxel_map.knn(m, jnp.asarray(q), k=5, radius=1)
    dists, nbrs, valid = map(np.asarray, (dists, nbrs, valid))

    for i in range(len(q)):
        d_all = np.linalg.norm(stored - q[i], axis=-1)
        # Brute-force neighbors, but only those within the 3x3x3 voxel
        # neighborhood are discoverable — cap comparison at the voxel reach.
        reach = 0.5  # voxel_size: any point within this is definitely in range
        d_sorted = np.sort(d_all)
        for j in range(5):
            if valid[i, j] and d_sorted[j] < reach:
                assert abs(dists[i, j] - d_sorted[j]) < 1e-4


def test_knn_finds_exact_neighbors_in_plane(rng):
    # Regular grid plane: every query's 5-NN are the surrounding grid points.
    xs, ys = np.meshgrid(np.arange(-5, 5, 0.5), np.arange(-5, 5, 0.5))
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1).astype(np.float32)
    m = make_map(capacity=1024)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    q = jnp.asarray([[0.26, 0.26, 0.1]], dtype=jnp.float32)
    dists, nbrs, valid = voxel_map.knn(m, q, k=5)
    assert bool(np.all(np.asarray(valid)))
    assert float(np.max(np.asarray(dists))) < 1.0


def test_evict_outside_box(rng):
    m = make_map()
    pts = rng.uniform(-20, 20, size=(256, 3)).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(256, bool))
    m2 = voxel_map.evict_outside_box(m, jnp.zeros(3, jnp.float32), 5.0)
    stored = np.asarray(m2.points)[: int(m2.count)]
    assert np.all(np.abs(stored) <= 5.0 + 1e-5)
    k = np.asarray(m2.keys)
    assert np.all(np.diff(k.astype(np.int64)) >= 0)


def test_recenter_preserves_points(rng):
    m = make_map(voxel=0.5)
    pts = rng.uniform(-10, 10, size=(128, 3)).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(128, bool))
    n0 = int(m.count)
    m2 = voxel_map.recenter(m, jnp.asarray([50.0, 0.0, 0.0], jnp.float32))
    assert int(m2.count) == n0
    # All original points still queryable.
    d, _, v = voxel_map.knn(m2, jnp.asarray(pts[:16]), k=1)
    assert bool(np.all(np.asarray(v)[:, 0]))
    assert float(np.max(np.asarray(d)[:, 0])) < 1e-3


def test_needs_recenter():
    m = make_map(voxel=0.5)  # grid spans 512m, centered at origin
    assert not bool(voxel_map.needs_recenter(m, jnp.zeros(3), 100.0))
    assert bool(
        voxel_map.needs_recenter(m, jnp.asarray([200.0, 0.0, 0.0]), 100.0)
    )


def test_plane_fit_exact(rng):
    n_true = np.array([0.0, 0.0, 1.0], np.float32)
    d_true = -2.0  # plane z = 2
    xy = rng.uniform(-1, 1, size=(16, 5, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.full((16, 5, 1), 2.0, np.float32)], axis=-1)
    normals, d, ok = plane_fit.fit_planes(jnp.asarray(pts), jnp.ones((16, 5), bool))
    normals, d, ok = map(np.asarray, (normals, d, ok))
    assert ok.all()
    for i in range(16):
        s = np.sign(normals[i, 2])
        np.testing.assert_allclose(normals[i] * s, n_true, atol=1e-3)
        np.testing.assert_allclose(d[i] * s, d_true, atol=1e-2)


def test_plane_fit_rejects_nonplanar(rng):
    pts = rng.uniform(-1, 1, size=(8, 5, 3)).astype(np.float32) * 5
    _, _, ok = plane_fit.fit_planes(jnp.asarray(pts), jnp.ones((8, 5), bool), threshold=0.05)
    assert not np.asarray(ok).all()


def test_point_to_plane_residual():
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    d = jnp.asarray([-2.0], jnp.float32)
    p = jnp.asarray([[0.0, 0.0, 2.5]], jnp.float32)
    r = np.asarray(plane_fit.point_to_plane(p, n, d))
    np.testing.assert_allclose(r, [0.5], atol=1e-6)


def test_voxel_downsample(rng):
    pts = rng.uniform(0, 10, size=(1024, 3)).astype(np.float32)
    valid = np.ones(1024, bool)
    out, ov = pointcloud.voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 1.0)
    out, ov = np.asarray(out), np.asarray(ov)
    n = ov.sum()
    mins = pts.min(axis=0)
    uniq = len(
        np.unique(np.floor(pts - mins).astype(np.int64).dot([10**8, 10**4, 1]))
    )
    assert n == uniq
    # Centroids stay within their voxel bounds (loose check).
    assert np.all(out[ov] >= -0.5) and np.all(out[ov] <= 10.5)


def test_preprocess_blind_and_decimate(rng):
    pts = rng.uniform(-10, 10, size=(512, 3)).astype(np.float32)
    t = np.zeros(512, np.float32)
    keep = pointcloud.preprocess(
        jnp.asarray(pts), jnp.asarray(t), jnp.ones(512, bool), blind=4.0, point_filter_num=2
    )
    keep = np.asarray(keep)
    r = np.linalg.norm(pts, axis=-1)
    assert np.all(r[keep] > 4.0)
    assert np.all(np.nonzero(keep)[0] % 2 == 0)
