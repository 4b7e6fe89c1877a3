"""LOAM-style scan feature extraction (ops.scan_features): planar walls ->
surf, depth discontinuities -> edge, blind region dropped, decimation."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.ops import scan_features as sf


def ring_scene(rng, n=720):
    """One azimuth ring in a square room (4 flat walls, half-extent 10 m)
    with a thin pole at ~4 m: mostly planar returns + sharp range jumps at
    the pole edges."""
    ang = np.linspace(-np.pi, np.pi, n, endpoint=False)
    d = np.stack([np.cos(ang), np.sin(ang)], -1)
    # distance to the unit square walls scaled to 10 m
    t_wall = 10.0 / np.maximum(np.abs(d[:, 0]), np.abs(d[:, 1]))
    rng_w = t_wall + rng.normal(0, 0.003, n)
    # thin pole: TWO noisy returns at ~4 m (too few/rough for any plane or
    # small-plane rule — the classic LOAM corner target)
    pole = np.abs(ang - 0.7) < 2.2 * np.pi / n
    r = np.where(pole, 4.0 + rng.normal(0, 0.03, n), rng_w)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(n)], -1)
    return pts.astype(np.float32), pole


def test_walls_are_surf_pole_is_edge(rng):
    pts, pole = ring_scene(rng)
    out = sf.extract_features(jnp.asarray(pts), jnp.ones(len(pts), bool),
                              blind=1.0, point_filter_num=1)
    plane = np.asarray(out.plane)
    edge = np.asarray(out.edge)
    # wall interior (away from pole and room corners) is overwhelmingly planar
    ang = np.linspace(-np.pi, np.pi, len(pts), endpoint=False)
    corner = np.min(np.abs((ang[:, None] - np.array([-3, -1, 1, 3])
                            * np.pi / 4 + np.pi) % (2 * np.pi) - np.pi),
                    axis=1) < 0.1
    interior = ~pole & ~corner
    # exclude the pole's occlusion margin
    for s in range(-8, 9):
        interior &= ~np.roll(pole, s)
    assert plane[interior].mean() > 0.9, plane[interior].mean()
    # the pole boundary produces edge points nearby
    near_pole_edge = np.zeros(len(pts), bool)
    for s in range(-3, 4):
        near_pole_edge |= np.roll(
            np.abs(np.diff(np.r_[pole.astype(int), pole[0]])) > 0, s)
    assert edge[near_pole_edge].sum() >= 2
    # no edge labels deep inside flat walls
    assert edge[interior].mean() < 0.02


def test_blind_and_decimation(rng):
    pts, _ = ring_scene(rng)
    pts[:50] *= 0.05 / np.linalg.norm(pts[:50], axis=-1, keepdims=True)
    out = sf.extract_features(jnp.asarray(pts), jnp.ones(len(pts), bool),
                              blind=1.0, point_filter_num=2)
    surf = np.asarray(out.surf)
    plane = np.asarray(out.plane)
    assert not surf[:50].any() and not plane[:50].any()  # blind dropped
    # decimation keeps roughly half of the planar points
    assert 0.3 * plane.sum() < surf.sum() <= 0.6 * plane.sum() + 1


def test_rings_vmap(rng):
    pts, _ = ring_scene(rng, n=360)
    stack = jnp.asarray(np.stack([pts, pts]))
    v = jnp.ones((2, 360), bool)
    out = sf.extract_features_rings(stack, v, blind=1.0, point_filter_num=2)
    a, b = np.asarray(out.surf[0]), np.asarray(out.surf[1])
    np.testing.assert_array_equal(a, b)
    assert a.sum() > 50
