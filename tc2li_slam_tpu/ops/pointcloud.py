"""LiDAR scan preprocessing: blind cut, decimation, voxel downsample.

Replaces ``Preprocess::process`` (``lidar_front_end/preprocess.cpp``) and the
PCL ``VoxelGrid`` filters the reference applies before EKF update / map insert
(``LidarFrontEnd.cpp:712-714``). The reference's optional LOAM-style
edge/plane extraction is OFF in all shipped KITTI configs
(``feature_extract_enable=0``) and therefore not modeled.

All ops take fixed-size point buffers with validity masks (scans are padded to
a static max size by the loader).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("point_filter_num",))
def preprocess(
    points: jax.Array,       # [N, 3] sensor-frame points (padded)
    times: jax.Array,        # [N] per-point relative time (s, scan start = 0)
    valid: jax.Array,        # [N]
    blind: float = 4.0,
    point_filter_num: int = 1,
) -> jax.Array:
    """Apply blind-radius cut + 1-in-k decimation; returns updated validity.

    Mirrors ``velodyne_handler`` (``preprocess.cpp``): drop points closer than
    ``blind`` meters and keep every ``point_filter_num``-th point.
    """
    del times
    r2 = jnp.sum(points * points, axis=-1)
    keep = valid & (r2 > blind * blind)
    if point_filter_num > 1:
        idx = jnp.arange(points.shape[0])
        keep &= (idx % point_filter_num) == 0
    return keep


@jax.jit
def voxel_downsample(
    points: jax.Array,  # [N, 3]
    valid: jax.Array,   # [N]
    voxel_size,
) -> tuple[jax.Array, jax.Array]:
    """Centroid voxel downsample (PCL VoxelGrid semantics), static shape.

    Returns (points [N, 3], valid [N]) where each occupied voxel contributes
    one centroid, compacted to the front of the buffer.
    """
    vs = jnp.asarray(voxel_size, points.dtype)
    mins = jnp.min(jnp.where(valid[:, None], points, jnp.inf), axis=0)
    idx = jnp.floor((points - mins) / vs).astype(jnp.int32)
    idx = jnp.clip(idx, 0, (1 << 20) - 1)
    # 21-bit packing overflows int32; use a sort over two int32 lanes via
    # a single key from 10-bit chunks is too small for raw scans. Instead
    # sort by a 30-bit key of clipped 10-bit indices relative to scan min —
    # scans span <= 200m, voxels >= 0.2m -> < 1024 per axis holds on KITTI.
    idx10 = jnp.clip(idx, 0, 1023)
    key = (idx10[:, 0] << 20) | (idx10[:, 1] << 10) | idx10[:, 2]
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(valid, key, big)

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = points[order]
    valid_s = key_s != big

    # Segment boundaries: first occurrence of each key.
    is_head = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]])
    is_head &= valid_s
    seg_id = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # [N], -1 before first
    seg_id = jnp.clip(seg_id, 0, points.shape[0] - 1)

    N = points.shape[0]
    sums = jnp.zeros((N, 3), points.dtype).at[seg_id].add(
        jnp.where(valid_s[:, None], pts_s, 0.0)
    )
    counts = jnp.zeros((N,), jnp.int32).at[seg_id].add(valid_s.astype(jnp.int32))
    out_valid = counts > 0
    centroids = sums / jnp.maximum(counts, 1)[:, None]
    return centroids, out_valid
