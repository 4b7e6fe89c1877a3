"""Batched k-point plane fitting for point-to-plane residuals.

Replaces ``esti_plane`` (``LidarFrontEnd.cpp:454-482``): the reference solves,
per query point and per ESEKF iteration, the 5x3 least-squares system
``A n = -1`` (plane through k neighbors in Hesse-like form), normalizes, and
validates that every neighbor is within a threshold of the plane. Here the
whole scan's fits run as one batched normal-equation solve (k x 3 -> 3x3
Cholesky) — MXU-friendly, no per-point loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fit_planes(
    neighbors: jax.Array,   # [Q, k, 3] neighbor points
    valid: jax.Array,       # [Q, k] neighbor validity
    threshold: float = 0.1,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fit a plane n·p + d = 0 (|n| = 1) through each neighbor set.

    Returns (normals [Q, 3], d [Q], ok [Q]); ``ok`` requires all valid
    neighbors within ``threshold`` of the plane and a well-conditioned solve —
    the same accept test as the reference (plane_thr, ``esti_plane``).
    """
    w = valid.astype(neighbors.dtype)  # [Q, k]
    pts = neighbors * w[..., None]
    # Solve A n = -1 in weighted least squares: (A^T W A) n = -A^T W 1
    AtA = jnp.einsum("qki,qkj->qij", pts, neighbors * w[..., None])
    At1 = -jnp.sum(pts, axis=-2)  # [Q, 3]
    # Tikhonov floor keeps the solve finite for degenerate sets; those fail
    # the residual test anyway.
    AtA = AtA + 1e-9 * jnp.eye(3, dtype=neighbors.dtype)
    nvec = jnp.linalg.solve(AtA, At1[..., None])[..., 0]  # [Q, 3]

    norm = jnp.linalg.norm(nvec, axis=-1)
    norm_safe = jnp.maximum(norm, 1e-12)
    normals = nvec / norm_safe[..., None]
    d = 1.0 / norm_safe

    resid = jnp.abs(jnp.einsum("qki,qi->qk", neighbors, normals) + d[..., None])
    ok = jnp.all(jnp.where(valid, resid < threshold, True), axis=-1)
    ok &= jnp.sum(valid, axis=-1) >= 3
    ok &= jnp.isfinite(norm) & (norm > 1e-9)
    return normals, d, ok


def point_to_plane(
    points: jax.Array,   # [Q, 3] (world frame)
    normals: jax.Array,  # [Q, 3]
    d: jax.Array,        # [Q]
) -> jax.Array:
    """Signed distances n·p + d (the ESEKF measurement residual ``pd2``)."""
    return jnp.einsum("qi,qi->q", points, normals) + d
