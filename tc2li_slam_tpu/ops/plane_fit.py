"""Batched k-point plane fitting for point-to-plane residuals.

Replaces ``esti_plane`` (``LidarFrontEnd.cpp:454-482``). The reference solves,
per query point and per ESEKF iteration, the 5x3 least-squares system
``A n = -1`` in double precision. That formulation is ill-conditioned in f32
(it degenerates when the plane passes near the origin or the points are far
out), so the TPU version fits via the centered second-moment matrix instead:
``n`` = eigenvector of the smallest eigenvalue of ``Σ (p-μ)(p-μ)^T``,
``d = -n·μ`` — one batched 3x3 ``eigh`` for the whole scan. The acceptance
test is the same as the reference's: every neighbor within ``threshold`` of
the plane.
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

    Returns (normals [Q, 3], d [Q], ok [Q]); ``ok`` requires >= 3 valid
    neighbors, all valid neighbors within ``threshold`` of the plane, and a
    finite solution.
    """
    w = valid.astype(neighbors.dtype)  # [Q, k]
    cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)  # [Q]
    mu = jnp.sum(neighbors * w[..., None], axis=-2) / cnt[..., None]  # [Q, 3]
    centered = (neighbors - mu[..., None, :]) * w[..., None]
    cov = jnp.einsum("qki,qkj->qij", centered, centered) / cnt[..., None, None]
    # eigh returns ascending eigenvalues; the normal is the first eigenvector.
    evals, evecs = jnp.linalg.eigh(cov + 1e-12 * jnp.eye(3, dtype=cov.dtype))
    normals = evecs[..., :, 0]
    d = -jnp.einsum("qi,qi->q", normals, mu)

    finite = jnp.all(jnp.isfinite(normals), axis=-1) & jnp.isfinite(d)
    normals = jnp.where(finite[..., None], normals, 0.0)
    d = jnp.where(finite, d, 0.0)

    resid = jnp.abs(jnp.einsum("qki,qi->qk", neighbors, normals) + d[..., None])
    ok = jnp.all(jnp.where(valid, resid < threshold, True), axis=-1)
    ok &= jnp.sum(valid, axis=-1) >= 3
    ok &= finite
    return normals, d, ok


def point_to_plane(
    points: jax.Array,   # [Q, 3] (world frame)
    normals: jax.Array,  # [Q, 3]
    d: jax.Array,        # [Q]
) -> jax.Array:
    """Signed distances n·p + d (the ESEKF measurement residual ``pd2``)."""
    return jnp.einsum("qi,qi->q", points, normals) + d
