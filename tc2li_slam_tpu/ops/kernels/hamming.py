"""Hamming distance matrix on the MXU.

The XLA reference path (``ops.matching.hamming_matrix``) broadcasts an
[N, M, 8] uint32 XOR + popcount — pure VPU work with a large intermediate.
On TPU the idiomatic formulation is a matmul: with descriptors unpacked to
0/1 bit vectors ``a, b`` in {0,1}^256,

    hamming(a, b) = |a| + |b| - 2 a.b

so the whole [N, M] matrix is one bf16 MXU contraction over an augmented
258-dim inner axis (bits scaled by -2, a popcount column against ones, a ones
column against popcounts). Every value involved (bits, popcounts <= 256,
products) is exactly representable in bf16 and the MXU accumulates in f32, so
the result is exact, bit-equal to XOR+popcount.

Used by every matcher in ``ops.matching`` (stereo, projection-guided, BoW,
epipolar — reference ORBmatcher.cc) whenever both sides are >= 128 rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unpack_bits(d: jax.Array) -> jax.Array:
    """[N, 8] uint32 -> [N, 256] float32 in {0, 1} (LSB-first per word)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (d[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(d.shape[0], 256).astype(jnp.float32)


def hamming_matrix_mxu(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """[N, 8] x [M, 8] uint32 -> [N, M] int32 Hamming distances (exact)."""
    bits1 = _unpack_bits(d1)
    bits2 = _unpack_bits(d2)
    pop1 = jnp.sum(bits1, axis=-1, keepdims=True)   # [N, 1]
    pop2 = jnp.sum(bits2, axis=-1, keepdims=True)   # [M, 1]
    ones1 = jnp.ones_like(pop1)
    ones2 = jnp.ones_like(pop2)
    # A [N, 258] = [-2*bits | pop1 | 1],  B [M, 258] = [bits | 1 | pop2]
    a = jnp.concatenate([-2.0 * bits1, pop1, ones1], axis=-1).astype(jnp.bfloat16)
    b = jnp.concatenate([bits2, ones2, pop2], axis=-1).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int32)
