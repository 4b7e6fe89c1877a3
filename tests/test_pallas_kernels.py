"""Pallas/MXU kernel twins vs their XLA reference implementations."""

import numpy as np
import jax.numpy as jnp

from tc2li_slam_tpu.ops import matching, orb
from tc2li_slam_tpu.ops.kernels.fast import fast_score_pallas
from tc2li_slam_tpu.ops.kernels.hamming import hamming_matrix_mxu


def test_hamming_mxu_exact(rng):
    d1 = jnp.asarray(rng.integers(0, 1 << 32, (37, 8), dtype=np.uint64).astype(np.uint32))
    d2 = jnp.asarray(rng.integers(0, 1 << 32, (53, 8), dtype=np.uint64).astype(np.uint32))
    ref = matching.hamming_matrix_xor(d1, d2)
    got = hamming_matrix_mxu(d1, d2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_hamming_mxu_extremes():
    zeros = jnp.zeros((4, 8), jnp.uint32)
    ones = jnp.full((4, 8), 0xFFFFFFFF, jnp.uint32)
    got = hamming_matrix_mxu(zeros, ones)
    np.testing.assert_array_equal(np.asarray(got), 256)
    got_same = hamming_matrix_mxu(ones, ones)
    np.testing.assert_array_equal(np.asarray(got_same), 0)


def test_fast_pallas_matches_xla(rng):
    img = jnp.asarray(rng.integers(0, 255, (96, 200), dtype=np.uint8))
    ref = np.asarray(orb.fast_score_xla(img, 20.0))
    got = np.asarray(fast_score_pallas(img, 20.0, interpret=True))
    assert got.shape == ref.shape
    # exact away from the border ring both paths zero out
    np.testing.assert_allclose(got[4:-4, 4:-4], ref[4:-4, 4:-4], atol=0)
    assert (got[4:-4, 4:-4] > 0).sum() > 0  # random images do produce corners


def test_fast_pallas_synthetic_corner():
    img = np.zeros((64, 160), np.float32)
    img[20:30, 40:60] = 200.0  # bright block: corners at its corners
    got = np.asarray(fast_score_pallas(jnp.asarray(img), 20.0, interpret=True))
    ref = np.asarray(orb.fast_score_xla(jnp.asarray(img), 20.0))
    np.testing.assert_allclose(got[4:-4, 4:-4], ref[4:-4, 4:-4], atol=0)
    assert got[19:31, 39:61].max() > 0
