"""rBRIEF tap-gather formulation shootout (fetch-barrier, bench shapes).

compute_descriptors is the ORB extractor's dominant device cost (~2.3 ms at
K=433 level 0, ~10 ms/image over the pyramid). The tap lookup is a [K, 512]
gather; this probe times the candidate formulations:
  a) current: vmap(dynamic_slice) patches -> take_along_axis within patch
  b) direct advanced-index gather from the full image (no patch staging)
  c) patch gather + one-hot matmul tap lookup (MXU instead of gather)
  d) patch gather in bf16 + take_along_axis
Run: python tools/probe_desc.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tc2li_slam_tpu.ops import orb
from tc2li_slam_tpu.ops._orb_pattern import PATTERN


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def devtime(name, fn, n=10, reps=3):
    out = fn()
    _fetch(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:<56}{best * 1e3:>9.2f} ms", flush=True)
    return best * 1e3


def taps(angles):
    pat = jnp.asarray(PATTERN.astype(np.float32))
    px = jnp.concatenate([pat[:, 0], pat[:, 2]])
    py = jnp.concatenate([pat[:, 1], pat[:, 3]])
    a = jnp.cos(angles)[:, None]
    b = jnp.sin(angles)[:, None]
    roff = jnp.round(px[None] * b + py[None] * a).astype(jnp.int32)
    coff = jnp.round(px[None] * a - py[None] * b).astype(jnp.int32)
    return roff, coff


def pack(bits):
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def main():
    rng = np.random.default_rng(0)
    H, W = 376, 1241
    img = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
    for K in (433, 2000):
        rows = jnp.asarray(rng.integers(20, H - 20, K), jnp.int32)
        cols = jnp.asarray(rng.integers(20, W - 20, K), jnp.int32)
        angles = jnp.asarray(rng.uniform(-3, 3, K), jnp.float32)

        f_cur = jax.jit(orb.compute_descriptors)
        devtime(f"a) current (patch+take_along) K={K}",
                lambda: f_cur(img, rows, cols, angles))

        R = orb._PATTERN_RADIUS
        S = 2 * R + 1

        def direct(imgb, r, c, ang):
            roff, coff = taps(ang)
            rr = jnp.clip(r[:, None] + roff, 0, H - 1)
            cc = jnp.clip(c[:, None] + coff, 0, W - 1)
            vals = imgb[rr, cc]
            return pack((vals[:, :256] < vals[:, 256:]).astype(jnp.uint32))

        f_dir = jax.jit(direct)
        devtime(f"b) direct full-image gather K={K}",
                lambda: f_dir(img, rows, cols, angles))

        def onehot_mm(imgb, r, c, ang):
            roff, coff = taps(ang)
            patches = orb._gather_patches(imgb, r, c, R).reshape(-1, S * S)
            tap = (jnp.clip(roff, -R, R) + R) * S + (jnp.clip(coff, -R, R) + R)
            oh = jax.nn.one_hot(tap, S * S, dtype=jnp.bfloat16)  # [K,512,S*S]
            vals = jnp.einsum("kts,ks->kt", oh, patches.astype(jnp.bfloat16))
            return pack((vals[:, :256] < vals[:, 256:]).astype(jnp.uint32))

        f_oh = jax.jit(onehot_mm)
        devtime(f"c) one-hot matmul K={K}",
                lambda: f_oh(img, rows, cols, angles))

        def bf16_patch(imgb, r, c, ang):
            roff, coff = taps(ang)
            patches = orb._gather_patches(
                imgb.astype(jnp.bfloat16), r, c, R).reshape(-1, S * S)
            tap = (jnp.clip(roff, -R, R) + R) * S + (jnp.clip(coff, -R, R) + R)
            vals = jnp.take_along_axis(patches, tap, axis=1)
            return pack((vals[:, :256] < vals[:, 256:]).astype(jnp.uint32))

        f_bf = jax.jit(bf16_patch)
        devtime(f"d) bf16 patch+take_along K={K}",
                lambda: f_bf(img, rows, cols, angles))


if __name__ == "__main__":
    main()
