"""Check whether the axon tunnel elides repeated identical dispatches.

Times chained calls with (a) the SAME input buffer every call and (b) a
ROTATING set of distinct input buffers. A large gap means same-input
chained timings are invalid (result caching), and only (b) is the true
device time.  Run: python tools/probe_cache.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def chain_same(fn, x, n=10):
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / n


def chain_rot(fn, xs, n=10):
    jax.block_until_ready(fn(xs[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(xs[i % len(xs)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / n


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)
    H, W = 376, 1241
    imgs = [jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
            for _ in range(4)]
    jax.block_until_ready(imgs)

    from tc2li_slam_tpu.ops import orb
    f_ex = jax.jit(lambda im: orb.extract(im, n_features=2000, n_levels=8))
    print(f"extract same-input  {min(chain_same(f_ex, imgs[0]) for _ in range(3)):9.3f} ms", flush=True)
    print(f"extract rotating    {min(chain_rot(f_ex, imgs) for _ in range(3)):9.3f} ms", flush=True)

    # and a chain where each call consumes the previous output (true serial)
    f_step = jax.jit(lambda im: (im * 1.0003 + 0.1) % 255.0)
    def serial(n=10):
        x = imgs[0]
        jax.block_until_ready(f_ex(x))
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            x = f_step(x)
            out = f_ex(x)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) * 1e3 / n
    print(f"extract serial-dep  {min(serial() for _ in range(3)):9.3f} ms", flush=True)

    d1s = [jnp.asarray(rng.integers(0, 2**32, (32768, 8), dtype=np.uint32))
           for _ in range(4)]
    d2 = jnp.asarray(rng.integers(0, 2**32, (2000, 8), dtype=np.uint32))
    from tc2li_slam_tpu.ops import matching
    f_h = jax.jit(lambda a: jax.lax.top_k(-matching.hamming_matrix(a, d2), 2))
    print(f"ham+topk same       {min(chain_same(f_h, d1s[0]) for _ in range(3)):9.3f} ms", flush=True)
    print(f"ham+topk rotating   {min(chain_rot(f_h, d1s) for _ in range(3)):9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
