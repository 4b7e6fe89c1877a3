"""Separate axon-tunnel round-trip latency from true device compute.

Three timings per op:
  lat:   1 call + block_until_ready            (includes any RT cost of block)
  chain: N back-to-back calls + 1 final block  -> per-call device time
  fetch: device->host transfer of a small result

Run: python tools/probe_latency.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def t_once(fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3


def t_chain(fn, n=10):
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / n


def report(name, fn, n=10, reps=3):
    fn()  # compile
    jax.block_until_ready(fn())
    lat = min(t_once(fn) for _ in range(reps))
    chain = min(t_chain(fn, n) for _ in range(reps))
    print(f"{name:<46} lat {lat:>9.2f} ms   chain/call {chain:>9.3f} ms")


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  {jax.devices()}")

    x = jnp.zeros(())
    jax.block_until_ready(x)

    # 1. block_until_ready cost on a tiny dispatch
    f_tiny = jax.jit(lambda v: v + 1.0)
    report("tiny add scalar", lambda: f_tiny(x))

    # 2. device->host scalar transfer
    y = f_tiny(x)
    jax.block_until_ready(y)
    ts = [0.0] * 5
    for i in range(5):
        y2 = f_tiny(x)
        t0 = time.perf_counter()
        float(y2)
        ts[i] = (time.perf_counter() - t0) * 1e3
    print(f"{'float() fetch after tiny dispatch':<46} min {min(ts):>9.2f} ms")

    # 2b. np.asarray of a [2000] vector
    v = jnp.ones(2000)
    f_v = jax.jit(lambda a: a * 2.0)
    ts = []
    for _ in range(5):
        v2 = f_v(v)
        t0 = time.perf_counter()
        np.asarray(v2)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{'np.asarray [2000] after dispatch':<46} min {min(ts):>9.2f} ms")

    # 3. H2D transfer of one image
    img_np = rng.integers(0, 255, (376, 1241)).astype(np.float32)
    def h2d():
        return jax.device_put(img_np)
    report("device_put image 1.9MB", h2d, n=10)

    # 4. big matmul: [4096, 4096] bf16 = 137 GFLOP
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    f_mm = jax.jit(lambda a: a @ a)
    report("matmul 4096^3 bf16 (137 GFLOP)", lambda: f_mm(a))

    # 5. hamming matrix 32768x2000
    from tc2li_slam_tpu.ops import matching
    d1 = jnp.asarray(rng.integers(0, 2**32, (32768, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (2000, 8), dtype=np.uint32))
    f_h = jax.jit(matching.hamming_matrix)
    report("hamming_matrix 32768x2000", lambda: f_h(d1, d2))

    # 6. top_k(k=2) over [32768, 2000]
    dist = f_h(d1, d2)
    jax.block_until_ready(dist)
    f_tk = jax.jit(lambda d: jax.lax.top_k(-d, 2))
    report("top_k k=2 over [32768,2000]", lambda: f_tk(dist))

    # 6b. two-pass min/argmin over same
    def min2(d):
        i1 = jnp.argmin(d, axis=1)
        b1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
        d2_ = d.at[jnp.arange(d.shape[0]), i1].set(1 << 20)
        b2 = jnp.min(d2_, axis=1)
        return i1, b1, b2
    f_m2 = jax.jit(min2)
    report("argmin+2nd pass over [32768,2000]", lambda: f_m2(dist))

    # 7. HBM write bandwidth: broadcast write 256 MB
    f_w = jax.jit(lambda s: jnp.full((32768, 2048), s))
    report("fill [32768,2048] f32 (256MB write)", lambda: f_w(x))

    # 8. elementwise over 256MB (read+write)
    big = jnp.ones((32768, 2048))
    f_e = jax.jit(lambda a: a * 1.5 + 1.0)
    report("elementwise [32768,2048] f32", lambda: f_e(big))

    # 9. full search_by_projection
    from tc2li_slam_tpu.ops import matching as mt
    uvp = jnp.asarray(rng.uniform(0, 1241, (32768, 2)), jnp.float32)
    kuv = jnp.asarray(rng.uniform(0, 1241, (2000, 2)), jnp.float32)
    lvm = jnp.zeros(32768, jnp.int32)
    lvf = jnp.zeros(2000, jnp.int32)
    vm_ = jnp.ones(32768, bool)
    vf = jnp.ones(2000, bool)
    rad = jnp.full(32768, 15.0)
    f_sp = jax.jit(lambda: mt.search_by_projection(
        uvp, lvm, d1, vm_, kuv, lvf, d2, vf, rad))
    report("search_by_projection 32k", f_sp)

    # 10. pose_only pieces
    from tc2li_slam_tpu.solver import lm as lm_mod
    from tc2li_slam_tpu.geom import camera as cam_mod
    cam = cam_mod.Pinhole.create(718.856, 718.856, 607.19, 185.2, bf=386.14)
    X = jnp.asarray(rng.uniform(-20, 20, (2000, 3)), jnp.float32)
    uvr = jnp.concatenate([kuv, jnp.full((2000, 1), -1.0)], -1)
    inv_s2 = jnp.ones(2000)
    f_po = jax.jit(lambda: lm_mod.pose_only_optimize(
        cam, jnp.eye(4), X, uvr, inv_s2, jnp.zeros(2000, bool), vf))
    report("pose_only_optimize 4x10", f_po)

    f_po1 = jax.jit(lambda: lm_mod.pose_only_optimize(
        cam, jnp.eye(4), X, uvr, inv_s2, jnp.zeros(2000, bool), vf,
        rounds=1, iters=10))
    report("pose_only_optimize 1x10", f_po1)

    # 11. linalg.solve 6x6 alone
    A = jnp.eye(6) * 3.0 + 0.1
    b = jnp.ones(6)
    f_s6 = jax.jit(lambda A, b: jnp.linalg.solve(A, b))
    report("linalg.solve 6x6", lambda: f_s6(A, b))

    # 12. scan of 40 solve-6x6
    def scan40(A, b):
        def body(c, _):
            return jnp.linalg.solve(A + c * 1e-9, b), None
        out, _ = jax.lax.scan(body, b, None, length=40)
        return out
    f_s40 = jax.jit(scan40)
    report("scan 40x linalg.solve 6x6", lambda: f_s40(A, b))

    # 13. orb.extract (true device time via chaining)
    from tc2li_slam_tpu.ops import orb
    img = jnp.asarray(img_np)
    f_ex = lambda: orb.extract(img, n_features=2000, n_levels=8)
    report("orb.extract 2000x8", f_ex, n=5)

    # 14. build_frame
    from tc2li_slam_tpu.slam import tracking
    img_r_ = jnp.asarray(rng.integers(0, 255, (376, 1241)).astype(np.float32))
    sf = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
    f_bf = lambda: tracking.build_frame(img, img_r_, cam, sf,
                                        n_features=2000, n_levels=8)
    report("build_frame", f_bf, n=5)

    # 15. subpixel refine
    from tc2li_slam_tpu.ops import stereo
    ur0 = kuv[:, 0] - 5.0
    f_sr = jax.jit(lambda: stereo.subpixel_refine(img, img_r_, kuv, ur0, vf))
    report("subpixel_refine 2000", f_sr)


if __name__ == "__main__":
    main()
