"""Chained per-piece device times for the ORB extraction pipeline.

`lat` timings through the axon tunnel carry a ~23 ms completion-latency
floor; chained back-to-back dispatches amortize it, so `chain/call` is the
true device time. Run: python tools/probe_orb.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def report(name, fn, n=10, reps=3):
    jax.block_until_ready(fn())  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / n)
    print(f"{name:<52} chain/call {best:>9.3f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  {jax.devices()}", flush=True)
    H, W = 376, 1241
    img = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
    jax.block_until_ready(img)

    from tc2li_slam_tpu.ops import orb

    # --- per level-0 pieces
    f_raw = jax.jit(orb.fast_score_raw)
    report("fast_score_raw (pallas) level0", lambda: f_raw(img))
    f_det = jax.jit(orb.detect_level)
    report("detect_level level0", lambda: f_det(img))
    score = f_det(img)
    jax.block_until_ready(score)
    f_sel = jax.jit(lambda s: orb.select_topk_grid(s, 433))
    report("select_topk_grid k=433 level0", lambda: f_sel(score))

    rows = jnp.asarray(rng.integers(20, H - 20, 433), jnp.int32)
    cols = jnp.asarray(rng.integers(20, W - 20, 433), jnp.int32)
    angles = jnp.asarray(rng.uniform(-3, 3, 433), jnp.float32)
    f_or = jax.jit(orb.compute_orientation)
    report("compute_orientation K=433", lambda: f_or(img, rows, cols))
    f_bl = jax.jit(orb.gaussian_blur7)
    report("gaussian_blur7 level0", lambda: f_bl(img))
    blur = f_bl(img)
    jax.block_until_ready(blur)
    f_de = jax.jit(orb.compute_descriptors)
    report("compute_descriptors K=433", lambda: f_de(blur, rows, cols, angles))
    f_rs = jax.jit(lambda im: jax.image.resize(im, (313, 1034), "linear"))
    report("resize ->level1", lambda: f_rs(img))

    # --- full extract, current
    f_ex = jax.jit(lambda im: orb.extract(im, n_features=2000, n_levels=8))
    report("orb.extract 2000x8 (current)", lambda: f_ex(img), n=5)

    # --- stereo pieces
    from tc2li_slam_tpu.ops import stereo
    kuv = jnp.asarray(rng.uniform(30, W - 30, (2000, 2)), jnp.float32)
    vf = jnp.ones(2000, bool)
    lvl = jnp.zeros(2000, jnp.int32)
    d_l = jnp.asarray(rng.integers(0, 2**32, (2000, 8), dtype=np.uint32))
    d_r = jnp.asarray(rng.integers(0, 2**32, (2000, 8), dtype=np.uint32))
    sf = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
    f_ms = jax.jit(lambda: stereo.match_stereo(
        kuv, lvl, d_l, vf, kuv, lvl, d_r, vf, sf,
        jnp.float32(386.14), jnp.float32(0.537)))
    report("match_stereo 2000x2000", f_ms)
    img_r = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
    ur0 = kuv[:, 0] - 5.0
    f_sr = jax.jit(lambda: stereo.subpixel_refine(img, img_r, kuv, ur0, vf))
    report("subpixel_refine 2000", f_sr)

    # --- H2D variants
    img_u8 = np.ascontiguousarray(
        rng.integers(0, 255, (2, H, W), dtype=np.uint8))
    report("device_put [2,H,W] uint8 (0.93MB)",
           lambda: jax.device_put(img_u8), n=10)
    img_f32 = img_u8.astype(np.float32)
    report("device_put [2,H,W] f32 (3.7MB)",
           lambda: jax.device_put(img_f32), n=5)
    scan_np = rng.standard_normal((131072, 3)).astype(np.float32)
    report("device_put scan [131072,3] f32 (1.5MB)",
           lambda: jax.device_put(scan_np), n=10)
    scan16 = scan_np.astype(np.float16)
    report("device_put scan f16 (0.75MB)",
           lambda: jax.device_put(scan16), n=10)


if __name__ == "__main__":
    main()
